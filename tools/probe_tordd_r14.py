"""r14 probe: where does the per-`localCheckpoint(eager=False)` 0.5-0.9 s
floor come from, and which levers move it?

VERDICT r13 #4: every iterative operator (kmeans/CC/walks/pagerank) pays
~0.5-0.9 s of driver time per lazy checkpoint — "codegen + AQE stage
prep".  This probe separates the suspects on a representative
frontier-sized round shape (join + groupBy + filter, the pagerank_delta
round skeleton):

  A. baseline              — AQE on, codegen defaults (session factory)
  B. AQE off               — does df.rdd stop executing query stages?
  C. wholeStage off        — is Janino whole-stage compilation the cost?
  D. B+C                   —
  E. repeated identical shape — does the SECOND checkpoint of the same
     shape hit the codegen cache (i.e. is the cost per-SHAPE or per-CALL)?

Each cell times df.localCheckpoint(eager=False) (construction) and a
subsequent count() (execution) separately, median of 5 fresh builds.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402


def build_round(spark, n=2000, rounds=1):
    """A pagerank-round-shaped plan over tiny in-memory frames."""
    e = spark.range(n).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 89).alias("dst")
    )
    aff = spark.range(40).select(F.col("id").alias("src"))
    df = e.join(F.broadcast(aff), "src")
    for _ in range(rounds):
        d = df.groupBy("src").agg(F.count("*").alias("d"))
        df = (
            df.join(F.broadcast(d), "src")
            .select(F.col("dst").alias("src"), (F.col("d") * 85).alias("c"))
            .groupBy("src")
            .agg(F.sum("c").alias("d0"))
            .select("src", F.col("d0").alias("dst"))
        )
    return df


def cell(spark, label, confs, n_samples=5, reuse_shape=False):
    saved = {}
    for k, v in confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    t_construct, t_exec = [], []
    try:
        for i in range(n_samples):
            df = build_round(spark, n=2000 + (0 if reuse_shape else i))
            t0 = time.perf_counter()
            ck = df.localCheckpoint(eager=False)
            t1 = time.perf_counter()
            ck.count()
            t2 = time.perf_counter()
            t_construct.append(t1 - t0)
            t_exec.append(t2 - t1)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    print(
        f"{label:34s} construct med={statistics.median(t_construct):.3f}s "
        f"all={[round(x, 3) for x in t_construct]} | "
        f"exec med={statistics.median(t_exec):.3f}s"
    )


def main():
    spark = get_session("probe-tordd-r14")
    spark.range(1).count()  # JVM warm
    cell(spark, "A baseline (AQE on, codegen on)", {})
    cell(spark, "B AQE off", {"spark.sql.adaptive.enabled": "false"})
    cell(spark, "C wholeStage off", {"spark.sql.codegen.wholeStage": "false"})
    cell(
        spark,
        "D AQE off + wholeStage off",
        {
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.codegen.wholeStage": "false",
        },
    )
    cell(spark, "E identical shape x5 (AQE on)", {}, reuse_shape=True)
    cell(
        spark,
        "F identical shape x5 (AQE off)",
        {"spark.sql.adaptive.enabled": "false"},
        reuse_shape=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
