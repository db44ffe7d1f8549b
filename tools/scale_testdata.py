"""Scale-up replicator for the driver testdata (scaling-curve evidence).

Reads ``$SRC`` (default /root/testdata/sf0.1) and writes an ``×N``
replicated copy to ``$DST`` preserving referential integrity: every
replica ``r`` shifts each surrogate key family by ``r × (max_key + 1)``
consistently across all tables that share it (orderkey in orders ∧
lineitem, custkey in customer ∧ orders, partkey in part ∧ lineitem,
suppkey in supplier ∧ lineitem). Dims (region, nation) are copied
verbatim.

Content columns that feed *similarity* operators are perturbed per
replica so the scaled corpus behaves like genuinely larger data rather
than 10 exact copies (10 identical corpora would inflate near-dup
candidate PAIRS quadratically — an artifact of the replication, not of
scale):

- ``documents.text``: every token gets a per-replica suffix
  (``tok`` → ``tok\\x01<r>``; \\x01 never occurs in the synthetic text,
  so the map is collision-free across replicas even when r=2 meets a
  token ending in "1"). The map is a BIJECTION on tokens, so word
  n-gram shingle equality within a replica is exactly isomorphic to
  the base corpus (same pairs, same Jaccard values), while
  cross-replica shingle equality is impossible → candidate and answer
  pair counts scale exactly linearly, as they would at true sf1.0.
  (The earlier ``e`` → ``e<r>`` substitution left the ~5% of shingles
  containing no 'e'-word shared across ALL replicas; their document
  frequency scaled with the factor and any one of them landing in a
  PPJoin prefix generated factor²-quadratic candidates — a 94 GB
  spill at factor 1000 that benchmarked the generator artifact, not
  the engine.)
- ``embeddings.embedding``: multiplied by a per-replica ±1 diagonal
  (md5-seeded sign pattern) — norm-preserving, within-replica cosines
  identical to the base corpus, cross-replica cosines decorrelated
  (max pattern correlation 0.19 < every threshold in use).

Usage::

    SRC=/root/testdata/sf0.1 DST=/tmp/sfscale/sf1.0 FACTOR=10 \
        python tools/scale_testdata.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blinkit_etl_pipeline_spark.session import get_session

#: key families → (table, column) members that must shift together.
KEY_FAMILIES: dict[str, list[tuple[str, str]]] = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}

COPY_TABLES = ("region", "nation")
SCALE_TABLES = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _strides(spark: SparkSession, src: str) -> dict[tuple[str, str], int]:
    """max_key + 1 per (table, column), computed once from the source."""
    strides: dict[tuple[str, str], int] = {}
    for fam, members in KEY_FAMILIES.items():
        # one stride per family: the max over every member column, so a
        # shifted fk can never collide with an unshifted pk
        fam_max = 0
        for table, col in members:
            df = spark.read.parquet(f"{src}/{table}.parquet")
            # max(col) is NULL for an empty source table — treat as 0
            fam_max = max(fam_max, df.agg(F.max(col)).first()[0] or 0)
        for table, col in members:
            strides[(table, col)] = int(fam_max) + 1
    return strides


EMB_DIM = 64


def _replica_signs(r: int, dim: int = EMB_DIM) -> list[float]:
    """±1 sign pattern for replica r (md5-seeded, salt 0 — measured
    pairwise-balanced for r=1..9: max |correlation| 0.19)."""
    import hashlib

    return [
        1.0
        if hashlib.md5(f"replica-sign:0:{r}:{i}".encode()).digest()[0] % 2 == 0
        else -1.0
        for i in range(dim)
    ]


def _replica(df: DataFrame, table: str, r: int,
             strides: dict[tuple[str, str], int]) -> DataFrame:
    for (t, col), stride in strides.items():
        if t == table:
            df = df.withColumn(col, F.col(col) + F.lit(r * stride))
    if table == "documents" and r > 0:
        # token bijection: within-replica shingle structure preserved
        # exactly, cross-replica shingle overlap impossible (docstring)
        df = df.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", "$1\x01" + str(r))
        ).withColumn("n_chars", F.length("text"))
    if table == "embeddings" and r > 0:
        # Replica distinctness via a per-replica ±1 diagonal "rotation"
        # (md5-seeded sign-flip pattern, applied as a literal array).
        # Norm-preserving, and cos(D_r v, D_r w) = cos(v, w): each
        # replica reproduces the base corpus's pairwise cosine structure
        # exactly, while cross-replica pairs decorrelate (measured
        # max |pattern corr| 0.19 over r=1..9 at dim 64, below any
        # near-dup threshold in use) — so near-dup/ANN answer sizes
        # scale ~linearly with the data. (The earlier +3r shift on dim 0
        # made every shifted vector near-parallel to every other: the
        # "truth" grew quadratically, which benchmarks the data
        # generator, not the engine.)
        signs = F.array(
            *[F.lit(s).cast("float") for s in _replica_signs(r)]
        )  # float signs: float×float stays array<float> (schema-stable)
        df = df.withColumn(
            "embedding", F.zip_with("embedding", signs, lambda x, s: x * s)
        )
    return df


def main() -> None:
    src = os.environ.get("SRC", "/root/testdata/sf0.1")
    dst = os.environ.get("DST", "/tmp/sfscale/sf1.0")
    factor = int(os.environ.get("FACTOR", "10"))
    # TABLES=documents,embeddings restricts the run (sf100 spot-checks
    # only need the corpus tables; replicating 600M lineitem rows to
    # measure a documents query would be waste)
    wanted = os.environ.get("TABLES")
    tables = tuple(wanted.split(",")) if wanted else None
    spark = get_session(app_name="scale-testdata")
    strides = _strides(spark, src)
    for table in COPY_TABLES:
        if tables is not None and table not in tables:
            continue
        spark.read.parquet(f"{src}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{table}.parquet")
    for table in SCALE_TABLES:
        if tables is not None and table not in tables:
            continue
        base = spark.read.parquet(f"{src}/{table}.parquet")
        out = None
        for r in range(factor):
            rep = _replica(base, table, r, strides)
            out = rep if out is None else out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
        print(f"{table}: x{factor} -> {dst}/{table}.parquet", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
