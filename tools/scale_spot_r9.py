"""sf100 spot rows for the r8 sketch/retail additions (VERDICT r8
task #5, the r7 pattern): bkq pair, one-pass multi-measure quantiles,
and the 2-exchange RFM plan, at ~100x the bench scale.

sf100 relational tables are not materialized on disk (16 GB of
replicated parquet buys nothing the plan shape doesn't already show);
instead the sf10 files are replicated 10x IN-MEMORY with id offsets —
60M lineitem / 10M->100M events / 15M->150M orders rows flowing
through the real operators. Timing starts at query construction (the
r7 scale-tool rule). Run: python tools/scale_spot_r9.py [which ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from blinkit_etl_pipeline_spark.operators import agg, sketch  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

SF10 = "/tmp/sfscale/sf10"
COPIES = 10


def replicate(df, id_cols: dict[str, int]):
    """Union COPIES copies, offsetting each id column by i*stride."""
    parts = []
    for i in range(COPIES):
        p = df
        for c, stride in id_cols.items():
            p = p.withColumn(c, (F.col(c) + F.lit(i * stride)).cast("long"))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    which = set(sys.argv[1:]) or {"bkq", "multi", "rfm"}
    spark = get_session("scale-spot-r9")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    if "bkq" in which:
        # the replica generator already rewrote ts as micros TIMESTAMP
        ev10 = spark.read.parquet(f"{SF10}/events.parquet").select(
            "event_id",
            "event_type",
            "value",
            F.to_date("ts").alias("day"),
        )
        ev = replicate(ev10, {"event_id": 1 << 40})
        t0 = time.perf_counter()
        sk = sketch.bkq_sketch(ev, ["event_type"], "event_id", "value")
        sketch.bkq_quantiles(sk, ["event_type"], (0.25, 0.5, 0.75, 0.95)
                             ).write.format("noop").mode("overwrite").save()
        print(f"SPOT bkq_quantiles sf100(100M events) "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        sketch.bkq_cumulative_quantiles(
            ev.select("day", "event_id", "value"), "day", "event_id",
            "value", (0.5, 0.9),
        ).write.format("noop").mode("overwrite").save()
        print(f"SPOT bkq_cumulative sf100(100M events) "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        spark.catalog.clearCache()

    if "multi" in which:
        li = replicate(
            spark.read.parquet(f"{SF10}/lineitem.parquet").select(
                "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
            ),
            {"l_orderkey": 1 << 40},
        ).withColumn("_g", F.lit(0))
        t0 = time.perf_counter()
        sketch.histogram_quantiles_multi(
            li, ["_g"], ["l_quantity", "l_extendedprice", "l_discount"],
            (0.25, 0.5, 0.75),
        ).write.format("noop").mode("overwrite").save()
        print(f"SPOT quantiles_multi sf100(600M lineitem) "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        spark.catalog.clearCache()

    if "rfm" in which:
        orders = replicate(
            spark.read.parquet(f"{SF10}/orders.parquet").select(
                "o_custkey", "o_orderdate", "o_totalprice"
            ),
            {"o_custkey": 1 << 40},
        )
        t0 = time.perf_counter()
        agg.rfm_segments(orders).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"SPOT customer_rfm sf100(150M orders) "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
