"""Scale rows for the r7 third-wave additions (SCD2, KMV overlap,
Kneser-Ney LM, edit-distance linkage) at sf0.1 / sf1.0 / sf10.

Each query is forced to FULL materialization via a checksum aggregate
over every output column (count-only consumers let Catalyst prune the
scoring/window expressions and measure a different plan — r7 lesson).

Usage: python tools/scale_warehouse_r7.py [names...]
(expects /tmp/sfscale/{sf1.0,sf10}; skips missing dirs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from blinkit_etl_pipeline_spark.plans.registry import all_queries  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1.0": "/tmp/sfscale/sf1.0",
    "sf10": "/tmp/sfscale/sf10",
}

DEFAULT = [
    "ns_scd2_user_state",
    "ns_sketch_kmv_overlap",
    "ns_lm_kn_perplexity",
    "ns_dedup_edit_distance",
]


def main() -> None:
    spark = get_session("scale-warehouse-r7")
    qs = all_queries()
    names = sys.argv[1:] or DEFAULT
    out: dict[str, dict] = {}
    for sf, d in SFS.items():
        if not os.path.isdir(d):
            continue
        for name in names:
            # time from construction: queries that train (k-means) run
            # driver-round-trip jobs before returning the frame
            t0 = time.time()
            df = qs[name](spark, d)
            force = df.agg(
                F.sum(
                    F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))
                ).alias("ck"),
                F.count("*").alias("n"),
            )
            row = force.collect()[0]
            out.setdefault(name, {})[sf] = {
                "sec": round(time.time() - t0, 3),
                "rows": row["n"],
            }
            print(name, sf, out[name][sf], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
