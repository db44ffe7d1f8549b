"""Scale rows for the r7 late additions (NB classifier, bigram LM,
SQ8 tier, triplet mining) at sf0.1 / sf1.0 / sf10 — wall + result
rows, for the PLANS.md linearity table.

Triplet mining is timed on BOTH pair tiers: the registry's loose
t=0.35 plain-join pairs (answer-rich gauge) only at sf0.1, and the
production prefix-filtered t=0.9 tier at every sf (the documented
high-threshold scale path).

Usage: python tools/scale_new_r7.py  (expects /tmp/sfscale/{sf1.0,sf10})
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blinkit_etl_pipeline_spark.operators import dedup, selection  # noqa: E402
from blinkit_etl_pipeline_spark.plans import northstar as NS  # noqa: E402
from blinkit_etl_pipeline_spark.plans.registry import all_queries  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1.0": "/tmp/sfscale/sf1.0",
    "sf10": "/tmp/sfscale/sf10",
}


def triplet_prefix(spark, sf_dir):
    docs = NS._docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs_prefix(
        docs, n=NS.NGRAM_N, threshold=NS.JACCARD_PREFIX_THRESHOLD
    )
    return selection.triplet_mine(docs, pairs)


def main() -> None:
    spark = get_session("scale-new-r7")
    qs = all_queries()
    names = [
        "ns_quality_nb",
        "ns_lm_perplexity",
        "ns_ann_sq8_topk",
        "ns_ann_sq8_recall",
    ]
    out: dict[str, dict] = {}
    for sf, d in SFS.items():
        if not os.path.isdir(d):
            continue
        for name in names:
            t0 = time.time()
            n = qs[name](spark, d).count()
            out.setdefault(name, {})[sf] = {
                "sec": round(time.time() - t0, 3), "rows": n
            }
            print(name, sf, out[name][sf], flush=True)
        t0 = time.time()
        n = triplet_prefix(spark, d).count()
        out.setdefault("triplet_prefix_t0.9", {})[sf] = {
            "sec": round(time.time() - t0, 3), "rows": n
        }
        print("triplet_prefix_t0.9", sf, out["triplet_prefix_t0.9"][sf],
              flush=True)
    t0 = time.time()
    n = qs["ns_triplet_mine"](spark, SFS["sf0.1"]).count()
    out["triplet_loose_t0.35"] = {
        "sf0.1": {"sec": round(time.time() - t0, 3), "rows": n}
    }
    print("triplet_loose_t0.35 sf0.1", out["triplet_loose_t0.35"]["sf0.1"],
          flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
