"""r8 stored/residual IVFPQ operating curves (VERDICT r7 task #4).

The r7 curves priced the FUSED in-memory tier; a deployment running
the persisted code store picks its nprobe from the STORED path's
numbers. This sweep produces, per sf (0.1 / 1.0 / 10) and nprobe
(1/2/4/8):

- **stored tier** (`vector.ivfpq_store_topk` over
  `snapshot.read_snapshot_pruned`): recall@5 vs exact-L2 truth,
  probed-mass share, files opened / total, probe wall (median of 3);
  result identity with the fused tier is asserted at every point
  (the stored path must be a pure persistence of the same math).
- **residual tier** (`vector.ivfpq_topk(residual=True)` with the
  pinned RESIDUAL_PQ_CODEBOOK): recall@5 raw and +rerank — the curve
  that decides whether by_residual pays off on THIS corpus (r7's
  planted-cluster study answered the structural question; this is the
  shipped-embedding operating curve at scale).

Correctness anchoring: every operator swept here is pinned value-exact
by a registry oracle at sf0.01 (`ns_ann_ivfpq_topk`, `ns_ann_ivfpq_
residual_topk/_recall`, `ns_ann_pq_recall`); the sweep only moves sf
and nprobe. Emits markdown rows for PLANS.md.

Usage: python tools/ivfpq_curves_r8.py   (expects /tmp/sfscale/*)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from blinkit_etl_pipeline_spark.operators import (  # noqa: E402
    incremental,
    snapshot,
    vector,
)
from blinkit_etl_pipeline_spark.plans.codebook import (  # noqa: E402
    PQ_CODEBOOK,
    RESIDUAL_PQ_CODEBOOK,
    TRAINED_IVF_CODEBOOK,
)
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

QIDS = tuple(range(16))
K = 5
RERANK = 50
NPROBES = (1, 2, 4, 8)
SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1.0", "/tmp/sfscale/sf1.0"),
    ("sf10", "/tmp/sfscale/sf10"),
]


def recall_at_k(truth, topk_rows):
    got = {}
    for r in topk_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return sum(
        len(truth[q] & got.get(q, set())) / K for q in truth
    ) / len(truth)


def probed_lists(emb, nprobe):
    cids, CC, cqq = vector._qcodebook(
        sorted(
            (int(c), [float(x) for x in v]) for c, v in TRAINED_IVF_CODEBOOK
        )
    )
    qrows = (
        vector.with_q(emb)
        .filter(F.col("vec_id").isin(list(QIDS)))
        .select("vec_id", "qvec", "qq")
        .collect()
    )
    probed = set()
    for r in qrows:
        v = np.array(list(r["qvec"]), dtype=np.float64)
        cos = (v @ CC.T) / (np.sqrt(float(r["qq"])) * np.sqrt(cqq))
        probed |= {int(cids[j]) for j in np.lexsort((cids, -cos))[:nprobe]}
    return sorted(probed)


def main() -> None:
    spark = get_session("ivfpq-curves-r8")
    for sf_name, sf_dir in SFS:
        if not os.path.isdir(sf_dir):
            continue
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        nrows = emb.count()
        truth = {}
        for r in vector.l2_brute_topk(emb, QIDS, k=K).collect():
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        # list sizes for the probed-mass column
        assigned = vector.ivf_assign(vector.with_q(emb), TRAINED_IVF_CODEBOOK)
        lsizes = {
            r["centroid_id"]: r["n"]
            for r in assigned.groupBy("centroid_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        store = f"/tmp/sfscale/ivfpqstore_{sf_name}"
        if snapshot.current_version(store) is None:
            incremental.ingest_ivfpq_codes(
                spark, store, emb, TRAINED_IVF_CODEBOOK, PQ_CODEBOOK,
                compact_threshold=None,
            )
        m = snapshot.read_manifest(store)
        n_files = len(m["files"])
        print(f"\n== {sf_name}: {nrows} vectors, store {n_files} files ==")
        print("| sf | nprobe | probed mass | files | stored recall@5 |"
              " == fused | probe wall med3 | res ADC recall | res +rerank |")
        print("|---|---|---|---|---|---|---|---|---|")
        for np_ in NPROBES:
            probed = probed_lists(emb, np_)
            mass = sum(lsizes.get(c, 0) for c in probed) / nrows
            entries = snapshot._pruned_entries(m, probed)
            n_open = len(entries) if entries is not None else n_files
            walls, got = [], None
            for _ in range(3):
                t0 = time.time()
                codes = snapshot.read_snapshot_pruned(spark, store, probed)
                got = vector.ivfpq_store_topk(
                    codes, emb, QIDS, TRAINED_IVF_CODEBOOK, PQ_CODEBOOK,
                    k=K, nprobe=np_,
                ).collect()
                walls.append(time.time() - t0)
            fused = vector.ivfpq_topk(
                emb, QIDS, TRAINED_IVF_CODEBOOK, PQ_CODEBOOK, k=K,
                nprobe=np_,
            ).collect()
            same = sorted(
                (r["query_id"], r["neighbor_id"], r["rank"]) for r in got
            ) == sorted(
                (r["query_id"], r["neighbor_id"], r["rank"]) for r in fused
            )
            rec_stored = recall_at_k(truth, got)
            res_raw = vector.ivfpq_topk(
                emb, QIDS, TRAINED_IVF_CODEBOOK, RESIDUAL_PQ_CODEBOOK,
                k=K, nprobe=np_, residual=True,
            ).collect()
            res_rr = vector.ivfpq_topk(
                emb, QIDS, TRAINED_IVF_CODEBOOK, RESIDUAL_PQ_CODEBOOK,
                k=K, nprobe=np_, rerank=RERANK, residual=True,
            ).collect()
            print(
                f"| {sf_name} | {np_} | {mass:.4f} | {n_open}/{n_files} |"
                f" {rec_stored:.4f} | {'yes' if same else 'NO'} |"
                f" {sorted(walls)[1]:.2f}s |"
                f" {recall_at_k(truth, res_raw):.4f} |"
                f" {recall_at_k(truth, res_rr):.4f} |",
                flush=True,
            )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
