"""r7 IVFPQ operating-curve study (VERDICT r6 task #3).

Two questions the r6 evidence left open:

1. **Does residual encoding (FAISS ``by_residual``) win when the corpus
   is actually clustered?** The shipped testdata embeddings are
   documented as weakly clustered, where residuals lost 0.2875 vs 0.325
   raw-ADC recall@5. Here we PLANT cluster structure (k well-separated
   unit centers + small isotropic noise), retrain the paired coarse +
   PQ + residual-PQ artifacts on that corpus with the same trainers the
   shipped artifacts use, and sweep nprobe for both tiers.

2. **What does the STORED probe path cost at sf1/sf10?** Ingest the
   scaled corpora into an IVFPQ code store (files clustered by
   inverted list), then measure the probed query wall and the
   files-opened fraction per nprobe, asserting result identity with
   the fused in-memory scan at each point.

Usage: ``python tools/ivfpq_curves_r7.py [planted|stored|all]``.
Emits markdown table rows for PLANS.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from blinkit_etl_pipeline_spark.operators import (  # noqa: E402
    incremental,
    snapshot,
    vector,
)
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

DIM = 64
K_TRUE = 8
N_PLANTED = 20_000
SIGMA = 0.15
QIDS = tuple(range(16))
K = 5
RERANK = 50
NPROBES = (1, 2, 4, 8)
PLANTED_DIR = "/tmp/sfscale/planted"


def make_planted(spark):
    """Planted-cluster corpus: K_TRUE well-separated unit centers,
    points = center + SIGMA·noise. vec_id i belongs to cluster i %
    K_TRUE, so the 16 query ids cover every cluster twice."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((K_TRUE, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(N_PLANTED) % K_TRUE
    X = centers[labels] + SIGMA * rng.standard_normal((N_PLANTED, DIM))
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(N_PLANTED, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in X],
            "label": labels.astype(np.int32),
        }
    )
    os.makedirs(PLANTED_DIR, exist_ok=True)
    path = os.path.join(PLANTED_DIR, "embeddings.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(tbl, path)
    return spark.read.parquet(path)


def scan_fraction(emb, ivf_cb, nprobe):
    from pyspark.sql import functions as F

    assigned = vector.ivf_assign(vector.with_q(emb), ivf_cb)
    lsizes = {
        r["centroid_id"]: r["n"]
        for r in assigned.groupBy("centroid_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n = emb.count()
    probes = vector.coarse_probe_rows(emb, QIDS, ivf_cb, nprobe)
    scanned = sum(lsizes.get(cid, 0) for (_q, cid, _rn) in probes)
    return scanned / (len(QIDS) * n)


def recall_at_k(truth_set, topk_df):
    got = {}
    for r in topk_df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    per_q = [
        len(truth_set[q] & got.get(q, set())) / K for q in truth_set
    ]
    return sum(per_q) / len(per_q)


def planted_study(spark):
    print("== planted-cluster corpus: residual vs non-residual IVFPQ ==")
    emb = make_planted(spark)
    t0 = time.time()
    ivf_cb = vector.kmeans_codebook(emb, k=K_TRUE, iters=5)
    pq_cb = vector.pq_codebook(emb, m=16, k=16, iters=5, dim=DIM)
    res_cb = vector.pq_codebook(
        vector.residual_frame(emb, ivf_cb), m=16, k=16, iters=5, dim=DIM
    )
    print(f"(trained coarse+pq+residual in {time.time() - t0:.0f} s)")
    truth = {}
    for r in vector.l2_brute_topk(emb, QIDS, k=K).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    print("| nprobe | probed mass | raw ADC | +rerank | res ADC | res +rerank |")
    print("|---|---|---|---|---|---|")
    for np_ in NPROBES:
        frac = scan_fraction(emb, ivf_cb, np_)
        vals = []
        for cb, residual in [(pq_cb, False), (res_cb, True)]:
            raw = vector.ivfpq_topk(
                emb, QIDS, ivf_cb, cb, k=K, nprobe=np_, residual=residual
            )
            rr = vector.ivfpq_topk(
                emb, QIDS, ivf_cb, cb, k=K, nprobe=np_, rerank=RERANK,
                residual=residual,
            )
            vals += [recall_at_k(truth, raw), recall_at_k(truth, rr)]
        print(
            f"| {np_} | {frac:.4f} | "
            + " | ".join(f"{v:.4f}" for v in vals)
            + " |"
        )


def stored_study(spark):
    from pyspark.sql import functions as F

    from blinkit_etl_pipeline_spark.plans.codebook import (
        PQ_CODEBOOK,
        TRAINED_IVF_CODEBOOK,
    )

    only = sys.argv[2] if len(sys.argv) > 2 else None
    print("== stored IVFPQ probe: wall + files opened vs sf ==")
    print("| sf | rows | queries | nprobe | files opened/total | probe wall (med3) | == fused |")
    print("|---|---|---|---|---|---|---|")
    for sf_name, sf_dir in [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1.0", "/tmp/sfscale/sf1.0"),
        ("sf10", "/tmp/sfscale/sf10"),
    ]:
        if only and sf_name != only:
            continue
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        nrows = emb.count()
        store = f"/tmp/sfscale/ivfpqstore_{sf_name}"
        shutil.rmtree(store, ignore_errors=True)
        incremental.ingest_ivfpq_codes(
            spark, store, emb, TRAINED_IVF_CODEBOOK, PQ_CODEBOOK,
            compact_threshold=None,
        )
        m = snapshot.read_manifest(store)
        cids, CC, cqq = vector._qcodebook(
            sorted(
                (int(c), [float(x) for x in v])
                for c, v in TRAINED_IVF_CODEBOOK
            )
        )
        # 16 queries × nprobe≥2 probes union to ~all 8 lists — the
        # file-prune win shows at LOW query fan-in (the online-serving
        # shape: one or two queries per request), so sweep both.
        for qset, nps in [(QIDS, (2, 8)), ((0, 1), (1, 2))]:
            qrows = (
                vector.with_q(emb)
                .filter(F.col("vec_id").isin(list(qset)))
                .select("vec_id", "qvec", "qq")
                .collect()
            )
            for np_ in nps:
                probed = set()
                for r in qrows:
                    v = np.array(list(r["qvec"]), dtype=np.float64)
                    cos = (v @ CC.T) / (
                        np.sqrt(float(r["qq"])) * np.sqrt(cqq)
                    )
                    probed |= {
                        int(cids[j])
                        for j in np.lexsort((cids, -cos))[:np_]
                    }
                entries = snapshot._pruned_entries(m, sorted(probed))
                n_open = (
                    len(entries) if entries is not None else len(m["files"])
                )
                walls = []
                for _ in range(3):
                    t0 = time.time()
                    codes = snapshot.read_snapshot_pruned(
                        spark, store, sorted(probed)
                    )
                    got = vector.ivfpq_store_topk(
                        codes, emb, qset, TRAINED_IVF_CODEBOOK,
                        PQ_CODEBOOK, k=K, nprobe=np_,
                    ).collect()
                    walls.append(time.time() - t0)
                fused = vector.ivfpq_topk(
                    emb, qset, TRAINED_IVF_CODEBOOK, PQ_CODEBOOK, k=K,
                    nprobe=np_,
                ).select("query_id", "neighbor_id", "adc_dist", "rank")
                same = sorted(
                    (r["query_id"], r["neighbor_id"], r["rank"])
                    for r in got
                ) == sorted(
                    (r["query_id"], r["neighbor_id"], r["rank"])
                    for r in fused.collect()
                )
                wall = sorted(walls)[1]
                print(
                    f"| {sf_name} | {nrows} | {len(qset)} | {np_} |"
                    f" {n_open}/{len(m['files'])} | {wall:.3f} s |"
                    f" {'MATCH' if same else 'MISMATCH'} |"
                )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_session("ivfpq-curves-r7")
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("planted", "all"):
        planted_study(spark)
    if which in ("stored", "all"):
        stored_study(spark)


if __name__ == "__main__":
    main()
