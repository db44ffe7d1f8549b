"""Regenerate plans/codebook.py: offline spherical k-means training.

``python tools/train_codebook.py`` retrains BOTH codebook artifacts on
the sf0.01 embeddings with operators.vector.kmeans_codebook and
rewrites the literal artifact module — the production pattern (train
offline, ship the codebook as a tiny versioned artifact):

- ``TRAINED_IVF_CODEBOOK``: fixed k=8 — the ANN/IVF probe codebook
  (nprobe/recall curves are pinned against it).
- ``SEMANTIC_CODEBOOK``: k = derive_num_clusters(n) — the SemDeDup
  codebook whose k scales with corpus size (sqrt balance), so the
  within-cluster quadratic stays bounded at any sf.
- ``PQ_CODEBOOK``: 16 subspaces x 16 centroids — the product-quantization
  codebooks for the ADC tier (L2 per-subspace k-means).

tests/test_quality.py retrains with the same parameters and asserts
equality, so neither artifact can silently drift from the trainer.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blinkit_etl_pipeline_spark.operators.vector import (  # noqa: E402
    derive_num_clusters,
    kmeans_codebook,
    pq_codebook,
    residual_frame,
)
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

TRAIN_SF_DIR = "/root/testdata/sf0.01"
TRAIN_K = 8
TRAIN_ITERS = 5
PQ_M, PQ_K = 16, 16

HEADER = '''"""Offline-trained IVF codebook artifacts (plans layer).

Produced by ``operators.vector.kmeans_codebook`` on
``/root/testdata/sf0.01/embeddings.parquet`` — the production pattern:
k-means trains offline on a sample, the resulting codebook ships as a
tiny literal artifact, and IVF assignment stays a zero-shuffle map-side
expression at any corpus scale. Coordinates are round-6 (the trainer's
determinism contract); the DuckDB oracle quantizes these exact doubles
with vector.pyquantize, so both engines assign with the same integers.
``tests/test_quality.py`` retrains and asserts equality.

Two artifacts:
- ``TRAINED_IVF_CODEBOOK`` (k=8): ANN/IVF probe codebook.
- ``SEMANTIC_CODEBOOK`` (k=derive_num_clusters(n), sqrt-balanced):
  SemDeDup codebook — k scales with corpus size so the within-cluster
  quadratic stays bounded; this pinned instance covers the sf0.01
  training corpus, any other corpus trains live at its own derived k
  (``vector.semantic_codebook``).

Regenerate with ``python tools/train_codebook.py``.
"""

from __future__ import annotations

TRAIN_SF_DIR = "{sf_dir}"
TRAIN_K = {k}
TRAIN_ITERS = {iters}
SEMANTIC_K = {sem_k}
PQ_M = {pq_m}
PQ_K = {pq_k}
'''


def _emit(f, name: str, codebook) -> None:
    f.write(f"\n{name}: list[tuple[int, list[float]]] = [\n")
    for cid, vec in codebook:
        f.write(f"    ({cid}, [\n")
        for i in range(0, len(vec), 8):
            row = ", ".join(repr(x) for x in vec[i : i + 8])
            f.write(f"        {row},\n")
        f.write("    ]),\n")
    f.write("]\n")


def _emit_pq(f, name: str, codebook) -> None:
    f.write(f"\n{name}: list[tuple[int, int, list[float]]] = [\n")
    for j, c, vec in codebook:
        row = ", ".join(repr(x) for x in vec)
        f.write(f"    ({j}, {c}, [{row}]),\n")
    f.write("]\n")


def main() -> None:
    spark = get_session("train-codebook")
    emb = spark.read.parquet(f"{TRAIN_SF_DIR}/embeddings.parquet")
    n = emb.count()
    sem_k = derive_num_clusters(n)
    ivf_cb = kmeans_codebook(emb, k=TRAIN_K, iters=TRAIN_ITERS)
    sem_cb = kmeans_codebook(emb, k=sem_k, iters=TRAIN_ITERS)
    pq_cb = pq_codebook(emb, m=PQ_M, k=PQ_K, iters=TRAIN_ITERS)
    # residual PQ (FAISS by_residual): train on residuals from the
    # JUST-trained coarse codebook so the two artifacts stay paired
    res_cb = pq_codebook(
        residual_frame(emb, ivf_cb), m=PQ_M, k=PQ_K, iters=TRAIN_ITERS
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "blinkit_etl_pipeline_spark",
        "plans",
        "codebook.py",
    )
    with open(out, "w") as f:
        f.write(
            HEADER.format(
                sf_dir=TRAIN_SF_DIR, k=TRAIN_K, iters=TRAIN_ITERS,
                sem_k=sem_k, pq_m=PQ_M, pq_k=PQ_K,
            )
        )
        _emit(f, "TRAINED_IVF_CODEBOOK", ivf_cb)
        _emit(f, "SEMANTIC_CODEBOOK", sem_cb)
        _emit_pq(f, "PQ_CODEBOOK", pq_cb)
        _emit_pq(f, "RESIDUAL_PQ_CODEBOOK", res_cb)
    print(f"wrote {out} (ivf k={TRAIN_K}, semantic k={sem_k}, "
          f"pq {PQ_M}x{PQ_K} + residual, n={n})")


if __name__ == "__main__":
    main()
