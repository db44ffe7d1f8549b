"""Regenerate plans/codebook.py: offline spherical k-means training.

``python tools/train_codebook.py`` retrains the IVF codebook on the
sf0.01 embeddings with operators.vector.kmeans_codebook and rewrites
the literal artifact — the production pattern (train offline, ship the
codebook as a tiny versioned artifact). tests/test_quality.py retrains
with the same parameters and asserts equality, so the artifact can
never silently drift from the trainer.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blinkit_etl_pipeline_spark.operators.vector import kmeans_codebook  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

TRAIN_SF_DIR = "/root/testdata/sf0.01"
TRAIN_K = 8
TRAIN_ITERS = 5

HEADER = '''"""Offline-trained IVF codebook artifact (plans layer).

Produced by ``operators.vector.kmeans_codebook(emb, k=8, iters=5)`` on
``/root/testdata/sf0.01/embeddings.parquet`` — the production pattern:
k-means trains offline on a sample, the resulting codebook ships as a
tiny literal artifact, and IVF assignment stays a zero-shuffle map-side
expression at any corpus scale. Coordinates are round-6 (the trainer's
determinism contract); the DuckDB oracle quantizes these exact doubles
with vector.pyquantize, so both engines assign with the same integers.
``tests/test_quality.py`` retrains and asserts equality.

Regenerate with ``python tools/train_codebook.py``.
"""

from __future__ import annotations

TRAIN_SF_DIR = "/root/testdata/sf0.01"
TRAIN_K = 8
TRAIN_ITERS = 5

TRAINED_IVF_CODEBOOK: list[tuple[int, list[float]]] = [
'''


def main() -> None:
    spark = get_session("train-codebook")
    emb = spark.read.parquet(f"{TRAIN_SF_DIR}/embeddings.parquet")
    codebook = kmeans_codebook(emb, k=TRAIN_K, iters=TRAIN_ITERS)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "blinkit_etl_pipeline_spark",
        "plans",
        "codebook.py",
    )
    with open(out, "w") as f:
        f.write(HEADER)
        for cid, vec in codebook:
            f.write(f"    ({cid}, [\n")
            for i in range(0, len(vec), 8):
                row = ", ".join(repr(x) for x in vec[i : i + 8])
                f.write(f"        {row},\n")
            f.write("    ]),\n")
        f.write("]\n")
    print(f"wrote {out} ({len(codebook)} centroids)")


if __name__ == "__main__":
    main()
