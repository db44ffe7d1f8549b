"""Beyond-bench scale rows for the r12 tasks (VERDICT r11 #1/#2/#7/#8)
— the r7-r11 spot-tool pattern: timing starts at query construction,
every run forces materialization (count / collect of bounded rows),
corpora from /tmp/sfscale (sf10 = 200k vectors / 500k docs) with
in-memory replication above that.

Spots:
- ``staged2m``: a REAL (non-lifted) 2M-vector slim knn store built on
  this machine — the r11 honest limit closed two ways at once: the
  ingest kernel now folds each node's candidates to its group-local
  top-store_k BEFORE emitting (bucket² → bucket×k pair emission;
  ~8G cells → ~130M), and ``pairing_slices`` bounds peak shuffle by
  processing tb%N group slices against the running folded state
  (per-slice walls printed via SPARK_GRAFT_SLICE_WALLS=1). Store
  reads are pytest-bit-equal to the one-shot build.
- ``pubserve2m``: frontier-priced serving at 2M vectors over the
  staged2m store — publish_graph wall (fold+undirect paid once),
  graph_search_published per-call walls (every read manifest-pruned;
  the r11 per-call wall was 15.0 s with an ~11 s corpus-frame seed
  term), open_graph_serving(published) open wall (r11: 22.1 s) and
  steady-state batches.
- ``sq8session``: SQ8-coded serving SESSIONS at 200k and 2M — the
  decode-once corpus frame paid at open, batches after it (r11 noted
  a 6.6 → 10.1 s per-call decode tax at 200k; the session amortizes
  it away).
- ``release5m``: the corpus-release capstone at 5M docs (sf10
  documents replicated 10× VERBATIM — the sfscale suffix corpus
  language-IDs 'und' and empties the release, the known pitfall):
  drop ingest walls, FULL model-rescore read vs signature-stable
  CACHED reads (VERDICT r11 #4's scale row — the postings-pass term
  gone), maintain wall, takedown + post-takedown rescore, publish ×2
  + CDC.

Run: python tools/scale_spot_r12.py [which ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

SF10 = "/tmp/sfscale/sf10"
QIDS = [1, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53]
STAGED_ROOT = "/tmp/staged2m"


def _store_bytes(table: str) -> int:
    from blinkit_etl_pipeline_spark.operators import snapshot

    m = snapshot.read_manifest(table)
    return sum(os.path.getsize(e["path"]) for e in m["files"])


def _emb2m(spark):
    """2M vectors: sf10 embeddings replicated 10× with per-replica
    ±1 sign diagonals (norm-preserving, cross-replica decorrelated),
    ids offset by replica — the scale_spot_r11 recipe."""
    import hashlib

    base = spark.read.parquet(f"{SF10}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = 200_000
    parts = []
    for r in range(10):
        if r == 0:
            parts.append(base)
            continue
        seed = hashlib.md5(f"r{r}".encode()).digest()
        signs = [1 if seed[i % 16] >> (i % 8) & 1 else -1 for i in range(64)]
        sign_col = F.array(
            *[F.lit(float(s)).cast("float") for s in signs]
        )
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(r * n)).alias("vec_id"),
                F.zip_with(
                    "embedding", sign_col, lambda x, s: x * s
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def spot_staged2m(spark) -> None:
    import shutil

    from blinkit_etl_pipeline_spark.operators import incremental

    os.environ["SPARK_GRAFT_SLICE_WALLS"] = "1"
    shutil.rmtree(STAGED_ROOT, ignore_errors=True)
    vs, gs, ps = (
        f"{STAGED_ROOT}/vecs",
        f"{STAGED_ROOT}/graph",
        f"{STAGED_ROOT}/payload",
    )
    big = _emb2m(spark).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    incremental.ingest_knn_graph(
        spark, vs, gs, big, k=5, nbits=12,
        compact_threshold=None, payload_store=ps,
        pairing_slices=8,
    )
    t_ing = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = incremental.graph_search_from_store(
        spark, gs, vs, QIDS, k=5, beam=8, rounds=2, nbits=12
    ).count()
    t_serve = time.perf_counter() - t0
    print(
        f"staged2m: REAL 2M ingest (8 slices)={t_ing:.1f}s "
        f"serve16q={t_serve:.2f}s rows={n} "
        f"stores={(_store_bytes(vs) + _store_bytes(ps) + _store_bytes(gs)) / 1e6:.0f}MB"
    )


def spot_pubserve2m(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import incremental, snapshot

    vs, gs, ps, pub = (
        f"{STAGED_ROOT}/vecs",
        f"{STAGED_ROOT}/graph",
        f"{STAGED_ROOT}/payload",
        f"{STAGED_ROOT}/published",
    )
    if snapshot.current_version(vs) is None:
        print("pubserve2m: run staged2m first")
        return
    t0 = time.perf_counter()
    n_call = incremental.graph_search_from_store(
        spark, gs, vs, QIDS, k=5, beam=8, rounds=2, nbits=12
    ).count()
    t_call = time.perf_counter() - t0
    t0 = time.perf_counter()
    incremental.publish_graph(spark, gs, vs, pub, k=5)
    t_pub = time.perf_counter() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = incremental.graph_search_published(
            spark, pub, QIDS, k=5, beam=8, rounds=2, nbits=12
        ).count()
        walls.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    serve = incremental.open_graph_serving(
        spark, gs, vs, k=5, beam=8, rounds=2, nbits=12,
        published_store=pub,
    )
    t_open = time.perf_counter() - t0
    batch_walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        serve(QIDS).count()
        batch_walls.append(round(time.perf_counter() - t0, 2))
    print(
        f"pubserve2m: per-call from_store={t_call:.1f}s (rows={n_call}) | "
        f"publish={t_pub:.1f}s "
        f"({_store_bytes(pub) / 1e6:.0f}MB) | published per-call "
        f"walls={walls} (rows={n}) | session open(published)="
        f"{t_open:.1f}s batches={batch_walls}"
    )


def spot_sq8session(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import incremental

    emb200k = spark.read.parquet(f"{SF10}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    for name, emb, nbits, drops in (
        ("200k", emb200k, 9, 4),
        ("2M", _emb2m(spark).localCheckpoint(eager=True), 12, 1),
    ):
        root = tempfile.mkdtemp(prefix=f"sq8sess-{name}-")
        vs, gs, ps = root + "/vecs", root + "/graph", root + "/payload"
        t0 = time.perf_counter()
        for d in range(drops):
            incremental.ingest_knn_graph_sq8(
                spark, vs, gs,
                emb.filter(F.col("vec_id") % drops == d),
                k=5, nbits=nbits, compact_threshold=None,
                payload_store=ps,
                pairing_slices=(8 if name == "2M" else None),
            )
        t_ing = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = incremental.graph_search_from_store(
            spark, gs, vs, QIDS, k=5, beam=8, rounds=2, nbits=nbits
        ).count()
        t_call = time.perf_counter() - t0
        t0 = time.perf_counter()
        serve = incremental.open_graph_serving(
            spark, gs, vs, k=5, beam=8, rounds=2, nbits=nbits
        )
        t_open = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            serve(QIDS).count()
            walls.append(round(time.perf_counter() - t0, 2))
        print(
            f"sq8session {name}: ingest={t_ing:.1f}s per-call="
            f"{t_call:.1f}s (rows={n}) | session open={t_open:.1f}s "
            f"batches={walls} | stores="
            f"{(_store_bytes(vs) + _store_bytes(ps)) / 1e6:.0f}MB"
        )


def spot_release5m(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import release

    base = spark.read.parquet(f"{SF10}/documents.parquet")
    n = base.count()
    parts = [base]
    for r in range(1, 10):
        parts.append(
            base.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(r * n)).cast("long")
            )
        )
    docs = parts[0]
    for p_ in parts[1:]:
        docs = docs.unionByName(p_)
    root = tempfile.mkdtemp(prefix="release5m-") + "/rel"
    rates = {"en": 0.3, "zh": 0.5, "de": 1.0, "fr": 1.0}
    walls = []
    for m in (0, 1, 2):
        t0 = time.perf_counter()
        release.ingest_release(
            spark, root, docs.filter(F.col("doc_id") % 3 == m)
        )
        walls.append(round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter()
    n1 = release.release_read(
        spark, root, strata_rates=rates, default_rate=0.2
    ).count()
    t_full = time.perf_counter() - t0
    t0 = time.perf_counter()
    release.maintain_release_verdicts(spark, root)
    t_maint = time.perf_counter() - t0
    cached_walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        n2 = release.release_read_cached(
            spark, root, strata_rates=rates, default_rate=0.2
        ).count()
        cached_walls.append(round(time.perf_counter() - t0, 1))
    assert n2 == n1
    t0 = time.perf_counter()
    v1 = release.publish_release(
        spark, root, strata_rates=rates, default_rate=0.2
    )
    t_pub1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    release.release_takedown(spark, root, [5, 8, 13, 21])
    t_td = time.perf_counter() - t0
    t0 = time.perf_counter()
    n3 = release.release_read_cached(
        spark, root, strata_rates=rates, default_rate=0.2
    ).count()
    t_rescore = time.perf_counter() - t0
    t0 = time.perf_counter()
    v2 = release.publish_release(
        spark, root, strata_rates=rates, default_rate=0.2
    )
    t_pub2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_cdc = release.release_cdc(spark, root, v1, v2).count()
    t_cdc = time.perf_counter() - t0
    print(
        f"release5m: ingest walls={walls} full-read={t_full:.1f}s "
        f"({n1} rows) maintain={t_maint:.1f}s cached-read walls="
        f"{cached_walls} publish={t_pub1:.1f}s takedown={t_td:.1f}s "
        f"post-takedown cached(rescore+maintain)={t_rescore:.1f}s "
        f"({n3} rows) publish2={t_pub2:.1f}s cdc={t_cdc:.1f}s "
        f"({n_cdc} rows)"
    )


SPOTS = {
    "staged2m": spot_staged2m,
    "pubserve2m": spot_pubserve2m,
    "sq8session": spot_sq8session,
    "release5m": spot_release5m,
}


def main() -> None:
    which = sys.argv[1:] or list(SPOTS)
    spark = get_session("scale-spot-r12")
    for name in which:
        t0 = time.perf_counter()
        SPOTS[name](spark)
        print(f"[{name}] total {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
