"""Beyond-bench scale rows for the r13 tasks (VERDICT r12 #1/#3/#4/#7)
— the r7-r12 spot-tool pattern: timing starts at query construction,
every run forces materialization, corpora from /tmp/sfscale with
in-memory replication above sf10.

Spots (run big ones in separate sessions — the r12 OOM pitfall):
- ``build2m``: fresh REAL 2M staged build at /tmp/staged2m13 with the
  r13 store shape — row-targeted file granularity (target_file_rows,
  so pruned reads open O(probe) files) and a ``label`` attribute on
  the payload twin (attribute-pushdown filtered serving).
- ``pub2m``: publish WITH the (t,bucket)-clustered seed projection;
  one-shot published per-call walls + the seed read's actual
  file-open counts vs the r12 twin-scan term (VERDICT r12 #1 done
  criterion: the seed term no longer tracks store file count).
- ``takedown2m``: 2-id takedown → publish_graph_incremental net wall
  on the fine-granularity store (VERDICT r12 #3 done criterion:
  reads O(closure) files, well under the r12 ~8 s, flat as the store
  grows).
- ``filtered2m``: filtered per-call serving — attribute predicate
  (where=) vs 683k-id allow-frame broadcast (VERDICT r12 #4 done
  criterion: the ~1-1.5 s broadcast term gone, same rows).
- ``build10m``: 10M-vector staged build (sf10 embeddings replicated
  50×, pairing_slices=32) — per-slice walls stay flat vs the 2M run
  (VERDICT r12 #7: slice-bounded peak shuffle regardless of corpus
  size). Needs SPARK_GRAFT_DRIVER_MEM=64g.

Run: python tools/scale_spot_r13.py [which ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

SF10 = "/tmp/sfscale/sf10"
QIDS = [1, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53]
ROOT = "/tmp/staged2m13"
ROOT10 = "/tmp/staged10m"


def _store_bytes(table: str) -> int:
    from blinkit_etl_pipeline_spark.operators import snapshot

    m = snapshot.read_manifest(table)
    return sum(os.path.getsize(e["path"]) for e in m["files"])


def _store_files(table: str) -> int:
    from blinkit_etl_pipeline_spark.operators import snapshot

    return len(snapshot.read_manifest(table)["files"])


def _emb_big(spark, replicas: int):
    """N×200k vectors: sf10 embeddings replicated with per-replica ±1
    sign diagonals (norm-preserving, cross-replica decorrelated), ids
    offset by replica, label carried verbatim — the scale_spot_r11
    recipe + the r13 attribute column."""
    import hashlib

    base = spark.read.parquet(f"{SF10}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    n = 200_000
    parts = []
    for r in range(replicas):
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
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _build(spark, root: str, replicas: int, slices: int) -> None:
    import shutil

    from blinkit_etl_pipeline_spark.operators import incremental

    os.environ["SPARK_GRAFT_SLICE_WALLS"] = "1"
    shutil.rmtree(root, ignore_errors=True)
    vs, gs, ps = f"{root}/vecs", f"{root}/graph", f"{root}/payload"
    big = _emb_big(spark, replicas).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    incremental.ingest_knn_graph(
        spark, vs, gs, big, k=5, nbits=12,
        compact_threshold=None, payload_store=ps,
        pairing_slices=slices, attrs=["label"],
    )
    t_ing = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = incremental.graph_search_from_store(
        spark, gs, vs, QIDS, k=5, beam=8, rounds=2, nbits=12
    ).count()
    t_serve = time.perf_counter() - t0
    print(
        f"build {replicas * 200_000 // 1000}k ({slices} slices): "
        f"ingest={t_ing:.1f}s serve16q={t_serve:.2f}s rows={n} "
        f"stores={(_store_bytes(vs) + _store_bytes(ps) + _store_bytes(gs)) / 1e6:.0f}MB "
        f"files v/p/g={_store_files(vs)}/{_store_files(ps)}/{_store_files(gs)}",
        flush=True,
    )


def spot_build2m(spark) -> None:
    _build(spark, ROOT, 10, 8)


def spot_build10m(spark) -> None:
    _build(spark, ROOT10, 50, 32)


def spot_pub2m(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import incremental, snapshot
    from blinkit_etl_pipeline_spark.operators.vector import table_buckets_py

    vs, gs, pub, seeds = (
        f"{ROOT}/vecs", f"{ROOT}/graph", f"{ROOT}/published",
        f"{ROOT}/seeds",
    )
    if snapshot.current_version(vs) is None:
        print("pub2m: run build2m first")
        return
    t0 = time.perf_counter()
    incremental.publish_graph(spark, gs, vs, pub, k=5, seed_store=seeds)
    t_pub = time.perf_counter() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = incremental.graph_search_published(
            spark, pub, QIDS, k=5, beam=8, rounds=2, nbits=12
        ).count()
        walls.append(round(time.perf_counter() - t0, 2))
    # the seed term's actual file opens: manifest-pruned entries for
    # this query batch's probed buckets, seed projection vs the r12
    # path's twin read at collision ids (which pruned by UNIFORM ids)
    import numpy as np

    q = incremental._corpus_rows_for_ids(spark, vs, QIDS).collect()
    QM = np.array([list(r["qvec"]) for r in sorted(q, key=lambda r: r["vec_id"])])
    B = table_buckets_py(QM, 12, 8, 64)
    probed = sorted({t * (1 << 12) + int(B[i, t]) for i in range(len(q)) for t in range(8)})
    sm = snapshot.read_manifest(seeds)
    seed_open = len(snapshot._pruned_entries(sm, probed) or sm["files"])
    # r12 term: collision ids pruned against the vec_id-clustered twin
    srows = snapshot.read_snapshot_pruned(spark, seeds, probed)
    cids = sorted(
        int(r["vec_id"]) for r in srows.select("vec_id").distinct().collect()
    )
    pm = snapshot.read_manifest(f"{ROOT}/payload")
    twin_open = len(snapshot._pruned_entries(pm, cids) or pm["files"])
    print(
        f"pub2m: publish(+seed projection)={t_pub:.1f}s "
        f"pub={_store_bytes(pub) / 1e6:.0f}MB seeds={_store_bytes(seeds) / 1e6:.0f}MB | "
        f"published per-call walls={walls} rows={n} | seed read opens "
        f"{seed_open}/{_store_files(seeds)} projection files (r12 path: "
        f"{twin_open}/{_store_files(f'{ROOT}/payload')} twin files at "
        f"{len(cids)} collision ids)",
        flush=True,
    )


def spot_serve2m(spark) -> None:
    """Serve-only walls over the EXISTING published store (no
    republish — publish_graph full-overwrites a new 4 GB projection
    version each call, the disk lesson): one-shot published per-call,
    with and without the r13 IN-pushdown fix visible in walls."""
    from blinkit_etl_pipeline_spark.operators import incremental, snapshot

    pub = f"{ROOT}/published"
    if snapshot.current_version(pub) is None:
        print("serve2m: run pub2m first")
        return
    walls = []
    for _ in range(4):
        t0 = time.perf_counter()
        n = incremental.graph_search_published(
            spark, pub, QIDS, k=5, beam=8, rounds=2, nbits=12
        ).count()
        walls.append(round(time.perf_counter() - t0, 2))
    print(f"serve2m: published per-call walls={walls} rows={n}",
          flush=True)


def spot_takedown2m(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import incremental, snapshot

    vs, gs, pub = f"{ROOT}/vecs", f"{ROOT}/graph", f"{ROOT}/published"
    if snapshot.current_version(pub) is None:
        print("takedown2m: run pub2m first")
        return
    t0 = time.perf_counter()
    incremental.retract_docs(spark, vs, [400_001, 900_007], id_col="vec_id")
    t_ret = time.perf_counter() - t0
    t0 = time.perf_counter()
    incremental.publish_graph_incremental(spark, gs, vs, pub, k=5)
    t_inc = time.perf_counter() - t0
    # reference: a full republish on a copy-free second table
    t0 = time.perf_counter()
    incremental.publish_graph(spark, gs, vs, f"{ROOT}/pub_full", k=5)
    t_full = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = incremental.graph_search_published(
        spark, pub, QIDS, k=5, beam=8, rounds=2, nbits=12
    ).count()
    t_serve = time.perf_counter() - t0
    print(
        f"takedown2m: retract={t_ret:.1f}s incremental republish="
        f"{t_inc:.1f}s vs full={t_full:.1f}s | post-takedown per-call "
        f"serve={t_serve:.1f}s rows={n}",
        flush=True,
    )


def spot_filtered2m(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import incremental, snapshot

    vs, pub = f"{ROOT}/vecs", f"{ROOT}/published"
    if snapshot.current_version(pub) is None:
        print("filtered2m: run pub2m first")
        return
    ps = snapshot.table_properties(vs)["payload_store"]
    allow = (
        snapshot.read_snapshot(spark, ps)
        .filter(F.col("label") % 3 == 0)
        .select("vec_id")
        .localCheckpoint(eager=True)
    )
    n_allow = allow.count()
    walls_where, walls_allow = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        nw = incremental.graph_search_published(
            spark, pub, QIDS, k=5, beam=8, rounds=2, nbits=12,
            where="label % 3 = 0",
        ).count()
        walls_where.append(round(time.perf_counter() - t0, 2))
    for _ in range(3):
        t0 = time.perf_counter()
        na = incremental.graph_search_published(
            spark, pub, QIDS, k=5, beam=8, rounds=2, nbits=12,
            allowed=allow,
        ).count()
        walls_allow.append(round(time.perf_counter() - t0, 2))
    print(
        f"filtered2m: where= walls={walls_where} (rows={nw}) vs "
        f"allowed= ({n_allow} ids) walls={walls_allow} (rows={na})",
        flush=True,
    )


def spot_release5m_drift(spark) -> None:
    """VERDICT r12 #5 done criterion: at 5M docs, a small
    distribution-stable drop's read prices DROP-sized through the
    drift gate (cached verdicts + pinned-model scoring of the drop)
    instead of the ~70 s full rescore; the tripped-gate/takedown
    paths stay bit-equal to release_read (pytest — here we print the
    walls). Needs SPARK_GRAFT_DRIVER_MEM=64g (the r12 release5m
    recipe)."""
    import tempfile

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
    root = tempfile.mkdtemp(prefix="release5m-drift-") + "/rel"
    rates = {"en": 0.3, "zh": 0.5, "de": 1.0, "fr": 1.0}
    # corpus = docs except a held-out 1% slice (the later small drop)
    held = docs.filter(F.col("doc_id") % 100 == 37)
    n_held = held.count()
    t0 = time.perf_counter()
    for m in (0, 1):
        release.ingest_release(
            spark, root,
            docs.filter(
                (F.col("doc_id") % 100 != 37) & (F.col("doc_id") % 2 == m)
            ),
        )
    t_ing = time.perf_counter() - t0
    t0 = time.perf_counter()
    release.maintain_release_verdicts(spark, root)
    t_maint = time.perf_counter() - t0
    # the small drop lands; the gated read prices it drop-sized
    t0 = time.perf_counter()
    release.ingest_release(spark, root, held)
    t_drop = time.perf_counter() - t0
    gated_walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        ng = release.release_read_drift_gated(
            spark, root, strata_rates=rates, default_rate=0.2
        ).count()
        gated_walls.append(round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter()
    nf = release.release_read(
        spark, root, strata_rates=rates, default_rate=0.2
    ).count()
    t_full = time.perf_counter() - t0
    print(
        f"release5m_drift: ingest(2 drops)={t_ing:.1f}s "
        f"maintain={t_maint:.1f}s small-drop({n_held} docs)="
        f"{t_drop:.1f}s | drift-GATED read walls={gated_walls} "
        f"({ng} rows) vs full rescore={t_full:.1f}s ({nf} rows)",
        flush=True,
    )


def main() -> None:
    spark = get_session("scale-spot-r13")
    which = sys.argv[1:] or ["build2m", "pub2m", "takedown2m", "filtered2m"]
    for w in which:
        globals()[f"spot_{w}"](spark)


if __name__ == "__main__":
    main()
