"""Versioned incremental corpus release (r11): maintained stores ≡
batch model-gated curation through drops, redelivery, and takedown."""

from __future__ import annotations

from pyspark.sql import functions as F

from blinkit_etl_pipeline_spark.functions import lm
from blinkit_etl_pipeline_spark.operators import dedup, release, snapshot
from blinkit_etl_pipeline_spark.plans.northstar import (
    STRATA_DEFAULT_RATE,
    STRATA_RATES,
    curation_gated,
    curation_select,
)

SF = "/root/testdata/sf0.01/documents.parquet"


def _batch_model(docs):
    nb = lm.nb_quality_frame(docs).filter(F.col("nb_pass")).select("doc_id")
    ppl = (
        lm.bigram_nll_frame(docs).filter(~F.col("flagged")).select("doc_id")
    )
    gated = curation_gated(docs).join(nb, "doc_id").join(ppl, "doc_id")
    return curation_select(dedup.exact_dedup(gated))


def _read(spark, root):
    return release.release_read(
        spark, root,
        strata_rates=STRATA_RATES, default_rate=STRATA_DEFAULT_RATE,
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_release_read_equals_batch_through_lifecycle(spark, tmp_path):
    """Three drops + a redelivery: the store-derived release equals
    the batch model-curation over the union. A takedown shifts the
    corpus-trained models automatically (they fold from live
    postings), so the next read equals the batch recompute over
    SURVIVORS — no stage ever re-tokenizes text."""
    docs = spark.read.parquet(SF)
    root = str(tmp_path / "rel")
    for m in (0, 1, 2):
        release.ingest_release(
            spark, root, docs.filter(F.col("doc_id") % 3 == m)
        )
    # redelivery: all three store guards absorb the replayed drop
    release.ingest_release(spark, root, docs.filter(F.col("doc_id") % 3 == 1))
    want = _rows(_batch_model(docs))
    assert _rows(_read(spark, root)) == want and len(want) > 0

    gone = [int(r[0]) for r in want[:2]]
    release.release_takedown(spark, root, gone)
    survivors = docs.filter(~F.col("doc_id").isin(gone))
    assert _rows(_read(spark, root)) == _rows(_batch_model(survivors))


def test_release_publish_versions_and_cdc(spark, tmp_path):
    """publish_release pins corpus listings as MVCC versions; the CDC
    between two published versions is the labeled EXCEPT-ALL of the
    listings (docs leaving on takedown labeled 'out', any model-shift
    knock-on flips labeled 'in'/'out'), and the pre-takedown version
    stays readable after the new publish."""
    docs = spark.read.parquet(SF)
    root = str(tmp_path / "rel")
    for m in (0, 1):
        release.ingest_release(
            spark, root, docs.filter(F.col("doc_id") % 2 == m)
        )
    v1 = release.publish_release(
        spark, root,
        strata_rates=STRATA_RATES, default_rate=STRATA_DEFAULT_RATE,
    )
    listing1 = _rows(
        snapshot.read_snapshot(spark, release.stores(root)["release"], v1)
    )
    assert listing1 == _rows(_batch_model(docs))

    gone = [int(r[0]) for r in listing1[:1]]
    release.release_takedown(spark, root, gone)
    v2 = release.publish_release(
        spark, root,
        strata_rates=STRATA_RATES, default_rate=STRATA_DEFAULT_RATE,
    )
    assert v2 > v1
    # MVCC: v1 still reads the pre-takedown listing
    assert _rows(
        snapshot.read_snapshot(spark, release.stores(root)["release"], v1)
    ) == listing1

    cdc = release.release_cdc(spark, root, v1, v2)
    a = {tuple(r) for r in listing1}
    b = {
        tuple(r)
        for r in _rows(
            snapshot.read_snapshot(
                spark, release.stores(root)["release"], v2
            )
        )
    }
    want_out = sorted(a - b)
    want_in = sorted(b - a)
    got_out = _rows(
        cdc.filter(F.col("change") == "out").drop("change")
    )
    got_in = _rows(cdc.filter(F.col("change") == "in").drop("change"))
    assert got_out == want_out and got_in == want_in
    assert any(int(r[0]) in gone for r in got_out)


def test_release_gauge_memo_keyed_by_sf_dir(spark):
    """r11 review: the release-build memo's scratch root must carry
    the sf_dir dimension — two sf dirs in one session get DISTINCT
    roots and both memoized releases stay readable."""
    from blinkit_etl_pipeline_spark.plans.northstar import (
        _release_build,
        _release_root,
    )

    a = "/root/testdata/sf0.001"
    b = "/root/testdata/sf0.01"
    assert _release_root(spark, a) != _release_root(spark, b)
    root_a, va1, va2 = _release_build(spark, a)
    root_b, vb1, vb2 = _release_build(spark, b)
    assert root_a != root_b
    # the first build's published versions still read after the second
    listing = snapshot.read_snapshot(
        spark, release.stores(root_a)["release"], va2
    )
    assert listing.count() >= 0 and set(listing.columns) == {
        "doc_id", "lang", "predicted_lang", "n_tokens",
        "quality_score", "split",
    }
    # and the memo returns the same tuple without rebuilding
    assert _release_build(spark, a) == (root_a, va1, va2)


def _read_cached(spark, root, **kw):
    return release.release_read_cached(
        spark, root,
        strata_rates=STRATA_RATES, default_rate=STRATA_DEFAULT_RATE,
        **kw,
    )


def test_release_read_cached_both_regimes(spark, tmp_path):
    """r12 (VERDICT r11 #4): the verdict store makes repeat reads
    drop-priced — signature-stable reads (repeats, redelivered drops)
    serve cached per-doc scores with NO postings rescore, and any
    committed drop or takedown flips the signature into the full
    rescore + re-maintain path. BOTH regimes must equal the plain
    full-rescore read bit-for-bit."""
    docs = spark.read.parquet(SF)
    root = str(tmp_path / "rel")
    for m in (0, 1):
        release.ingest_release(
            spark, root, docs.filter(F.col("doc_id") % 2 == m)
        )
    # regime 1 first touch: cache miss → full rescore + maintain
    want = _rows(_read(spark, root))
    assert _rows(_read_cached(spark, root)) == want and len(want) > 0
    sig = release._release_state_sig(root)
    vstore = release.stores(root)["verdicts"]
    v0 = snapshot.current_version(vstore)
    assert v0 is not None

    # regime 2 signature-stable: repeat read + redelivered drop serve
    # from the store (version unchanged — no re-maintain, no rescore)
    assert _rows(_read_cached(spark, root)) == want
    release.ingest_release(spark, root, docs.filter(F.col("doc_id") % 2 == 0))
    assert release._release_state_sig(root) == sig
    assert _rows(_read_cached(spark, root)) == want
    assert snapshot.current_version(vstore) == v0

    # takedown: signature flips via tombstone versions
    gone = [int(r[0]) for r in want[:2]]
    release.release_takedown(spark, root, gone)
    assert release._release_state_sig(root) != sig
    want2 = _rows(_read(spark, root))
    assert _rows(_read_cached(spark, root)) == want2 != want
    # and the re-maintained store serves the NEXT read cached
    v1 = snapshot.current_version(vstore)
    assert v1 is not None and v1 != v0
    assert _rows(_read_cached(spark, root)) == want2
    assert snapshot.current_version(vstore) == v1
    # maintain=False on a stale signature falls back to plain read
    release.ingest_release(
        spark, root,
        docs.filter(F.col("doc_id") % 2 == 1).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        ),
    )
    assert _rows(_read_cached(spark, root, maintain=False)) == _rows(
        _read(spark, root)
    )
    assert snapshot.current_version(vstore) == v1


def test_streaming_release_ingest_matches_batch(spark, tmp_path):
    """r12 (VERDICT r11 #5): the streaming release maintainer drains
    document file drops into all three stores under one checkpoint —
    release_read over the streamed stores equals the batch read over
    the union, through a byte-copied redelivery."""
    import glob as _glob
    import shutil

    from blinkit_etl_pipeline_spark.streaming import (
        file_source,
        release_ingest,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw = tmp_path / "raw"
    raw.mkdir()
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "rel")

    def drop(lo, hi, tag):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)) \
            .coalesce(1).write.parquet(str(tmp_path / tag))
        src = _glob.glob(str(tmp_path / tag / "part-*.parquet"))[0]
        shutil.copy(src, str(raw / f"{tag}.parquet"))

    drop(0, 25, "d1")
    drop(25, 50, "d2")
    schema = docs.schema
    stream = file_source.stream_files(spark, str(raw), schema, fmt="parquet")
    release_ingest.run_release_ingest(stream, ckpt, root)
    drop(50, 60, "d3")
    stream = file_source.stream_files(spark, str(raw), schema, fmt="parquet")
    release_ingest.run_release_ingest(stream, ckpt, root)

    union = docs.filter(F.col("doc_id") < 60)
    want = _rows(_batch_model(union))
    assert _rows(_read(spark, root)) == want and len(want) > 0

    # byte-copied redelivery: all three doc_id guards absorb it
    shutil.copy(str(raw / "d2.parquet"), str(raw / "d2_again.parquet"))
    stream = file_source.stream_files(spark, str(raw), schema, fmt="parquet")
    release_ingest.run_release_ingest(stream, ckpt, root)
    assert _rows(_read(spark, root)) == want

    # the verdict store composes with streamed stores: first cached
    # read maintains, the second serves signature-stable — both equal
    # the full rescore (a streamed REDELIVERY commits nothing, so it
    # keeps the signature stable too)
    assert _rows(_read_cached(spark, root)) == want
    vstore = release.stores(root)["verdicts"]
    v0 = snapshot.current_version(vstore)
    stream = file_source.stream_files(spark, str(raw), schema, fmt="parquet")
    release_ingest.run_release_ingest(stream, ckpt, root)
    assert _rows(_read_cached(spark, root)) == want
    assert snapshot.current_version(vstore) == v0


def _read_gated(spark, root, **kw):
    return release.release_read_drift_gated(
        spark, root,
        strata_rates=STRATA_RATES, default_rate=STRATA_DEFAULT_RATE,
        **kw,
    )


def test_release_drift_gated_read(spark, tmp_path):
    """r13 (VERDICT r12 #5): the drift-gated read prices a small,
    distribution-stable drop drop-sized — cached verdicts reused, new
    docs scored under the PINNED models — and falls back to the exact
    full rescore whenever the ladder demands it (sig-stable, skewed
    drop tripping PSI, takedown)."""
    docs = spark.read.parquet(SF)
    root = str(tmp_path / "rel")
    for m in (0, 1):
        release.ingest_release(
            spark, root, docs.filter(F.col("doc_id") % 3 == m)
        )
    # first touch maintains (pins models + drift reference)
    want01 = _rows(_read_cached(spark, root))
    vstore = release.stores(root)["verdicts"]
    v0 = snapshot.current_version(vstore)
    # sig-stable: gated read == cached read, no re-maintain
    assert _rows(_read_gated(spark, root)) == want01
    assert snapshot.current_version(vstore) == v0

    # small same-distribution drop: gate passes → hybrid pinned-model
    # read, verdict store untouched (no re-maintain)
    release.ingest_release(spark, root, docs.filter(F.col("doc_id") % 3 == 2))
    got = _rows(_read_gated(spark, root))
    assert snapshot.current_version(vstore) == v0
    # non-circular reference: score the WHOLE corpus against the
    # persisted pinned models (old docs' cached verdicts must equal
    # pinned-model scores; new docs' hybrid scores likewise)
    s = release.stores(root)
    models = snapshot.read_snapshot(spark, s["models"])
    llr = models.filter(F.col("kind") == "nb_llr").select(
        "token", F.col("q").alias("llr_q")
    )
    prior = models.filter(F.col("kind") == "nb_prior").select(
        F.col("q").alias("prior_q")
    )
    logp = models.filter(F.col("kind") == "lm_logp").select(
        "w1", "w2", F.col("q").alias("logp_q")
    )
    parts = release._score_parts(spark, root)
    nb = lm.nb_apply(parts["lab"], parts["occ_nb"], llr, prior).select(
        "doc_id", "log_odds_q"
    )
    ppl = lm.nll_apply(
        parts["attrs"].select("doc_id"), parts["occ_lm"], logp
    ).select("doc_id", "n_bigrams", "nll_q")
    want_hybrid = _rows(release._read_from_scores(
        spark, root, nb.join(ppl, "doc_id"),
        strata_rates=STRATA_RATES, default_rate=STRATA_DEFAULT_RATE,
        min_quality=release.MIN_QUALITY, min_tokens=release.MIN_TOKENS,
    ))
    assert got == want_hybrid and len(got) > 0
    # bounded staleness is real: the hybrid differs from the full
    # rescore (models shifted by the drop) — if equal, the gate
    # proved nothing
    full = _rows(_read(spark, root))
    assert got != full

    # skewed drop (disjoint synthetic vocabulary) trips the PSI gate
    # → exact full-rescore path, bit-equal to release_read
    release.release_read_cached(
        spark, root,
        strata_rates=STRATA_RATES, default_rate=STRATA_DEFAULT_RATE,
    )  # re-maintain so the pin is current before the skewed drop
    skew = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        "lang",
        F.concat_ws(
            " ", *[F.concat(F.lit(f"zqx{i}tok"), (F.col("doc_id") % 7))
                   for i in range(25)]
        ).alias("text"),
    )
    release.ingest_release(spark, root, skew)
    assert _rows(_read_gated(spark, root)) == _rows(_read(spark, root))

    # takedown always rescores exactly (tomb version changes)
    release.release_takedown(spark, root, [int(r[0]) for r in full[:2]])
    assert _rows(_read_gated(spark, root)) == _rows(_read(spark, root))
