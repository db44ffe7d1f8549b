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
