"""Dataset selection (stratified sample, hash split) and the text
repetition/PII functions behind the ns_text_repetition / ns_pii_scrub /
ns_sample_stratified / ns_split_hash queries."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from blinkit_etl_pipeline_spark.functions import text as T
from blinkit_etl_pipeline_spark.operators import selection


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("fr"), F.lit("zh")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )


def test_stratified_sample_rates_and_determinism(spark):
    docs = _docs(spark)
    rates = {"en": 0.5, "fr": 1.0}  # zh falls to default 0.0
    out = selection.stratified_sample(docs, "lang", rates, default_rate=0.0)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per = {r["lang"]: r["n"] for r in
           docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "zh" not in counts  # default rate 0 drops the stratum
    assert counts["fr"] == per["fr"]  # rate 1.0 keeps everything
    frac_en = counts["en"] / per["en"]
    assert 0.4 < frac_en < 0.6  # hash-gate approximates the rate
    # determinism: same rows on re-run
    again = selection.stratified_sample(docs, "lang", rates, default_rate=0.0)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_hash_split_partitions_every_row_once(spark):
    docs = _docs(spark)
    out = selection.hash_split(docs)
    assert out.count() == docs.count()  # no row lost or duplicated
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 2000 > 0.7  # ~0.8
    # membership is a pure function of the id: stable across runs
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in selection.hash_split(docs).collect()}
    assert a == b


def test_scrub_pii_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            Row(s="mail me at jo.doe+x@example.co.uk today"),
            Row(s="call +4915712345678 or visit 192.168.1.254 now"),
            Row(s="no pii here at all"),
        ]
    )
    out = df.select(
        T.scrub_pii(F.col("s")).alias("t"),
        T.pii_redaction_count(F.col("s")).alias("n"),
    ).collect()
    assert out[0].t == "mail me at <EMAIL> today" and out[0].n == 1
    assert out[1].t == "call <PHONE> or visit <IP> now" and out[1].n == 2
    assert out[2].t == "no pii here at all" and out[2].n == 0


def test_repetition_columns_hand_computed(spark):
    df = spark.createDataFrame([Row(doc_id=0, s="a a a b"), Row(doc_id=1, s="x y")])
    rows = T.repetition_frame(df, text="s", keep=()).collect()
    out = sorted(rows, key=lambda r: r.doc_id)
    r = out[0]
    # tokens [a a a b]: top word a = 3/4; bigrams [a a, a a, a b] -> 1 dup of 3
    assert r.n_tokens == 4 and r.top_word_frac == 0.75
    assert r.dup_bigram_frac == round(1 / 3, 6)
    # trigrams [a a a, a a b] -> no dups
    assert r.dup_trigram_frac == 0.0
    r = out[1]  # too short for trigrams: defined 0, not null
    assert r.n_tokens == 2 and r.dup_bigram_frac == 0.0 and r.dup_trigram_frac == 0.0


def test_suppress_small_groups_enforces_k_anonymity(spark):
    """After suppression every surviving quasi-combination covers >= k
    rows, the plan is a broadcast anti join (the fact side never
    shuffles), and no k-anonymous row was lost."""
    from pyspark.sql import functions as F

    from blinkit_etl_pipeline_spark.operators import privacy

    df = spark.range(100).select(
        (F.col("id") % 7).alias("q1"),
        F.when(F.col("id") < 3, F.lit(99)).otherwise(F.col("id") % 2).alias("q2"),
    )
    k = 5
    out = privacy.suppress_small_groups(df, ["q1", "q2"], k)
    sizes = out.groupBy("q1", "q2").count().collect()
    assert sizes and all(r["count"] >= k for r in sizes)
    prof = privacy.k_anonymity_profile(df, ["q1", "q2"], k)
    safe_total = sum(
        r["group_size"] for r in prof.collect() if r["k_anonymous"]
    )
    assert out.count() == safe_total
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_chunk_frame_boundaries_and_overlap_reconstruction(spark):
    """Chunk windows: short doc → one short chunk; exact-fit → one
    chunk; stride walk emits the right starts/lengths; consecutive
    chunks agree on their `overlap` shared tokens (the property RAG
    retrieval relies on); empty/NULL docs emit nothing."""
    from blinkit_etl_pipeline_spark.functions import text as T

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),   # < size
            (2, " ".join(f"x{i}" for i in range(16))),   # exact fit
            (3, " ".join(f"y{i}" for i in range(17))),   # one over
            (4, " ".join(f"z{i}" for i in range(100))),  # long walk
            (5, ""),
            (6, None),
        ],
        "doc_id bigint, text string",
    )
    out = T.chunk_frame(docs, size=16, overlap=4, keep=()).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2, 3, 4}  # 5/6 emit nothing
    assert [(r["chunk_len"], r["start_tok"]) for r in by_doc[1]] == [(10, 0)]
    assert [(r["chunk_len"], r["start_tok"]) for r in by_doc[2]] == [(16, 0)]
    assert sorted((r["start_tok"], r["chunk_len"]) for r in by_doc[3]) == [
        (0, 16), (12, 5)
    ]
    # 100 tokens, stride 12: chunks at 0,12,...,84 → 8 chunks, last len 16
    d4 = sorted(by_doc[4], key=lambda r: r["chunk_id"])
    assert len(d4) == 8 and all(r["n_chunks"] == 8 for r in d4)
    assert [r["start_tok"] for r in d4] == [12 * c for c in range(8)]
    for a, b in zip(d4, d4[1:]):  # overlap agreement
        assert a["chunk_text"].split()[-4:] == b["chunk_text"].split()[:4]
    # every token of the long doc is covered in order
    stitched = d4[0]["chunk_text"].split()
    for r in d4[1:]:
        stitched += r["chunk_text"].split()[4:]
    assert stitched == [f"z{i}" for i in range(100)]


def test_chunk_frame_rejects_bad_geometry(spark):
    import pytest

    from blinkit_etl_pipeline_spark.functions import text as T

    docs = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        T.chunk_frame(docs, size=0)
    with pytest.raises(ValueError):
        T.chunk_frame(docs, size=8, overlap=8)


def test_bm25_frame_matches_hand_computation(spark):
    """BM25 on a 3-doc corpus vs the formula computed in plain Python
    (Lucene idf spelling, k1=1.2 b=0.75)."""
    import math

    from blinkit_etl_pipeline_spark.functions import text as T

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data fast"),
            (2, "spark spark joins data"),
            (3, "a b c d e f g h"),
        ],
        "doc_id bigint, text string",
    )
    terms, k1, b = ("spark", "data"), 1.2, 0.75
    out = {r["doc_id"]: r["bm25"] for r in
           T.bm25_frame(docs, terms, k1=k1, b=b, topk=3).collect()}

    corpus = {1: "spark shuffles data fast".split(),
              2: "spark spark joins data".split(),
              3: "a b c d e f g h".split()}
    N = 3.0
    avgdl = (4 + 4 + 8) / 3.0
    for d, toks in corpus.items():
        score = 0.0
        for t in terms:
            tf = float(toks.count(t))
            df = float(sum(1 for tk in corpus.values() if t in tk))
            idf = math.log(1.0 + (N - df + 0.5) / (df + 0.5))
            score += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(toks) / avgdl)
            )
        assert out[d] == round(score, 6), d
    # ranking: doc 2 (two 'spark') above doc 1, doc 3 at zero
    ordered = sorted(out, key=lambda d: (-out[d], d))
    assert ordered == [2, 1, 3] and out[3] == 0.0


def test_mixture_rates_feasibility_and_floors(spark):
    """The plan must pick the largest total for which NO source is
    oversampled: the tightest source pins T, every keep_target stays
    <= n_obs, and floors always round the conservative way."""
    from blinkit_etl_pipeline_spark.operators import selection

    docs = spark.createDataFrame(
        [(i, "a" if i < 10 else ("b" if i < 110 else "c"))
         for i in range(1110)],
        "doc_id bigint, source string",
    )  # a:10, b:100, c:1000
    plan = {r["source"]: r for r in selection.mixture_rates(
        docs, {"a": 500_000, "b": 300_000, "c": 200_000}
    ).collect()}
    # T = min(10/0.5, 100/0.3, 1000/0.2) = 20 → keeps 10/6/4
    assert plan["a"]["keep_target"] == 10 and plan["a"]["rate_ppm"] == 1_000_000
    assert plan["b"]["keep_target"] == 6 and plan["b"]["rate_ppm"] == 60_000
    assert plan["c"]["keep_target"] == 4 and plan["c"]["rate_ppm"] == 4_000
    kept = selection.apply_mixture(docs, selection.mixture_rates(
        docs, {"a": 500_000, "b": 300_000, "c": 200_000}))
    # deterministic: same result every run; unplanned sources dropped
    assert kept.count() == selection.apply_mixture(
        docs, selection.mixture_rates(
            docs, {"a": 500_000, "b": 300_000, "c": 200_000})).count()
    assert kept.filter("source = 'a'").count() == 10  # rate 1e6 keeps all


def test_mixture_rates_rejects_bad_weights(spark):
    import pytest

    from blinkit_etl_pipeline_spark.operators import selection

    docs = spark.createDataFrame([(1, "a")], "doc_id bigint, source string")
    with pytest.raises(ValueError):
        selection.mixture_rates(docs, {})
    with pytest.raises(ValueError):
        selection.mixture_rates(docs, {"a": 600_000, "b": 600_000})
    with pytest.raises(ValueError):
        selection.mixture_rates(docs, {"a": 0})


def test_bm25_frame_null_text_counts_as_empty_doc(spark):
    """NULL text must behave as an empty document (dl=0, score 0) —
    not poison avgdl with legacy size(NULL) = -1."""
    from blinkit_etl_pipeline_spark.functions import text as T

    docs = spark.createDataFrame(
        [(1, "spark data"), (2, None), (3, "spark")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["bm25"] for r in
           T.bm25_frame(docs, ("spark",), topk=3).collect()}
    assert out[2] == 0.0
    # avgdl = (2+0+1)/3 = 1.0; doc3 (shorter-than-avg... exactly tf=1)
    # must strictly outrank doc1 (longer doc, same tf)
    assert out[3] > out[1] > 0.0


def test_temperature_mixture_upweights_small_sources(spark):
    """alpha=0.5 temperature weights: a 100:1 source imbalance becomes
    a 10:1 weight ratio (sqrt), so the small source's plan share rises;
    quantized-integer normalization keeps the plan deterministic."""
    from blinkit_etl_pipeline_spark.operators import selection

    docs = spark.createDataFrame(
        [(i, "big" if i < 10000 else "small") for i in range(10100)],
        "doc_id bigint, source string",
    )  # big:10000, small:100 → sqrt 100:10 → weights ~909090/90909 ppm
    plan = {r["source"]: r for r in
            selection.temperature_mixture_plan(docs).collect()}
    assert plan["big"]["w_ppm"] == 909_090
    assert plan["small"]["w_ppm"] == 90_909
    # raw share of small = 100/10100 ≈ 0.99%; temperature share ≈ 9.1%
    assert plan["small"]["w_ppm"] > 9 * (100 * 1_000_000 // 10_100) // 10
    # feasibility: T = min(1e10 div 909090, 1e8 div 90909) = 1100;
    # conservative floors: keep = T*w div 1e6 → 99 / 999 (never rounds
    # a source ABOVE its weight-implied share)
    assert plan["small"]["keep_target"] == 99
    assert plan["big"]["keep_target"] == 999
    # realized ratio stays within one ulp-of-ppm of 10:1
    assert abs(plan["big"]["keep_target"] / plan["small"]["keep_target"] - 10) < 0.2


def test_mixture_rates_rejects_absent_target_source(spark):
    """A positive-weight target source with zero corpus rows makes the
    mixture infeasible — the plan must raise, not silently re-balance
    over the sources that happen to exist."""
    import pytest

    from blinkit_etl_pipeline_spark.operators import selection

    docs = spark.createDataFrame(
        [(i, "common") for i in range(50)], "doc_id bigint, source string"
    )
    with pytest.raises(ValueError, match="no corpus rows"):
        selection.mixture_rates(
            docs, {"common": 500_000, "rare": 500_000}
        )


def test_shuffle_shards_deterministic_and_salted(spark):
    from blinkit_etl_pipeline_spark.operators.selection import shuffle_shards

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shuffle_shards(docs, n_shards=4, salt="e0").collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shuffle_shards(docs, n_shards=4, salt="e0").collect()}
    assert a == b  # byte-reproducible
    c = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shuffle_shards(docs, n_shards=4, salt="e1").collect()}
    assert a != c  # fresh epoch reshuffles
    # every shard is a dense 1..n rank, partitioning the corpus
    from collections import Counter
    by_shard = Counter(s for s, _ in a.values())
    assert sum(by_shard.values()) == 200
    for shard, cnt in by_shard.items():
        ranks = sorted(p for s, p in a.values() if s == shard)
        assert ranks == list(range(1, cnt + 1))


def test_shuffle_shards_rejects_nonpositive(spark):
    import pytest

    from blinkit_etl_pipeline_spark.operators.selection import shuffle_shards

    with pytest.raises(ValueError):
        shuffle_shards(spark.range(3).withColumnRenamed("id", "doc_id"),
                       n_shards=0)


def test_triplet_mine_invariants(spark):
    """Positives are the best near-dup partner; negatives are corpus
    members that are neither the anchor nor any of its partners; the
    whole mine is deterministic across runs."""
    from blinkit_etl_pipeline_spark.operators import dedup, selection

    base = (
        "the quick brown fox jumps over the lazy dog and keeps going "
        "through the quiet green field toward the distant hills at dawn"
    )
    rows = [(0, base), (1, base + " tonight"), (2, base + " forever")] + [
        (i, f"unique document number {i} about entirely different "
            f"topics like rivers bridges mountains and storms {i}")
        for i in range(3, 40)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.35)
    got = selection.triplet_mine(docs, pairs).collect()
    assert got, "near-dup cluster must anchor triplets"
    partners = {}
    for r in pairs.collect():
        partners.setdefault(r["doc_a"], set()).add(r["doc_b"])
        partners.setdefault(r["doc_b"], set()).add(r["doc_a"])
    ids = {r[0] for r in rows}
    for t in got:
        a, p, n = t["anchor_id"], t["positive_id"], t["negative_id"]
        assert p in partners[a]
        assert n in ids and n != a and n not in partners[a]
    again = selection.triplet_mine(docs, pairs).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_dp_release_noise_is_calibrated_laplace(spark):
    from blinkit_etl_pipeline_spark.operators import privacy

    # 400 singleton groups -> 400 independent Laplace(1) draws on dp_n
    df = spark.createDataFrame(
        [(f"g{i}", 50) for i in range(400)], "g string, v long"
    )
    out = privacy.dp_release(df, ["g"], "v", 100, eps_inv=1).collect()
    noises = [r.dp_n - r.n for r in out]
    assert min(noises) < 0 < max(noises)  # two-sided
    assert abs(sum(noises) / len(noises)) < 0.25  # centered
    med = sorted(abs(x) for x in noises)[len(noises) // 2]
    assert 0.4 < med < 1.1  # Laplace(1) median |x| = ln 2 ~ 0.693


def test_dp_release_clips_contributions(spark):
    from blinkit_etl_pipeline_spark.operators import privacy

    df = spark.createDataFrame(
        [("a", 10**9), ("a", 7), ("a", -5)], "g string, v long"
    )
    row = privacy.dp_release(df, ["g"], "v", 100, eps_inv=1).collect()[0]
    # clipped sum = 100 + 7 + 0; Laplace(100) noise, |noise| < 100*40
    assert abs(row.dp_sum - 107) < 4000
    assert row.n == 3


def test_dp_release_seeded_determinism_and_eps_scaling(spark):
    from blinkit_etl_pipeline_spark.operators import privacy

    df = spark.createDataFrame([("a", 5)] * 20, "g string, v long")
    r1 = privacy.dp_release(df, ["g"], "v", 10, eps_inv=1).collect()[0]
    r2 = privacy.dp_release(df, ["g"], "v", 10, eps_inv=1).collect()[0]
    assert (r1.dp_n, r1.dp_sum) == (r2.dp_n, r2.dp_sum)
    r3 = privacy.dp_release(
        df, ["g"], "v", 10, eps_inv=1, seed="dp-v2"
    ).collect()[0]
    assert (r3.dp_n, r3.dp_sum) != (r1.dp_n, r1.dp_sum)
    # eps_inv multiplies the SAME draw exactly (integer b, shared seed)
    r10 = privacy.dp_release(df, ["g"], "v", 10, eps_inv=10).collect()[0]
    assert abs((r10.dp_n - r10.n) - 10 * (r1.dp_n - r1.n)) < 1e-6


def test_dp_release_null_groups_get_independent_nonnull_noise(spark):
    """r7 review regression: NULL group values must neither null the
    noise key (concat_ws skips NULLs) nor collide (NULL,'x') with
    ('x',NULL)."""
    from blinkit_etl_pipeline_spark.operators import privacy

    df = spark.createDataFrame(
        [(None, "x", 5), ("x", None, 5)],
        "g1 string, g2 string, v long",
    )
    rows = privacy.dp_release(df, ["g1", "g2"], "v", 10).collect()
    assert len(rows) == 2
    noises = [round(r.dp_n - r.n, 6) for r in rows]
    assert all(n is not None and abs(n) > 0 for n in noises)
    assert noises[0] != noises[1]  # no seed collision


def test_triplet_mine_knn_hard_negative_invariants(spark):
    """r10: the graph-mined triplet keeps the contrastive contract —
    positive strictly at rank 1, negative the least-similar member of
    the SAME neighborhood (hard, not uniform): pos_cos >= neg_cos for
    every anchor, both ids are real graph neighbors, and anchors with
    one edge yield no row."""
    from conftest import SF_SMOKE

    from blinkit_etl_pipeline_spark.operators import selection, vector

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    t = selection.triplet_mine_knn(emb, k=5, iters=1).cache()
    assert t.filter(F.col("pos_cos") < F.col("neg_cos")).count() == 0
    assert t.filter(
        F.col("positive_id") == F.col("negative_id")
    ).count() == 0
    g = vector.knn_graph(emb, k=5, iters=1).select(
        F.col("node_id").alias("anchor_id"),
        F.col("neighbor_id").alias("positive_id"),
    )
    assert t.join(g, ["anchor_id", "positive_id"], "left_anti").count() == 0
    # every multi-edge anchor mines exactly one triplet
    degrees = (
        vector.knn_graph(emb, k=5, iters=1)
        .groupBy("node_id")
        .count()
    )
    want = degrees.filter(F.col("count") >= 2).count()
    assert t.count() == want
    t.unpersist()
