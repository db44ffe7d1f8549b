"""Approximation-quality gates: recall floors, survivor groups,
trained-codebook provenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from blinkit_etl_pipeline_spark.operators import dedup
from blinkit_etl_pipeline_spark.plans.northstar import q_ann_recall, q_dedup_recall

from conftest import SF_SMOKE


def test_ann_recall_floors(spark):
    """Deploying an approximate ANN path means knowing its recall; the
    measured values are deterministic (seeded planes, fixed data), so
    assert floors under the measured 0.69 (lsh) / 0.76 (ivf)."""
    rows = (
        q_ann_recall(spark, SF_SMOKE)
        .groupBy("method")
        .agg(F.avg("recall_at_k").alias("r"))
        .collect()
    )
    recall = {r["method"]: r["r"] for r in rows}
    assert set(recall) == {"lsh", "ivf"}
    assert recall["lsh"] >= 0.5, recall
    assert recall["ivf"] >= 0.5, recall


def test_dedup_recall_floors(spark):
    rows = q_dedup_recall(spark, SF_SMOKE).collect()
    by_method = {r["method"]: r for r in rows}
    # MinHash banding at 16 perms surfaces every planted near-dup pair
    assert by_method["minhash_lsh"]["recall"] >= 0.95
    assert by_method["embedding_lsh"]["recall"] >= 0.5
    # both verify candidates exactly, so precision is exact by design
    assert by_method["minhash_lsh"]["precision"] == 1.0
    assert by_method["embedding_lsh"]["precision"] == 1.0


def test_connected_components_small_graph(spark):
    """Path graph + separate component: labels = component min; path
    halving converges well under the iteration cap."""
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (21, 20)],
        "doc_a bigint, doc_b bigint",
    )
    got = {
        r["doc_id"]: (r["group_id"], r["group_size"])
        for r in dedup.dedup_groups(edges).collect()
    }
    assert got == {
        1: (1, 5), 2: (1, 5), 3: (1, 5), 4: (1, 5), 5: (1, 5),
        10: (10, 2), 11: (10, 2),
        20: (20, 2), 21: (20, 2),
    }


def test_trained_codebook_matches_retraining(spark):
    """The shipped literal codebook is exactly what the deterministic
    trainer reproduces on its training slice (provenance check)."""
    from blinkit_etl_pipeline_spark.operators.vector import kmeans_codebook
    from blinkit_etl_pipeline_spark.plans.codebook import (
        TRAIN_ITERS,
        TRAIN_K,
        TRAIN_SF_DIR,
        TRAINED_IVF_CODEBOOK,
    )

    emb = spark.read.parquet(f"{TRAIN_SF_DIR}/embeddings.parquet")
    retrained = kmeans_codebook(emb, k=TRAIN_K, iters=TRAIN_ITERS)
    assert retrained == TRAINED_IVF_CODEBOOK


def test_semantic_codebook_matches_retraining_at_derived_k(spark):
    """The SemDeDup artifact's k is exactly derive_num_clusters(n) on
    its training corpus, and its centroids are what the trainer
    reproduces — so the pinned path and the live-training path can
    never diverge for the oracle corpus."""
    from blinkit_etl_pipeline_spark.operators.vector import (
        derive_num_clusters,
        kmeans_codebook,
        semantic_codebook,
    )
    from blinkit_etl_pipeline_spark.plans.codebook import (
        SEMANTIC_CODEBOOK,
        SEMANTIC_K,
        TRAIN_ITERS,
        TRAIN_SF_DIR,
    )

    emb = spark.read.parquet(f"{TRAIN_SF_DIR}/embeddings.parquet")
    n = emb.count()
    assert derive_num_clusters(n) == SEMANTIC_K == len(SEMANTIC_CODEBOOK)
    retrained = kmeans_codebook(emb, k=SEMANTIC_K, iters=TRAIN_ITERS)
    assert retrained == SEMANTIC_CODEBOOK
    # and the auto path resolves to the pinned artifact (no retrain)
    assert semantic_codebook(emb, pinned=SEMANTIC_CODEBOOK) == SEMANTIC_CODEBOOK


def test_derive_num_clusters_scales_sublinearly():
    from blinkit_etl_pipeline_spark.operators.vector import derive_num_clusters

    assert derive_num_clusters(100) == 8  # floor
    assert derive_num_clusters(500) == 16
    assert derive_num_clusters(5_000) == 50
    assert derive_num_clusters(500_000) == 500
    # both cost terms stay sub-quadratic: n·k and n²/k are O(n^1.5)
    for n in (10**4, 10**6, 10**8):
        k = derive_num_clusters(n)
        assert n * k <= 2 * n**1.5 and n * n / k <= 2 * n**1.5


def test_connected_components_raises_when_iteration_cap_hit(spark):
    """ADVICE r2: exhausting max_iters must raise, not silently return
    half-propagated labels (which would split components downstream)."""
    import pytest

    from blinkit_etl_pipeline_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a bigint, doc_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=1)
    # and with room to converge the same graph labels as one component
    labels = connected_components(chain, max_iters=25)
    assert set(r["label"] for r in labels.collect()) == {0}


def test_trained_ivf_list_balance(spark):
    """The codebook ships only if its inverted lists are balanced: a
    dominant list would make one probe scan most of the corpus."""
    from blinkit_etl_pipeline_spark.plans.northstar import q_ann_ivf_balance

    rows = q_ann_ivf_balance(spark, SF_SMOKE).collect()
    assert len(rows) == 8
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert max(r["share"] for r in rows) <= 0.3, rows  # ideal = 0.125


def test_prefix_jaccard_equals_plain_jaccard(spark):
    """Prefix filtering is an EXACT candidate filter (pigeonhole bound):
    at several thresholds the pair set must equal the plain
    inverted-index join's, not approximate it."""
    from blinkit_etl_pipeline_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    for t in (0.5, 0.8, 0.95):
        plain = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=t).collect()
        }
        pref = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dedup.ngram_jaccard_pairs_prefix(
                docs, n=3, threshold=t
            ).collect()
        }
        assert pref == plain, (t, len(pref), len(plain))


def test_prefix_bound_exact_integer_at_055(spark):
    """ADVICE r3: float ceil(100·0.55) = 56 (the double product sits one
    ulp above 55), which shortened the prefix by one and could drop true
    pairs. Adversarial corpus: |A| = 100 shingles of which the 45
    non-shared ones are globally rarest (they fill the buggy 45-long
    prefix completely), |B| = 55 shingles all shared with A, J = 55/100
    = 0.55 exactly. The float bound misses the pair; the exact integer
    bound must find it."""
    shared = " ".join(f"c{i:02d}" for i in range(57))  # 55 trigrams
    uniq = " ".join(f"a{i:02d}" for i in range(45))  # 43 pure + 2 bridge
    docs = spark.createDataFrame(
        [(1, uniq + " " + shared), (2, shared)], "doc_id bigint, text string"
    )
    plain = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.55).collect()
    }
    pref = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs_prefix(
            docs, n=3, threshold=0.55
        ).collect()
    }
    assert plain == {(1, 2, 0.55)}  # the corpus is the boundary case
    assert pref == plain


def test_shingle_index_compat_guard(spark):
    """ADVICE r3: a ShingleIndex built with different (n, cap) must be
    rejected loudly — consuming it silently yields wrong Jaccard."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id bigint, text string"
    )
    idx3 = dedup.build_shingle_index(docs, n=3)
    # compatible: runs
    dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5, idx=idx3).collect()
    with pytest.raises(ValueError, match="silently wrong"):
        dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.5, idx=idx3)
    with pytest.raises(ValueError, match="silently wrong"):
        dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.5, max_shingle_df=5, idx=idx3
        )
    with pytest.raises(ValueError, match="silently wrong"):
        dedup.minhash_lsh_pairs(docs, n=2, threshold=0.5, idx=idx3)
    with pytest.raises(ValueError, match="silently wrong"):
        dedup.ngram_jaccard_pairs_prefix(docs, n=2, threshold=0.5, idx=idx3)


def test_ivf_recall_curve_monotone(spark):
    """The operating curve must be coherent: more probes ⇒ recall and
    scan cost both non-decreasing, reaching recall 1.0 when every list
    is probed (nprobe = num_centroids ⇒ the scan IS brute force)."""
    from blinkit_etl_pipeline_spark.plans.northstar import q_ann_ivf_curve

    rows = sorted(
        q_ann_ivf_curve(spark, SF_SMOKE).collect(), key=lambda r: r["nprobe"]
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8]
    recalls = [r["avg_recall"] for r in rows]
    scans = [r["scan_fraction"] for r in rows]
    assert recalls == sorted(recalls), recalls
    assert scans == sorted(scans), scans
    assert recalls[-1] == 1.0, recalls  # all lists probed = exact
    assert abs(scans[-1] - 1.0) < 1e-6, scans
    assert scans[0] < 0.5, scans  # probing 1 of 8 lists must scan far less


# ----------------------------------------------------------------------
# Gopher-style quality rules (crafted strings: the synthetic corpus is
# single-line and symbol-free, so the line/symbol rules are pinned here)
# ----------------------------------------------------------------------


def test_gopher_rules_fire_on_crafted_documents(spark):
    from pyspark.sql import functions as F

    from blinkit_etl_pipeline_spark.functions import text as T

    good_body = ("the be to of and that have with " + "word " * 50).strip()
    cases = [
        # (doc_id, text, failing_rule or None)
        (0, good_body, None),
        (1, "the be short text", "r_word_count"),  # < 50 words
        (2, ("a b c d e f g h " * 8 + "the be").strip(), "r_mean_word_len"),
        (3, good_body + " " + "# " * 8, "r_symbol_ratio"),
        (4, "\n".join(["- bullet item " + good_body] * 10), "r_bullet_lines"),
        (5, "\n".join([good_body + " trailing..."] * 10), "r_ellipsis_lines"),
        (6, ("the be to of " + "42 17 99 1 2 3 " * 12).strip(), "r_alpha_words"),
        (7, ("the " + "word " * 60).strip(), "r_stopwords"),  # 1 < 2 required
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "doc_id bigint, text string"
    )
    cols = T.gopher_columns(F.col("text"), T.tokens(F.col("text")))
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[c.alias(n) for n, c in cols.items()]
        ).collect()
    }
    rule_names = [
        "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words", "r_stopwords",
    ]
    for doc_id, _text, failing in cases:
        r = rows[doc_id]
        if failing is None:
            assert r["gopher_pass"], r
            assert all(r[n] for n in rule_names), r
        else:
            assert not r[failing], (doc_id, failing, r)
            assert not r["gopher_pass"], (doc_id, r)


def test_gopher_thresholds_are_integer_exact_at_the_boundary(spark):
    """A document sitting exactly ON a rational threshold must pass —
    cross-multiplied integer comparisons have no float fuzz."""
    from pyspark.sql import functions as F

    from blinkit_etl_pipeline_spark.functions import text as T

    # exactly 50 words, mean word length exactly 3.0 (all 3-char words),
    # exactly 1 symbol per 10 words, exactly 1/5 non-alpha words
    body = ("the and two " * 16).strip() + " of " + "5 " * 9  # 50+10 mix
    words = body.split()
    n = len(words)
    n_alpha = sum(1 for w in words if any(c.isalpha() for c in w))
    df = spark.createDataFrame([(0, body)], "doc_id bigint, text string")
    cols = T.gopher_columns(F.col("text"), T.tokens(F.col("text")))
    r = df.select(*[c.alias(name) for name, c in cols.items()]).collect()[0]
    assert r["n_words"] == n
    # boundary check the alpha rule against the exact rational
    assert r["r_alpha_words"] == (n_alpha * 5 >= n * 4)


# ----------------------------------------------------------------------
# BPE tokenizer training
# ----------------------------------------------------------------------


def test_bpe_train_learns_the_classic_merges(spark):
    """Sennrich's worked example: low×5, lower×2, newest×6, widest×3.
    Merge order and tie-breaks must be deterministic."""
    from blinkit_etl_pipeline_spark.functions import bpe

    docs = spark.createDataFrame(
        [(0, " ".join(["low"] * 5 + ["lower"] * 2
                      + ["newest"] * 6 + ["widest"] * 3))],
        "doc_id bigint, text string",
    )
    merges = bpe.bpe_train(docs, 6)
    assert merges == [
        ("e", "s", 9),    # es in newest(6) + widest(3)
        ("es", "t", 9),
        ("l", "o", 7),    # low(5) + lower(2)
        ("lo", "w", 7),
        ("e", "w", 6),    # tie (e,w)/(n,e)/(w,est) → lexicographic
        ("ew", "est", 6),
    ]
    seg = {
        r["word"]: list(r["symbols"])
        for r in bpe.segment(
            bpe.with_symbols(bpe.word_counts(docs)), merges
        ).collect()
    }
    assert seg["low"] == ["low"]
    assert seg["lower"] == ["low", "e", "r"]
    assert seg["newest"] == ["n", "ewest"]
    assert seg["widest"] == ["w", "i", "d", "est"]


def test_bpe_merge_fold_is_greedy_non_overlapping(spark):
    """aaa under merge (a,a) → [aa, a], never the overlapping [aa, aa]."""
    from pyspark.sql import functions as F

    from blinkit_etl_pipeline_spark.functions import bpe

    df = spark.createDataFrame(
        [("aaa", 1), ("aaaa", 1), ("baab", 1)], "word string, wcount bigint"
    )
    out = {
        r["word"]: list(r["m"])
        for r in bpe.with_symbols(df)
        .select("word", bpe.apply_merge(F.col("symbols"), "a", "a").alias("m"))
        .collect()
    }
    assert out["aaa"] == ["aa", "a"]
    assert out["aaaa"] == ["aa", "aa"]
    assert out["baab"] == ["b", "aa", "b"]


def test_pq_codebook_matches_retraining(spark):
    """The shipped PQ artifact is exactly what the deterministic
    per-subspace trainer reproduces (provenance, like the IVF books)."""
    from blinkit_etl_pipeline_spark.operators.vector import pq_codebook
    from blinkit_etl_pipeline_spark.plans.codebook import (
        PQ_CODEBOOK,
        PQ_K,
        PQ_M,
        TRAIN_ITERS,
        TRAIN_SF_DIR,
    )

    emb = spark.read.parquet(f"{TRAIN_SF_DIR}/embeddings.parquet")
    retrained = pq_codebook(emb, m=PQ_M, k=PQ_K, iters=TRAIN_ITERS)
    assert retrained == PQ_CODEBOOK


def test_pq_adc_rerank_recall_against_exact_l2(spark):
    """PQ is an approximation — pin its measured quality against the
    EXACT squared-L2 top-5 (both sides integer-exact → stable). Two
    tiers: raw 32-bit ADC ranking on structureless random embeddings
    is deliberately coarse (measured ~0.14 — the documented reason the
    registry query reranks); the ADC-shortlist + exact-rerank tier
    must restore strong recall (shortlist only misses when the true
    neighbor falls outside the ADC top-50)."""
    import numpy as np

    from blinkit_etl_pipeline_spark.operators import vector
    from blinkit_etl_pipeline_spark.plans.codebook import PQ_CODEBOOK
    from blinkit_etl_pipeline_spark.plans.northstar import (
        ANN_K,
        ANN_QUERY_IDS,
        PQ_RERANK,
        _emb,
    )

    from conftest import SF_CORRECTNESS

    emb = _emb(spark, SF_CORRECTNESS)

    def topk_sets(df):
        sets: dict = {}
        for r in df.collect():
            sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sets

    raw = topk_sets(vector.pq_adc_topk(emb, ANN_QUERY_IDS, PQ_CODEBOOK, k=ANN_K))
    rr = topk_sets(
        vector.pq_adc_topk(
            emb, ANN_QUERY_IDS, PQ_CODEBOOK, k=ANN_K, rerank=PQ_RERANK
        )
    )

    rows = vector.with_q(emb).select("vec_id", "qvec").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["qvec"]) for r in rows], dtype=np.float64)

    def recall(sets):
        hits = total = 0
        for qid in ANN_QUERY_IDS:
            qv = X[ids == qid][0]
            d = ((X - qv) ** 2).sum(axis=1)
            d[ids == qid] = np.inf
            truth = set(ids[np.lexsort((ids, d))[:ANN_K]])
            hits += len(truth & sets[qid])
            total += ANN_K
        return hits / total

    raw_r, rr_r = recall(raw), recall(rr)
    assert rr_r >= 0.85, f"reranked PQ recall@{ANN_K} collapsed: {rr_r:.2f}"
    assert rr_r > raw_r, (raw_r, rr_r)  # the rerank tier must earn its cost


def test_chunk_containment_catches_partial_duplication(spark):
    """A document wholly contained in a larger one must surface with
    containment_a = 1.0 even though whole-doc Jaccard is diluted; an
    unrelated document must not pair with either."""
    from blinkit_etl_pipeline_spark.functions.text import chunk_frame
    from blinkit_etl_pipeline_spark.operators.dedup import (
        chunk_containment_pairs,
    )

    base = " ".join(f"w{i}" for i in range(40))
    extra = " ".join(f"x{i}" for i in range(40))
    other = " ".join(f"z{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base, "en"), (2, base + " " + extra, "en"), (3, other, "en")],
        "doc_id long, text string, lang string",
    )
    chunks = chunk_frame(docs, size=8, overlap=0)
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in chunk_containment_pairs(
            chunks, n=3, chunk_threshold=0.5, containment_threshold=0.2
        ).collect()
    }
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    # all five of doc 1's chunks are verbatim chunks of doc 2
    assert r["n_chunks_a"] == 5 and r["n_chunks_b"] == 10
    assert r["matched_chunks_a"] == 5 and r["matched_chunks_b"] == 5
    assert r["containment_a"] == 1.0 and r["containment_b"] == 0.5


def test_semantic_fps_oracle_generalizes_to_replica_corpus(spark, tmp_path):
    """The FPS-codebook semantic dedup must stay oracle-exact on a
    corpus OUTSIDE the driver testdata tree (ns_dedup_semantic's pinned
    artifact can't, by design): perturb the smoke embeddings (reversed
    dims — different cosine structure, different derived codebook),
    write to /tmp, and replay the full WITH RECURSIVE oracle there."""
    import duckdb

    from blinkit_etl_pipeline_spark.oracle_check import canonicalize
    from blinkit_etl_pipeline_spark.plans.northstar import (
        ORACLES,
        q_dedup_semantic_fps,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    replica = emb.select("vec_id", F.reverse("embedding").alias("embedding"))
    out = str(tmp_path / "replica")
    replica.write.parquet(f"{out}/embeddings.parquet")

    sdf = q_dedup_semantic_fps(spark, out).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{out}/embeddings.parquet/*.parquet')"
    )
    odf = con.execute(ORACLES["ns_dedup_semantic_fps"]).fetchdf()
    assert len(sdf) == emb.count()
    assert canonicalize(sdf) == canonicalize(odf)
    # and it actually deduplicates something on this corpus OR keeps
    # everything — either way the decision column is boolean-complete
    assert set(sdf["is_kept"].unique()) <= {True, False}


def test_rrf_fusion_promotes_doc_ranked_by_both_lists(spark):
    """A document mid-ranked by BOTH retrievers must outscore documents
    top-ranked by only one — the property RRF exists for. Constructed:
    doc 1 is rank-1 lexically, doc 2 rank-1 by cosine, doc 3 is rank-2
    in both lists → 1/62+1/62 > 1/61 ⇒ doc 3 wins the fusion."""
    from blinkit_etl_pipeline_spark.plans.northstar import RRF_K0

    bm = spark.createDataFrame(
        [(0, 1, 1), (0, 3, 2)], "query_id long, doc_id long, r_bm25 int"
    )
    cos = spark.createDataFrame(
        [(0, 2, 1), (0, 3, 2)], "query_id long, doc_id long, r_cos int"
    )
    fused = bm.join(cos, ["query_id", "doc_id"], "full_outer").select(
        "query_id", "doc_id",
        (F.coalesce(F.lit(1.0) / (F.lit(RRF_K0) + F.col("r_bm25")), F.lit(0.0))
         + F.coalesce(F.lit(1.0) / (F.lit(RRF_K0) + F.col("r_cos")), F.lit(0.0))
         ).alias("rrf"),
    )
    rows = {r["doc_id"]: r["rrf"] for r in fused.collect()}
    assert rows[3] > rows[1] == rows[2]


def test_bm25_bydoc_scores_shared_vocabulary_only(spark):
    """The inverted probe must score only documents sharing a term with
    the query, rank the most-overlapping doc first, and exclude the
    query document itself."""
    from blinkit_etl_pipeline_spark.functions.text import bm25_bydoc_topk

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma zeta"),      # 3 shared terms
            (2, "alpha omega psi chi"),        # 1 shared term
            (3, "completely disjoint words here"),
        ],
        "doc_id long, text string",
    )
    out = bm25_bydoc_topk(docs, [0], topk=10).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert 0 not in by_doc            # self excluded
    assert 3 not in by_doc            # no shared vocabulary → never scored
    assert by_doc[1]["rank"] == 1 and by_doc[2]["rank"] == 2
    assert by_doc[1]["bm25"] > by_doc[2]["bm25"] > 0


def test_residual_pq_codebook_matches_retraining(spark):
    """The shipped RESIDUAL PQ artifact reproduces from the shipped
    coarse codebook + the deterministic residual trainer — the pair
    ships as one versioned artifact and can't silently drift."""
    from blinkit_etl_pipeline_spark.operators.vector import (
        pq_codebook,
        residual_frame,
    )
    from blinkit_etl_pipeline_spark.plans.codebook import (
        PQ_K,
        PQ_M,
        RESIDUAL_PQ_CODEBOOK,
        TRAIN_ITERS,
        TRAIN_SF_DIR,
        TRAINED_IVF_CODEBOOK,
    )

    emb = spark.read.parquet(f"{TRAIN_SF_DIR}/embeddings.parquet")
    retrained = pq_codebook(
        residual_frame(emb, TRAINED_IVF_CODEBOOK),
        m=PQ_M, k=PQ_K, iters=TRAIN_ITERS,
    )
    assert retrained == RESIDUAL_PQ_CODEBOOK


def test_span_dedup_crafted_documents(spark):
    """Hand-computable span removal: doc 2 repeats doc 1's 4-token run,
    doc 3 repeats it twice back-to-back (overlapping windows must merge
    into ONE maximal span), doc 4 shares nothing."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d x1 y1 z1"),          # canonical occurrence
            (2, "p2 a b c d q2 r2 s2"),       # one copy -> one span
            (3, "a b c d a b c d t3"),        # two copies; pos1 is dup
            #   of canon too (doc 1 owns it); windows chain into one span
            (4, "u4 v4 w4 x4 y4 z4 q4"),      # untouched
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.span_dedup(docs, k=4).collect()
    }
    assert out[1]["spans_removed"] == 0
    assert out[1]["clean_text"] == "a b c d x1 y1 z1"
    assert out[2]["spans_removed"] == 1
    assert out[2]["tokens_removed"] == 4
    assert out[2]["clean_text"] == "p2 q2 r2 s2"
    # doc 3: every 4-window over positions 1..8 duplicates doc 1's run
    # (or its own) -> the merged span covers tokens 1..8, leaving "t3"
    assert out[3]["spans_removed"] == 1
    assert out[3]["tokens_removed"] == 8
    assert out[3]["clean_text"] == "t3"
    assert out[4]["spans_removed"] == 0
    assert out[4]["clean_text"] == "u4 v4 w4 x4 y4 z4 q4"


def test_span_dedup_short_docs_untouched(spark):
    """Documents shorter than k produce zero windows and survive whole —
    including the empty-text edge (reconstruction is '' not NULL)."""
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in dedup.span_dedup(docs, k=4).collect()}
    assert all(rows[i]["spans_removed"] == 0 for i in (1, 2, 3))
    assert rows[1]["clean_text"] == "a b"  # exact dup, but < k tokens
    assert rows[3]["clean_text"] == ""
    assert rows[3]["n_tokens"] == 0


# ----------------------------------------------------------------------
# corpus drift (operators/profile.py::drift_psi)
# ----------------------------------------------------------------------


def test_drift_psi_zero_for_identical_slices(spark):
    from blinkit_etl_pipeline_spark.operators import profile

    rows = [("f", b, cur, 50) for b in ["a", "b", "c"] for cur in (True, False)]
    out = profile.drift_psi(
        spark.createDataFrame(
            rows, "feature string, bucket string, is_cur boolean, cnt long"
        )
    ).collect()
    assert len(out) == 1 and out[0]["psi_q"] == 0 and not out[0]["drifted"]


def test_drift_psi_flags_disjoint_distributions(spark):
    from blinkit_etl_pipeline_spark.operators import profile

    rows = [("f", "a", False, 100), ("f", "b", True, 100)]
    out = profile.drift_psi(
        spark.createDataFrame(
            rows, "feature string, bucket string, is_cur boolean, cnt long"
        )
    ).collect()[0]
    assert out["drifted"] and out["psi"] > 1.0 and out["n_buckets"] == 2


def test_edit_distance_pairs_sees_typos_jaccard_misses(spark):
    """Three scattered typos shred 3-gram shingles (each kills up to 3)
    but cost exactly 3 edits — the tier's reason to exist."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill and the birds sing in the "
        "green garden under a bright morning sun near the old stone "
        "wall by the river bend"
    )
    typod = base.replace("quick", "quisk").replace(
        "watches", "watchas"
    ).replace("garden", "gardon")
    other = (
        "completely different content about spark physical plans and "
        "shuffle exchanges with adaptive query execution and broadcast "
        "hash joins over partitioned parquet tables in a distributed "
        "cluster running many executors"
    )
    docs = spark.createDataFrame(
        [(1, base), (2, typod), (3, other)], "doc_id long, text string"
    )
    rows = dedup.edit_distance_pairs(
        docs, prefix_len=300, max_dist=10
    ).collect()
    got = {(r.doc_a, r.doc_b): r.edit_distance for r in rows}
    assert (1, 2) in got and got[(1, 2)] == 3
    assert all(3 not in pair for pair in got)


def test_edit_distance_bounded_verify_drops_far_pairs(spark):
    """Pairs past max_dist vanish even when blocking proposes them
    (identical shingle tail, mangled prefix)."""
    tail = " shared identical ending " + "common words repeated " * 20
    docs = spark.createDataFrame(
        [(1, "aaaa bbbb cccc" + tail), (2, "zzzz yyyy xxxx" + tail)],
        "doc_id long, text string",
    )
    rows = dedup.edit_distance_pairs(
        docs, prefix_len=14, max_dist=5
    ).collect()
    assert rows == []  # prefix distance 12 > 5 -> dropped


def test_tfidf_keywords_rank_rare_terms_higher(spark):
    """r9: a term appearing in one doc outranks an equally-frequent
    term appearing everywhere (idf), per-doc top-k is deterministic,
    and the WindowGroupLimit shape is in the plan."""
    from blinkit_etl_pipeline_spark.functions import text as T

    docs = spark.createDataFrame(
        [
            (1, "common rare rare common common"),
            (2, "common common common zeta"),
            (3, "common other other"),
        ],
        "doc_id long, text string",
    )
    out = T.tfidf_keywords(docs, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = {(r["doc_id"], r["token"]): r["score_q"] for r in out.collect()}
    # doc 1: 'rare' (tf=2, df=1) must beat 'common' (tf=3, df=3)
    assert rows[(1, "rare")] > rows[(1, "common")]
    # 'common' is in every doc: idf_q = lnq(3)-lnq(3) = 0 -> score 0
    assert rows[(1, "common")] == 0
    assert all(len([k for k in rows if k[0] == d]) == 2 for d in (1, 2, 3))


def test_pmi_collocations_finds_glued_pair(spark):
    """A bigram that always co-occurs gets the top PMI; pairs under
    the count floor are excluded."""
    from blinkit_etl_pipeline_spark.functions import text as T

    # 'new york' appears 6x and its parts appear ONLY together;
    # 'the cat' also 6x but 'the' also precedes 'dog' (diluted);
    # 'one two' appears twice — under the count floor
    glued = " ".join(["new york"] * 6)
    spread = " ".join(["the cat"] * 6 + ["the dog"] * 6 + ["one two"] * 2)
    docs = spark.createDataFrame(
        [(1, glued), (2, spread)], "doc_id long, text string"
    )
    out = T.pmi_collocations(docs, min_count=5, top=10).collect()
    assert out[0]["w1"] == "new" and out[0]["w2"] == "york"
    pairs = {(r["w1"], r["w2"]) for r in out}
    assert ("one", "two") not in pairs  # count floor
    # 'the cat' present but scores below the glued pair
    the_cat = [r for r in out if (r["w1"], r["w2"]) == ("the", "cat")]
    assert the_cat and the_cat[0]["pmi_q"] < out[0]["pmi_q"]
