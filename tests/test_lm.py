"""Model-based quality filters (functions/lm.py): Naive Bayes quality
classifier and bigram-LM perplexity — semantic invariants beyond the
value-exact oracle checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from blinkit_etl_pipeline_spark.functions import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# A corpus where quality is separable by vocabulary: "good" docs are
# long English prose with stopwords; "bad" docs are symbol-heavy spam.
GOOD = (
    "the quick brown fox jumps over the lazy dog and that is a fine "
    "sight to see because with every passing day the fields grow "
    "greener and the rivers run clearer toward the distant blue hills "
    "while farmers tend their quiet gardens and children walk along "
    "the winding lanes to school with books and bright ideas about "
    "the wide world waiting patiently for them beyond the old bridge"
)
BAD = "buy $$$ now ### click ... win ### free $$$ ... prize ### lucky"


def test_nb_learns_the_vocabulary_split(spark):
    rows = [(i, GOOD + f" extra{i}") for i in range(6)] + [
        (10 + i, BAD + f" spam{i}") for i in range(6)
    ]
    out = lm.nb_quality_frame(_docs(spark, rows)).collect()
    by_id = {r["doc_id"]: r for r in out}
    # labels: prose passes the Gopher rules, spam fails them
    assert all(by_id[i]["gopher_pass"] for i in range(6))
    assert not any(by_id[10 + i]["gopher_pass"] for i in range(6))
    # NB trained on those labels reproduces the split on seen docs
    assert all(by_id[i]["nb_pass"] for i in range(6))
    assert not any(by_id[10 + i]["nb_pass"] for i in range(6))
    # log-odds are exact integers with the right signs
    assert all(by_id[i]["log_odds_q"] > 0 for i in range(6))
    assert all(by_id[10 + i]["log_odds_q"] < 0 for i in range(6))


def test_nb_empty_doc_scores_the_prior(spark):
    rows = [(0, GOOD), (1, GOOD + " again"), (2, BAD), (3, "")]
    out = {r["doc_id"]: r for r in lm.nb_quality_frame(_docs(spark, rows)).collect()}
    # prior: 2 pass / 4 docs (+Laplace) -> ln(3/6)-ln(3/6) = 0
    assert out[3]["log_odds_q"] == 0 and out[3]["nb_pass"] is False


def test_bigram_nll_flags_the_unpredictable_doc(spark):
    # three near-identical docs (predictable bigrams) + one scramble
    base = "a b c d e f g h i j a b c d e f g h i j"
    rows = [
        (0, base),
        (1, base),
        (2, base),
        (3, "j a h c f e b i d g j h a f c b e g i d"),
    ]
    out = {r["doc_id"]: r for r in lm.bigram_nll_frame(_docs(spark, rows)).collect()}
    assert out[3]["flagged"] and not out[0]["flagged"]
    assert out[3]["avg_nll"] > out[0]["avg_nll"] > 0
    # every doc has 19 bigrams; nll_q is an exact positive integer
    assert all(out[i]["n_bigrams"] == 19 for i in range(4))
    assert all(out[i]["nll_q"] > 0 for i in range(4))


def test_bigram_nll_short_docs_never_flagged(spark):
    rows = [(0, "solo"), (1, ""), (2, "a b a b a b")]
    out = {r["doc_id"]: r for r in lm.bigram_nll_frame(_docs(spark, rows)).collect()}
    for i in (0, 1):
        assert out[i]["n_bigrams"] == 0
        assert out[i]["nll_q"] == 0
        assert out[i]["flagged"] is False


def test_hashed_embeddings_separate_similar_from_dissimilar(spark):
    """Feature-hashed embeddings: near-identical docs land close in
    cosine, unrelated docs far — and entries are deterministic."""
    from blinkit_etl_pipeline_spark.functions.text import (
        hashed_embedding_entries,
    )

    a = "the quick brown fox jumps over the lazy dog near the river"
    rows = [
        (0, a),
        (1, a + " tonight"),
        (2, "completely different vocabulary discussing spark shuffles "
            "partitions exchanges broadcast joins and query plans"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    e = hashed_embedding_entries(docs, dim=64)
    ent = {}
    for r in e.collect():
        ent.setdefault(r["doc_id"], {})[r["idx"]] = r["val"]

    def cos(x, y):
        dot = sum(v * y.get(i, 0) for i, v in x.items())
        import math
        return dot / (
            math.sqrt(sum(v * v for v in x.values()))
            * math.sqrt(sum(v * v for v in y.values()))
        )

    assert cos(ent[0], ent[1]) > 0.9
    assert cos(ent[0], ent[2]) < 0.5
    # deterministic across invocations
    again = {(r["doc_id"], r["idx"], r["val"]) for r in
             hashed_embedding_entries(docs, dim=64).collect()}
    assert again == {(r["doc_id"], r["idx"], r["val"]) for r in e.collect()}


def test_dsir_upweights_target_like_documents(spark):
    # target model = Gopher-pass prose; docs sharing its n-grams get
    # higher importance weights than vocabulary-disjoint spam
    rows = [(i, GOOD + f" extra{i}") for i in range(6)] + [
        (10 + i, BAD + f" spam{i}") for i in range(6)
    ]
    out = {r["doc_id"]: r for r in lm.dsir_frame(_docs(spark, rows)).collect()}
    assert len(out) == 12
    prose_w = [out[i]["logw_q"] for i in range(6)]
    spam_w = [out[10 + i]["logw_q"] for i in range(6)]
    assert min(prose_w) > max(spam_w)
    # the Gumbel perturbation is hash-derived: a rerun is bit-identical
    again = {
        r["doc_id"]: r for r in lm.dsir_frame(_docs(spark, rows)).collect()
    }
    assert all(
        out[k]["score_q"] == again[k]["score_q"]
        and out[k]["selected"] == again[k]["selected"]
        for k in out
    )


def test_dsir_empty_doc_scores_gumbel_only(spark):
    rows = [(0, GOOD), (1, GOOD + " more"), (2, "")]
    out = {r["doc_id"]: r for r in lm.dsir_frame(_docs(spark, rows)).collect()}
    assert out[2]["logw_q"] == 0
    assert out[2]["score_q"] == out[2]["gumbel_q"]


def test_kn_hand_computed_tiny_corpus(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in lm.kn_nll_frame(docs).collect()}
    # model: cb(a,b)=2 cb(b,a)=1 cb(a,c)=1; ctx(a)=3 ctx(b)=1;
    # n1(a)=2 n1(b)=1; nb(a)=nb(b)=nb(c)=1; B=3
    def logq(num, den):
        return round(math.log(num) * 1e6) - round(math.log(den) * 1e6)

    q_ab = logq((4 * 2 - 3) * 3 + 3 * 2 * 1, 4 * 3 * 3)  # P(b|a)=21/36
    q_ba = logq((4 * 1 - 3) * 3 + 3 * 1 * 1, 4 * 1 * 3)  # P(a|b)=6/12
    q_ac = logq((4 * 1 - 3) * 3 + 3 * 2 * 1, 4 * 3 * 3)  # P(c|a)=9/36
    assert got[1].kn_nll_q == -(2 * q_ab + 1 * q_ba)
    assert got[1].n_bigrams == 3
    assert got[2].kn_nll_q == -q_ac
    assert got[2].n_bigrams == 1


def test_kn_probability_mass_at_most_one_per_context(spark):
    """Σ_{w2 seen} P_KN(w2|w1) <= 1 for every context — the smoothing
    reserves mass for unseen continuations, it never over-allocates."""
    import math

    docs = spark.createDataFrame(
        [
            (i, t)
            for i, t in enumerate(
                [
                    "the cat sat on the mat",
                    "the dog sat on the log",
                    "a cat and a dog and a bird",
                    "the bird sat on the cat",
                ]
            )
        ],
        "doc_id long, text string",
    )
    # reconstruct per-context seen-mass from the quantized scores: the
    # quantization error per bigram is < 2e-6, negligible vs the slack
    from blinkit_etl_pipeline_spark.functions.lm import kn_nll_frame  # noqa

    toks = [t.split() for _, t in sorted(
        [(r.doc_id, r.text) for r in docs.collect()])]
    from collections import Counter

    cb = Counter()
    for tk in toks:
        for i in range(len(tk) - 1):
            cb[(tk[i], tk[i + 1])] += 1
    ctx = Counter(); n1 = Counter(); nb = Counter()
    for (w1, w2), c in cb.items():
        ctx[w1] += c; n1[w1] += 1; nb[w2] += 1
    B = len(cb)
    for w1 in ctx:
        mass = sum(
            ((4 * cb[(a, b)] - 3) * B + 3 * n1[w1] * nb[b]) / (4 * ctx[w1] * B)
            for (a, b) in cb if a == w1
        )
        assert mass <= 1.0 + 1e-9, (w1, mass)
        # discount floor: a singleton context keeps (1-d)=1/4 plus its
        # continuation share, never less
        assert mass > 0.25 - 1e-9
