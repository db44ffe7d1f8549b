"""Statistical language-model scoring for corpus curation — the two
classic model-based quality filters real LLM data pipelines run on top
of the rule-based (Gopher) gates:

- :func:`nb_quality_frame` — a multinomial Naive Bayes quality
  classifier trained ON THE CORPUS ITSELF, with the rule-based
  ``gopher_pass`` verdict as weak supervision (the fastText-classifier
  shape of CCNet/RefinedWeb, distilled to closed-form counts so both
  engines derive the model exactly).
- :func:`bigram_nll_frame` — bigram language-model negative
  log-likelihood per document (the CCNet "LM perplexity" filter, with
  the LM trained on the corpus itself via add-one smoothing).

Float discipline (the HLL/BM25 precedent): every per-token/per-bigram
log term is quantized to int64 (``ROUND(ln(·)·10^6)``) BEFORE the
per-document summation, so document scores are exact integers — sums
are order-free and cross-engine bit-identical; ``ln`` ulp differences
are absorbed by the quantization except at measure-zero rounding
boundaries.

Scale shape (100 TB framing): one tokenize/explode pass (the same
O(corpus tokens) row count as every text pass here), hash aggregates
with map-side partials for the model counts, ONE equi-join from
occurrence rows to the (vocabulary-sized) model table, and one-row
broadcast frames for the corpus totals. No driver-side state beyond
nothing — even the priors stay in a broadcast one-row frame. Zero
UDFs; zero corpus-quadratic shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import gopher_columns, h32, tokens

#: log-term quantization scale — same granularity as the BM25 scorer
LOGQ_SCALE = 1000000.0


def nb_quality_frame(docs: DataFrame, text: str = "text") -> DataFrame:
    """Multinomial Naive Bayes quality score per document.

    Labels are the corpus's own rule-based ``gopher_pass`` verdicts
    (weak supervision — no hand labels at 100 TB); features are token
    counts. The model is closed-form: per-class token counts with
    add-one (Laplace) smoothing, so "training" is two hash aggregates
    — no iterative optimizer, and the DuckDB oracle derives the exact
    same model from the same corpus.

    Per token t: ``llr(t) = ln((c_pos(t)+1)/(T_pos+V))
    - ln((c_neg(t)+1)/(T_neg+V))``, quantized to int64. Per document:
    ``log_odds_q = prior_q + Σ tf(t)·llr_q(t)`` — an exact integer.
    ``nb_pass = log_odds_q > 0``. Documents with zero tokens score the
    prior alone.

    Returns (doc_id, gopher_pass, log_odds_q, nb_pass).
    """
    toked = docs.select(
        "doc_id",
        F.coalesce(
            tokens(F.col(text)), F.array().cast("array<string>")
        ).alias("__tk"),
        F.col(text).alias("__text"),
    )
    # lab has three consumers (occurrence explode, prior agg, final
    # label join) but is deliberately NOT persisted: measured at sf10
    # (500k docs), materializing corpus-wide token arrays costs ~3x
    # more than recomputing the map-side tokenize per branch (1.1 s
    # unpersisted vs 3.0 s persisted) — persist pays off for SHUFFLED
    # indexes (_resolve_idx), not for cheap map-side projections
    lab = toked.select(
        "doc_id",
        gopher_columns(F.col("__text"), F.col("__tk"))["gopher_pass"].alias(
            "pass"
        ),
        "__tk",
    )
    # (doc_id, pass, token, tf) in ONE pass — the label is functionally
    # dependent on the document, so no join is needed to attach it
    occ = (
        lab.select("doc_id", "pass", F.explode("__tk").alias("token"))
        .groupBy("doc_id", "pass", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    return nb_from_parts(lab.select("doc_id", "pass"), occ)


def nb_from_parts(lab: DataFrame, occ: DataFrame) -> DataFrame:
    """:func:`nb_quality_frame`'s model + scoring over PRE-BUILT
    parts: ``lab`` = (doc_id, pass) for every corpus doc, ``occ`` =
    (doc_id, pass, token, tf). The batch path tokenizes to build them;
    the release store path (operators/release.py) derives them from
    the maintained attribute + postings stores — token counts are the
    postings rows, labels live in the attributes store — so the NB
    gate rescores without touching text. Identical arithmetic either
    way (same ints in → same quantized model out). Composition of
    :func:`nb_model_from_parts` + :func:`nb_apply` (r13 — split so the
    release's drift-gated reads can PIN a model and score later drops
    against it without retraining)."""
    llr, prior = nb_model_from_parts(lab, occ)
    return nb_apply(lab, occ, llr, prior)


def nb_model_from_parts(
    lab: DataFrame, occ: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """The NB model's sufficient statistics from pre-built parts:
    ``(llr, prior)`` — llr = (token, llr_q) per-token quantized
    log-likelihood ratio, prior = one row (prior_q). Persistable
    (integer columns), so a release can pin the model at maintain
    time and later score new drops against it (bounded staleness —
    operators/release.py::release_read_drift_gated)."""
    tc = occ.groupBy("token").agg(
        F.sum(F.when(F.col("pass"), F.col("tf")).otherwise(0)).alias(
            "c_pos"
        ),
        F.sum(F.when(~F.col("pass"), F.col("tf")).otherwise(0)).alias(
            "c_neg"
        ),
    )
    tot = tc.agg(
        F.sum("c_pos").cast("double").alias("tp"),
        F.sum("c_neg").cast("double").alias("tn"),
        F.count("*").cast("double").alias("v"),
    )
    llr = tc.crossJoin(F.broadcast(tot)).select(
        "token",
        F.round(
            (
                F.log(
                    (F.col("c_pos") + F.lit(1.0)) / (F.col("tp") + F.col("v"))
                )
                - F.log(
                    (F.col("c_neg") + F.lit(1.0))
                    / (F.col("tn") + F.col("v"))
                )
            )
            * F.lit(LOGQ_SCALE),
            0,
        )
        .cast("long")
        .alias("llr_q"),
    )
    # Laplace-smoothed class prior (add-one on DOC counts, so a corpus
    # where one class is empty still yields a finite prior)
    prior = lab.agg(
        F.sum(F.when(F.col("pass"), 1).otherwise(0))
        .cast("double")
        .alias("np"),
        F.count("*").cast("double").alias("n"),
    ).select(
        F.round(
            (
                F.log((F.col("np") + F.lit(1.0)) / (F.col("n") + F.lit(2.0)))
                - F.log(
                    (F.col("n") - F.col("np") + F.lit(1.0))
                    / (F.col("n") + F.lit(2.0))
                )
            )
            * F.lit(LOGQ_SCALE),
            0,
        )
        .cast("long")
        .alias("prior_q")
    )
    return llr, prior


def nb_apply(
    lab: DataFrame, occ: DataFrame, llr: DataFrame, prior: DataFrame
) -> DataFrame:
    """Score docs against a (possibly pinned) NB model. Tokens absent
    from the model's vocabulary contribute ZERO evidence (the inner
    join skips them) — for a model trained on this same corpus that
    never happens; for a pinned model scoring a later drop it is the
    documented staleness contract."""
    # model lookup is an equi-join on token (vocabulary-sized right
    # side); the sum of int64 terms is exact and order-free
    sc = (
        occ.join(llr, "token")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("llr_q")).alias("s"))
    )
    return (
        lab.select("doc_id", "pass")
        .join(sc, "doc_id", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            F.col("pass").alias("gopher_pass"),
            (F.col("prior_q") + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("log_odds_q"),
            (
                (F.col("prior_q") + F.coalesce(F.col("s"), F.lit(0)))
                > F.lit(0)
            ).alias("nb_pass"),
        )
    )


def bigram_nll_frame(docs: DataFrame, text: str = "text") -> DataFrame:
    """Bigram-LM negative log-likelihood per document — the CCNet-style
    perplexity filter with the LM trained on the scored corpus itself.

    Model: ``P(w2|w1) = (c(w1,w2)+1) / (ctx(w1)+V)`` with add-one
    smoothing, where ``ctx(w1)`` counts bigram contexts (Σ over w2 of
    c(w1,w2)) and ``V`` is the corpus vocabulary size. Each bigram's
    ``ln P`` is int64-quantized; a document's ``nll_q`` is the exact
    integer ``-Σ tf·lnP_q``.

    ``flagged`` marks documents whose mean per-bigram NLL exceeds the
    corpus mean — the scale-safe form of "drop the worst-perplexity
    tail" (a global ntile would be a full sort at 100 TB; the mean
    threshold is one broadcast row). Documents with fewer than two
    tokens have no bigrams: nll_q = 0, never flagged.

    Returns (doc_id, n_bigrams, nll_q, avg_nll, flagged).
    """
    # toked is deliberately NOT persisted (see nb_quality_frame's lab
    # note: map-side tokenize recompute beats corpus-array caching)
    toked = docs.select(
        "doc_id",
        F.coalesce(
            tokens(F.col(text)), F.array().cast("array<string>")
        ).alias("__tk"),
    )
    # k-1 bigram structs per doc; sequence(1, 0) counts DOWN — guard
    bg = F.when(
        F.size("__tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__tk") - 1),
            lambda i: F.struct(
                F.element_at(F.col("__tk"), i).alias("w1"),
                F.element_at(F.col("__tk"), i + 1).alias("w2"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    # occ feeds the model counts (cb) AND the scoring join; cb feeds
    # ctx AND logp — Spark's ReusedExchange covers the shared shuffle,
    # and measured persists here were neutral-to-negative (see lab note)
    occ = (
        toked.select("doc_id", F.explode(bg).alias("b"))
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    vocab = (
        toked.select(F.explode("__tk").alias("t"))
        .agg(F.count_distinct("t").cast("double").alias("v"))
    )
    return nll_from_parts(toked.select("doc_id"), occ, vocab)


def nll_from_parts(
    doc_base: DataFrame, occ: DataFrame, vocab: DataFrame
) -> DataFrame:
    """:func:`bigram_nll_frame`'s model + scoring over PRE-BUILT
    parts: ``doc_base`` = (doc_id) for every corpus doc, ``occ`` =
    per-doc bigram counts (doc_id, w1, w2, tf), ``vocab`` = one row
    (v: double) counting distinct corpus tokens. The batch path
    tokenizes; the release store path (operators/release.py) derives
    occ from the bigram postings store and vocab from the unigram
    postings store — the perplexity gate rescores against the live
    corpus model with no text pass. Identical quantized arithmetic
    either way. Composition of :func:`lm_model_from_parts` +
    :func:`nll_apply` (r13 — the pinned-model split)."""
    return nll_apply(doc_base, occ, lm_model_from_parts(occ, vocab))


def lm_model_from_parts(occ: DataFrame, vocab: DataFrame) -> DataFrame:
    """The bigram LM's persistable model table: (w1, w2, logp_q) —
    add-one-smoothed quantized log-probabilities."""
    cb = occ.groupBy("w1", "w2").agg(F.sum("tf").alias("cb"))
    ctx = cb.groupBy("w1").agg(F.sum("cb").alias("ctx"))
    return (
        cb.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("cb") + F.lit(1.0)) / (F.col("ctx") + F.col("v"))
                )
                * F.lit(LOGQ_SCALE),
                0,
            )
            .cast("long")
            .alias("logp_q"),
        )
    )


def nll_apply(
    doc_base: DataFrame, occ: DataFrame, logp: DataFrame
) -> DataFrame:
    """Score docs against a (possibly pinned) bigram LM. Bigrams
    absent from the model drop from BOTH ``nll_q`` and ``n_bigrams``
    (the inner join) — exact for a model trained on this corpus; the
    documented staleness contract for a pinned model scoring a later
    drop."""
    per_doc = (
        occ.join(logp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            (-F.sum(F.col("tf") * F.col("logp_q"))).cast("long").alias(
                "nll_q"
            ),
        )
    )
    base = doc_base.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("nll_q", F.lit(0)).cast("long").alias("nll_q"),
    )
    # per-doc mean NLL, int64-quantized (exact-int inputs → the double
    # quotient is deterministic IEEE; quantization keeps the corpus
    # mean an exact integer sum)
    scored = base.withColumn(
        "avg_q",
        F.when(
            F.col("n_bigrams") > 0,
            F.round(
                F.col("nll_q").cast("double")
                / F.col("n_bigrams").cast("double"),
                0,
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    mean = scored.filter(F.col("n_bigrams") > 0).agg(
        (
            F.sum("avg_q").cast("double") / F.count("*").cast("double")
        ).alias("mean_avg_q")
    )
    return scored.crossJoin(F.broadcast(mean)).select(
        "doc_id",
        "n_bigrams",
        "nll_q",
        F.round(
            F.col("avg_q").cast("double") / F.lit(LOGQ_SCALE), 6
        ).alias("avg_nll"),
        (
            (F.col("n_bigrams") > 0)
            & (F.col("avg_q").cast("double") > F.col("mean_avg_q"))
        ).alias("flagged"),
    )


#: DSIR hashed-feature space size (the paper uses 10^4; 1024 keeps the
#: model table broadcast-small while leaving hash collisions realistic)
DSIR_BUCKETS = 1024

#: modulus for the hash-derived uniform behind the Gumbel perturbation
DSIR_UNIFORM_MOD = 1 << 20


def dsir_frame(
    docs: DataFrame, text: str = "text", n_buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023) over hashed n-gram features.

    The pretraining-data selector real LLM pipelines run when they
    want raw-web data that LOOKS like a target corpus: fit two
    bag-of-hashed-ngrams unigram models — target ``p`` (here: the
    corpus's own Gopher-pass documents, the same weak supervision as
    :func:`nb_quality_frame`) and raw ``q`` (the whole corpus) — and
    weight each document by its log importance ratio
    ``log w(x) = Σ_b c_b(x) · (ln p̂_b − ln q̂_b)`` where ``c_b`` counts
    the document's unigrams+bigrams hashed into ``n_buckets`` buckets
    (add-one smoothing on both models).

    Resampling is Gumbel-top-k with HASH-DERIVED noise so both engines
    draw the same "randomness": ``u = (h32(doc_id||':dsir') mod M
    + 0.5)/M``, ``g = -ln(-ln(u))``. Every log term (model ratios and
    Gumbel) is int64-quantized before summation, so scores are exact
    integers. ``selected`` marks scores above the corpus mean (one
    broadcast row — the scale-safe half-corpus cut; a deployment
    wanting exactly N survivors ranks ``score_q`` with
    TakeOrderedAndProject, bounded by N).

    Scale shape: one tokenize/explode pass, two hash aggregates, ONE
    broadcast join from occurrence rows to the ``n_buckets``-row model
    table (the feature hashing bounds the model regardless of corpus
    vocabulary — that is the trick's point at 100 TB), one-row
    broadcast totals. Zero UDFs, zero corpus-quadratic shapes.

    Returns (doc_id, target, logw_q, gumbel_q, score_q, selected).
    """
    toked = docs.select(
        "doc_id",
        F.coalesce(
            tokens(F.col(text)), F.array().cast("array<string>")
        ).alias("__tk"),
        F.col(text).alias("__text"),
    )
    lab = toked.select(
        "doc_id",
        gopher_columns(F.col("__text"), F.col("__tk"))["gopher_pass"].alias(
            "target"
        ),
        "__tk",
    )
    bigrams = F.when(
        F.size("__tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__tk") - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("__tk"), i),
                F.element_at(F.col("__tk"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = lab.select(
        "doc_id",
        "target",
        F.explode(F.concat(F.col("__tk"), bigrams)).alias("g"),
    ).select(
        "doc_id", "target", (h32(F.col("g")) % n_buckets).alias("bucket")
    )
    occ = grams.groupBy("doc_id", "target", "bucket").agg(
        F.count("*").cast("long").alias("tf")
    )
    model = occ.groupBy("bucket").agg(
        F.sum(F.when(F.col("target"), F.col("tf")).otherwise(0)).alias("c_t"),
        F.sum("tf").alias("c_r"),
    )
    tot = model.agg(
        F.sum("c_t").cast("double").alias("tt"),
        F.sum("c_r").cast("double").alias("tr"),
    )
    lam = model.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            (
                F.log(
                    (F.col("c_t") + F.lit(1.0))
                    / (F.col("tt") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("c_r") + F.lit(1.0))
                    / (F.col("tr") + F.lit(float(n_buckets)))
                )
            )
            * F.lit(LOGQ_SCALE),
            0,
        )
        .cast("long")
        .alias("lam_q"),
    )
    logw = (
        occ.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("lam_q")).alias("logw_q"))
    )
    u = (
        (
            h32(F.concat(F.col("doc_id").cast("string"), F.lit(":dsir")))
            % F.lit(DSIR_UNIFORM_MOD)
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(DSIR_UNIFORM_MOD))
    scored = (
        lab.select("doc_id", "target")
        .join(logw, "doc_id", "left")
        .select(
            "doc_id",
            "target",
            F.coalesce("logw_q", F.lit(0)).cast("long").alias("logw_q"),
            F.round(-F.log(-F.log(u)) * F.lit(LOGQ_SCALE), 0)
            .cast("long")
            .alias("gumbel_q"),
        )
        .withColumn(
            "score_q",
            (F.col("logw_q") + F.col("gumbel_q")).cast("long"),
        )
    )
    mean = scored.agg(
        (
            F.sum("score_q").cast("double") / F.count("*").cast("double")
        ).alias("mean_score")
    )
    return scored.crossJoin(F.broadcast(mean)).select(
        "doc_id",
        "target",
        "logw_q",
        "gumbel_q",
        "score_q",
        (F.col("score_q").cast("double") > F.col("mean_score")).alias(
            "selected"
        ),
    )


def kn_nll_frame(docs: DataFrame, text: str = "text") -> DataFrame:
    """Interpolated Kneser-Ney bigram NLL per document — the smoothing
    KenLM actually ships (what real perplexity-filter pipelines run),
    upgrading :func:`bigram_nll_frame`'s add-one model.

    With absolute discount ``d = 3/4`` and every scored bigram seen in
    training (the model is trained on the scored corpus itself, so
    ``c(w1,w2) >= 1`` — no zero-count branch):

    ``P(w2|w1) = (c - d)/ctx(w1) + d·N1+(w1·)/ctx(w1) · Pcont(w2)``,
    ``Pcont(w2) = N1+(·w2)/B`` (fraction of bigram TYPES ending in w2).

    Over common denominator ``4·ctx·B`` the probability is the exact
    integer ratio ``((4c-3)·B + 3·n1(w1)·nb(w2)) / (4·ctx·B)``, so
    ``lnP`` is quantized as ``ROUND(ln(num)·10^6) - ROUND(ln(den)·10^6)``
    — both engines take ``ln`` of the same exact integers and
    per-document sums are exact int64. The num/den products are
    computed in DECIMAL(38,0) (oracle: HUGEINT), because at web scale
    ``(4c-3)·B`` exceeds int64 (c·B ≈ 1e12·1e10) and non-ANSI integer
    arithmetic would silently wrap. Above 2^53 the integer→double
    conversion before ``ln`` rounds, identically in both engines
    (round-to-nearest), so cross-engine equality survives; exactness
    of the *ratio itself* is only claimed below 2^53.

    Model tables: the bigram-type frame ``cb`` plus three projections
    of it (ctx, n1 by w1 — one aggregate; nb by w2; B one row). Same
    scale shape as the add-one model: one explode pass, hash
    aggregates, one model equi-join; zero UDFs.

    Returns (doc_id, n_bigrams, kn_nll_q, avg_kn_nll, flagged).
    """
    toked = docs.select(
        "doc_id",
        F.coalesce(
            tokens(F.col(text)), F.array().cast("array<string>")
        ).alias("__tk"),
    )
    bg = F.when(
        F.size("__tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__tk") - 1),
            lambda i: F.struct(
                F.element_at(F.col("__tk"), i).alias("w1"),
                F.element_at(F.col("__tk"), i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    occ = (
        toked.select("doc_id", F.explode(bg).alias("b"))
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    cb = occ.groupBy("w1", "w2").agg(F.sum("tf").alias("cb"))
    # ctx and n1 fold in ONE aggregate (same key), nb in a second
    byw1 = cb.groupBy("w1").agg(
        F.sum("cb").alias("ctx"), F.count("*").cast("long").alias("n1")
    )
    nb = cb.groupBy("w2").agg(F.count("*").cast("long").alias("nb"))
    btot = cb.agg(F.count("*").cast("long").alias("btypes"))
    logp = (
        cb.join(byw1, "w1")
        .join(nb, "w2")
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            (
                F.round(
                    F.log(
                        (
                            (
                                F.lit(4)
                                * F.col("cb").cast("decimal(38,0)")
                                - F.lit(3)
                            )
                            * F.col("btypes")
                            + F.lit(3)
                            * F.col("n1").cast("decimal(38,0)")
                            * F.col("nb")
                        ).cast("double")
                    )
                    * F.lit(LOGQ_SCALE),
                    0,
                ).cast("long")
                - F.round(
                    F.log(
                        (
                            F.lit(4)
                            * F.col("ctx").cast("decimal(38,0)")
                            * F.col("btypes")
                        ).cast("double")
                    )
                    * F.lit(LOGQ_SCALE),
                    0,
                ).cast("long")
            ).alias("logp_q"),
        )
    )
    per_doc = (
        occ.join(logp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            (-F.sum(F.col("tf") * F.col("logp_q"))).cast("long").alias(
                "kn_nll_q"
            ),
        )
    )
    base = toked.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("kn_nll_q", F.lit(0)).cast("long").alias("kn_nll_q"),
    )
    scored = base.withColumn(
        "avg_q",
        F.when(
            F.col("n_bigrams") > 0,
            F.round(
                F.col("kn_nll_q").cast("double")
                / F.col("n_bigrams").cast("double"),
                0,
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    mean = scored.filter(F.col("n_bigrams") > 0).agg(
        (
            F.sum("avg_q").cast("double") / F.count("*").cast("double")
        ).alias("mean_avg_q")
    )
    return scored.crossJoin(F.broadcast(mean)).select(
        "doc_id",
        "n_bigrams",
        "kn_nll_q",
        F.round(
            F.col("avg_q").cast("double") / F.lit(LOGQ_SCALE), 6
        ).alias("avg_kn_nll"),
        (
            (F.col("n_bigrams") > 0)
            & (F.col("avg_q").cast("double") > F.col("mean_avg_q"))
        ).alias("flagged"),
    )
