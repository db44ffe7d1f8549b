"""Text-analysis column builders (north-star surface, BASELINE.json).

Everything here is **pure Catalyst expressions** — no UDFs — so the hot
path stays inside whole-stage codegen and scales linearly with
executors. The only nontrivial primitive is a cross-engine string→int
hash shared with the DuckDB oracle:

    h32(s) = int(md5(s)[:8], 16)            # 32-bit, engine-agnostic

Spark spells it ``conv(substr(md5(s),1,8),16,10)``; DuckDB spells it
``('0x' || substr(md5(s),1,8))::BIGINT``. Both were verified to agree
bit-for-bit. All derived hashes (MinHash, SimHash, fingerprints) are
integer arithmetic on h32 — deterministic and oracle-checkable, unlike
Spark's engine-private ``xxhash64``/``hash``.

Tokenization contract: documents.text is single-space-separated lowercase
tokens (driver testdata); ``tokens()`` splits on runs of whitespace and
drops empties so the same contract holds for messier input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Real corpora discriminate on these; the synthetic testdata
# shares one vocabulary across langs, which the heuristic then (correctly)
# scores as English-like — the *mechanism* is what the oracle verifies.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of"),
    "fr": ("le", "la", "les", "de", "et"),
    "de": ("der", "die", "das", "und", "ein"),
    "es": ("el", "los", "las", "y", "que"),
}
CJK_PATTERN = "[\\u4e00-\\u9fff]"

STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "it")

FINGERPRINT_MOD = 1_000_003  # prime; keeps h32 products within BIGINT


def h32(col: Column | str) -> Column:
    """Cross-engine 32-bit string hash (md5-prefix). See module doc."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h48(col: Column | str) -> Column:
    """Cross-engine 48-bit string hash (md5-prefix, 12 hex chars):
    wide enough for order-statistic estimators (KMV sketches) and
    hash-derived uniforms (DP Laplace draws). DuckDB mirror:
    ``('0x' || substr(md5(x), 1, 12))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("long")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, empties dropped (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda t: t != F.lit(""))


def shingles(toks: Column, n: int) -> Column:
    """Word n-gram shingles of a token array (array<string>).

    ``transform(sequence(1, size-n+1), i -> concat_ws(' ', slice(toks, i, n)))``
    — empty array when the document has fewer than ``n`` tokens (guarded:
    Spark's ``sequence(1, 0)`` counts *down*, it is not empty).
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def count_in(toks: Column, vocab: tuple[str, ...]) -> Column:
    """Number of tokens that belong to ``vocab`` (bigint)."""
    return F.size(F.filter(toks, lambda t: t.isin(*vocab))).cast("bigint")


def quality_columns(text: Column, toks: Column) -> dict[str, Column]:
    """Quality-scoring measures (length/punct/stopword ratios).

    Ratios are ROUNDed to 6 at the edge — the oracle computes the same
    integer numerators/denominators, so rounding only normalizes the
    final IEEE division.
    """
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length(text).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = count_in(toks, STOPWORDS)
    n_alnum = F.length(F.regexp_replace(text, "[^a-z0-9]", "")).cast("bigint")
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_distinct_tokens": n_distinct,
        "distinct_ratio": F.round(n_distinct / safe_tokens, 6),
        "stopword_ratio": F.round(n_stop / safe_tokens, 6),
        "alnum_ratio": F.round(n_alnum / F.greatest(n_chars, F.lit(1)), 6),
        "avg_token_len": F.round(
            (n_chars - (n_tokens - 1)) / safe_tokens, 6
        ),  # chars minus separators
        "quality_score": F.round(
            F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
            + (n_distinct / safe_tokens) * 0.5,
            6,
        ),
    }


def langid_columns(text: Column, toks: Column) -> dict[str, Column]:
    """Language-ID heuristic: marker-stopword scores + CJK charset check.

    Predicted language = argmax marker count with a fixed priority
    (en > fr > de > es) on ties; any CJK character forces ``zh``.
    """
    scores = {lang: count_in(toks, m) for lang, m in LANG_MARKERS.items()}
    has_cjk = F.regexp_count(text, F.lit(CJK_PATTERN)) > 0
    best = F.greatest(*scores.values())
    pred = (
        F.when(has_cjk, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(scores["en"] == best, F.lit("en"))
        .when(scores["fr"] == best, F.lit("fr"))
        .when(scores["de"] == best, F.lit("de"))
        .otherwise(F.lit("es"))
    )
    out = {f"score_{lang}": c for lang, c in scores.items()}
    out["predicted_lang"] = pred
    return out


def fingerprint(toks: Column) -> Column:
    """Position-weighted rolling document fingerprint (bigint).

    ``Σ_p (h32(tok_p) % 1000003) · (((p-1) % 64) + 1)`` — order-sensitive
    (unlike a bag-of-words xor) yet overflow-free: each term < 2^46 and
    documents are ≤ a few thousand tokens.
    """
    idx = F.sequence(F.lit(1), F.size(toks))
    terms = F.transform(
        idx,
        lambda p: (h32(F.element_at(toks, p)) % FINGERPRINT_MOD)
        * (((p - F.lit(1)) % 64) + 1),
    )
    folded = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return F.when(F.size(toks) > 0, folded).otherwise(F.lit(0).cast("long"))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-flavored token estimate: word-piece regex split.

    Splits on word boundaries AND intra-word transitions (letter↔digit),
    then adds ceil(len/8) pieces per long word — a deterministic stand-in
    for subword tokenizers, computable without any vocab file.
    """
    words = tokens(text)
    pieces = F.transform(
        words,
        lambda w: F.ceil(F.length(w) / F.lit(8.0)).cast("long"),
    )
    return F.aggregate(pieces, F.lit(0).cast("long"), lambda a, x: a + x) + F.size(
        F.filter(words, lambda w: F.regexp_count(w, F.lit("[0-9]")) > 0)
    ).cast("long")


# ----------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters)
# ----------------------------------------------------------------------


def _longest_equal_run(sorted_toks: Column) -> Column:
    """Max token frequency = longest equal-run over the sorted array,
    one ``aggregate`` pass (O(n log n) per row, single lambda)."""
    run_state = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("int").alias("run"),
            F.lit(0).cast("int").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return run_state["best"].cast("bigint")


def chunk_frame(
    docs,
    size: int,
    overlap: int = 0,
    text: str = "text",
    keep: Sequence[str] = ("lang",),
):
    """Token-window chunking (training-sample / RAG-passage prep),
    fully map-side: zero shuffle, zero UDF, one scan at any scale.

    Chunk ``c`` of a document covers tokens ``[c·stride, c·stride +
    size)`` with ``stride = size − overlap``; the last chunk may be
    short, and a trailing window that would start at-or-past the end is
    never emitted (``n_chunks = 1 + ceil((n − size)/stride)``, floored
    at 1; empty/NULL documents emit NO rows — they carry no trainable
    tokens). Built as ``explode(sequence)`` over a staged token array,
    so the token split happens once per document, not once per chunk.

    Returns (doc_id, *keep, chunk_id, n_chunks, start_tok, chunk_len,
    chunk_text, chunk_hash) — ``chunk_hash`` is the cross-engine
    :func:`h32` of the chunk text, ready for chunk-level exact dedup
    downstream.
    """
    if size <= 0:
        raise ValueError("size must be positive")
    if not 0 <= overlap < size:
        raise ValueError("overlap must satisfy 0 <= overlap < size")
    stride = size - overlap
    toked = docs.select(
        "doc_id", *keep, tokens(F.col(text)).alias("__tk")
    ).filter(F.size("__tk") > 0)
    n = F.size("__tk").cast("bigint")
    # per-document counts are bounded far below 2^53: double-div ceil
    # is exact here (unlike pack.py's CUMULATIVE positions)
    n_chunks = (
        F.lit(1)
        + F.greatest(
            F.lit(0).cast("bigint"),
            F.ceil((n - size) / F.lit(stride).cast("double")).cast("bigint"),
        )
    ).cast("int")
    staged = toked.select(
        "doc_id",
        *keep,
        F.col("__tk"),
        n_chunks.alias("n_chunks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    # staged projections (see repetition_frame): the slice and the
    # joined text are each multi-referenced — land them in their own
    # Project so they evaluate once per chunk
    sliced = staged.select(
        "doc_id",
        *keep,
        "chunk_id",
        "n_chunks",
        F.slice(F.col("__tk"), F.col("chunk_id") * stride + 1, size).alias(
            "__ck"
        ),
    )
    texted = sliced.select(
        "doc_id",
        *keep,
        "chunk_id",
        "n_chunks",
        (F.col("chunk_id").cast("bigint") * stride).alias("start_tok"),
        F.size("__ck").cast("int").alias("chunk_len"),
        F.array_join(F.col("__ck"), " ").alias("chunk_text"),
    )
    return texted.withColumn("chunk_hash", h32(F.col("chunk_text")))


def bm25_frame(
    docs,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
    text: str = "text",
):
    """Okapi BM25 retrieval scoring of every document against a fixed
    term set (Robertson/Spärck Jones idf in the Lucene ``ln(1 + (N−df
    +0.5)/(df+0.5))`` spelling) — corpus-quality ranking / seed-set
    retrieval for targeted curation.

    Plan shape: one scan computes per-doc term frequencies map-side
    (staged token array, one ``size(filter(...))`` per term); a single
    partial aggregate reduces to ONE stats row (N, avgdl, per-term df)
    that broadcast-attaches back; scoring is pure arithmetic; the
    top-k plans as ``TakeOrderedAndProject``. Zero UDFs; the only
    exchanges are the scalar-stats agg and the final top-k — neither
    grows with the corpus.

    Float discipline: the score chain is written in the exact
    operation order the DuckDB oracle uses, and ``ln`` is the one
    transcendental (precedent: the HLL estimator) — ROUND(…, 6) before
    ranking keeps 1-ulp libm differences out of both the values and
    the order (ties break on doc_id).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    # NULL text normalizes to an empty token array (dl=0, tf=0) — the
    # unguarded spelling would flow legacy size(NULL) = -1 into avgdl
    # and the tf numerators, silently skewing every score
    toked = docs.select(
        "doc_id",
        F.coalesce(
            tokens(F.col(text)), F.array().cast("array<string>")
        ).alias("__tk"),
    )

    def _eq(term: str):
        # NB: a default-arg lambda would have arity 2, which F.filter
        # interprets as the (element, index) form — close over instead
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(F.col("__tk"), _eq(t)))
        .cast("double")
        .alias(f"__tf_{i}")
        for i, t in enumerate(terms)
    ]
    tfd = toked.select(
        "doc_id", F.size("__tk").cast("double").alias("dl"), *tf_cols
    )
    stats = tfd.agg(
        F.count("*").cast("double").alias("N"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = tfd.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"__tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("N") - F.col(f"__df_{i}") + F.lit(0.5))
            / (F.col(f"__df_{i}") + F.lit(0.5))
        )
        part = (
            idf
            * (tf * F.lit(k1 + 1.0))
            / (
                tf
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            )
        )
        score = part if score is None else score + part
    scored = joined.select("doc_id", F.round(score, 6).alias("bm25"))
    return scored.orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    ).limit(topk)


def repetition_frame(docs, text: str = "text", keep: Sequence[str] = ("lang",)):
    """Within-document repetition signals, fully map-side (zero shuffle).

    The standard web-scale quality filters (Gopher/RefinedWeb lineage)
    reject documents dominated by repeated n-grams:

    - ``dup_bigram_frac`` / ``dup_trigram_frac``: fraction of word
      n-grams that are repeats of an earlier n-gram in the same doc
      (``1 − distinct/total``).
    - ``top_word_frac``: share of the most frequent token
      (:func:`_longest_equal_run` over the sorted array).

    Built as STAGED projections — tokens, then each n-gram array, land
    in their own named column before anything reads them. Interpreted
    higher-order expressions re-evaluate every reference, and Catalyst's
    CollapseProject keeps multi-referenced non-cheap aliases staged, so
    this shape computes each array exactly once (measured 3.7× faster
    than the single-select spelling at sf0.1, which re-evaluated each
    shingle array ~3×). Still one scan, zero shuffle, at any scale.

    Ratios ROUNDed to 6 (oracle float discipline).
    """
    toked = docs.select("doc_id", *keep, tokens(F.col(text)).alias("__tk"))
    tk = F.col("__tk")
    arrays = toked.select(
        "doc_id",
        *keep,
        F.size(tk).cast("bigint").alias("n_tokens"),
        _longest_equal_run(F.array_sort(tk)).alias("__top"),
        shingles(tk, 2).alias("__g2"),
        shingles(tk, 3).alias("__g3"),
    )

    def dup_frac(g: str) -> Column:
        total = F.size(g).cast("bigint")
        return F.when(
            total > 0,
            F.round(
                (total - F.size(F.array_distinct(g)).cast("bigint"))
                / total.cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0))

    n = F.col("n_tokens")
    return arrays.select(
        "doc_id",
        *keep,
        "n_tokens",
        F.when(
            n > 0,
            F.round(F.col("__top") / F.greatest(n, F.lit(1)).cast("double"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("top_word_frac"),
        dup_frac("__g2").alias("dup_bigram_frac"),
        dup_frac("__g3").alias("dup_trigram_frac"),
    )


# ----------------------------------------------------------------------
# PII scrubbing
# ----------------------------------------------------------------------

#: Deliberately conservative patterns valid in BOTH Java regex (Spark)
#: and RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\+[0-9]{7,15}", "<PHONE>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def scrub_pii(text: Column) -> Column:
    """Mask emails, E.164-style phone numbers, and IPv4 addresses.

    Pure ``regexp_replace`` chain — order matters (emails first, so the
    digits inside a masked email can't later half-match the phone
    pattern). JVM-side, codegen-friendly, linear in text length.
    """
    out = text
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_redaction_count(text: Column) -> Column:
    """How many PII spans :func:`scrub_pii` would mask (bigint)."""
    count = F.lit(0).cast("bigint")
    scrubbed = text
    for pattern, _ in PII_PATTERNS:
        count = count + F.regexp_count(scrubbed, F.lit(pattern)).cast("bigint")
        # count on the progressively-scrubbed text, mirroring scrub_pii's
        # chain, so overlapping patterns are not double-counted
        scrubbed = F.regexp_replace(scrubbed, pattern, "<X>")
    return count


# ----------------------------------------------------------------------
# Gopher-style quality rules
# ----------------------------------------------------------------------

#: Rule thresholds after Rae et al. 2021 ("Scaling Language Models",
#: Gopher, Appendix A quality heuristics), expressed as exact rational
#: bounds so both engines compare INTEGERS (cross-multiplied), never
#: floats: word count ∈ [50, 100000], mean word length ∈ [3, 10],
#: symbol-to-word ≤ 1/10, bullet-line ≤ 9/10, ellipsis-line ≤ 3/10,
#: alpha-word ≥ 4/5, ≥ 2 distinct required stopwords present.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3
GOPHER_MAX_MEAN_WORD_LEN = 10
#: The paper requires ≥2 distinct words from a small English
#: function-word list ("the", "be", "to", "of", …). We keep the rule
#: but draw the list from this module's STOPWORDS so the gate is
#: non-degenerate on any corpus these operators already score —
#: swapping the tuple back to the paper's list is a one-line change.
GOPHER_REQUIRED_STOPWORDS = STOPWORDS
GOPHER_MIN_REQUIRED_STOPWORDS = 2

#: symbols counted by the symbol-to-word rule ('#', '…', '...')
_SYMBOL_PATTERN = r"#|\.\.\.|…"
_BULLET_PATTERN = r"^\s*[-*•]"
_ELLIPSIS_END_PATTERN = r"(\.\.\.|…)\s*$"
_ALPHA_PATTERN = r"[a-zA-Z]"


def gopher_columns(text: Column, toks: Column) -> dict[str, Column]:
    """Gopher-style document quality rules as pure Catalyst columns.

    Returns the measured ratios (ROUNDed to 6 at the edge for display)
    plus one boolean per rule and the conjunction ``gopher_pass``.
    Every rule compares integers (cross-multiplied rational bounds), so
    the booleans are bit-identical across Spark and the DuckDB oracle —
    no float-threshold edge cases.

    Line-based rules split on ``\\n``; a single-line document has one
    line, so bullet/ellipsis rules degrade gracefully.
    """
    n_words = F.size(toks).cast("bigint")
    safe_words = F.greatest(n_words, F.lit(1))
    sum_word_len = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n_symbols = F.regexp_count(text, F.lit(_SYMBOL_PATTERN)).cast("bigint")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("bigint")
    n_bullet = F.size(
        F.filter(lines, lambda l: l.rlike(_BULLET_PATTERN))
    ).cast("bigint")
    n_ellipsis = F.size(
        F.filter(lines, lambda l: l.rlike(_ELLIPSIS_END_PATTERN))
    ).cast("bigint")
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike(_ALPHA_PATTERN))
    ).cast("bigint")
    n_req_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS]),
            lambda s: F.array_contains(toks, s),
        )
    ).cast("bigint")

    r_word_count = (n_words >= GOPHER_MIN_WORDS) & (
        n_words <= GOPHER_MAX_WORDS
    )
    # 3 ≤ sum/n ≤ 10  ⇔  3n ≤ sum AND sum ≤ 10n (integers)
    r_mean_word_len = (
        sum_word_len >= GOPHER_MIN_MEAN_WORD_LEN * n_words
    ) & (sum_word_len <= GOPHER_MAX_MEAN_WORD_LEN * n_words)
    r_symbol_ratio = n_symbols * 10 <= n_words  # ≤ 1/10
    r_bullet_lines = n_bullet * 10 <= n_lines * 9  # ≤ 9/10
    r_ellipsis_lines = n_ellipsis * 10 <= n_lines * 3  # ≤ 3/10
    r_alpha_words = n_alpha * 5 >= n_words * 4  # ≥ 4/5
    r_stopwords = n_req_stop >= GOPHER_MIN_REQUIRED_STOPWORDS

    gopher_pass = (
        r_word_count
        & r_mean_word_len
        & r_symbol_ratio
        & r_bullet_lines
        & r_ellipsis_lines
        & r_alpha_words
        & r_stopwords
    )
    return {
        "n_words": n_words,
        "mean_word_len": F.round(sum_word_len / safe_words, 6),
        "symbol_word_ratio": F.round(n_symbols / safe_words, 6),
        "bullet_line_frac": F.round(n_bullet / n_lines, 6),
        "ellipsis_line_frac": F.round(n_ellipsis / n_lines, 6),
        "alpha_word_frac": F.round(n_alpha / safe_words, 6),
        "n_required_stopwords": n_req_stop,
        "r_word_count": r_word_count,
        "r_mean_word_len": r_mean_word_len,
        "r_symbol_ratio": r_symbol_ratio,
        "r_bullet_lines": r_bullet_lines,
        "r_ellipsis_lines": r_ellipsis_lines,
        "r_alpha_words": r_alpha_words,
        "r_stopwords": r_stopwords,
        "gopher_pass": gopher_pass,
    }


def bm25_bydoc_topk(
    docs,
    query_ids: Sequence[int],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
    text: str = "text",
):
    """BM25 more-like-this retrieval: each QUERY DOCUMENT's distinct
    tokens form the query, scored against the corpus through an
    inverted-index probe — the generalization of :func:`bm25_frame`
    (fixed literal terms) to data-dependent queries, and the standard
    "find documents like this one" primitive for seed-set curation.

    Implemented as one tokenize pass into index rows
    (:func:`postings_frame`) piped through the store-side scorer
    (:func:`bm25_store_topk`) — a single scoring implementation serves
    both the ad-hoc and the persisted-index paths, and their equality
    is structural rather than asserted. Scale shape and float
    discipline live on the scorer: inverted probe (only
    vocabulary-sharing documents scored), one broadcast stats row,
    per-term parts quantized to int64 BEFORE the order-free exact sum,
    ties → lowest doc_id, query doc excluded.

    Returns (query_id, doc_id, bm25, rank).
    """
    return bm25_store_topk(
        postings_frame(docs, text=text), query_ids, k1=k1, b=b, topk=topk
    )


def postings_frame(docs, text: str = "text"):
    """(doc_id, token, tf, dl) — the BM25 index rows for a doc batch,
    one tokenize scan. Every document ALSO emits one sentinel row
    (``token IS NULL, tf = 0``) carrying its length, so empty documents
    — which still count toward N and avgdl — survive in a postings-only
    store and the store replays :func:`bm25_bydoc_topk` exactly."""
    toked = docs.select(
        "doc_id",
        F.coalesce(
            tokens(F.col(text)), F.array().cast("array<string>")
        ).alias("__tk"),
    )
    post = (
        toked.select(
            "doc_id",
            F.size("__tk").cast("long").alias("dl"),
            F.explode("__tk").alias("token"),
        )
        .groupBy("doc_id", "dl", "token")
        .agg(F.count("*").cast("long").alias("tf"))
        .select("doc_id", "token", "tf", "dl")
    )
    sentinel = toked.select(
        "doc_id",
        F.lit(None).cast("string").alias("token"),
        F.lit(0).cast("long").alias("tf"),
        F.size("__tk").cast("long").alias("dl"),
    )
    return post.unionByName(sentinel)


def bm25_store_topk(
    postings,
    query_ids: Sequence[int],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
    stats=None,
):
    """BM25 more-like-this answered from a PERSISTED postings store
    (:func:`postings_frame` rows) — the lexical twin of the PQ code
    store: history is touched as (token, tf) integers, never document
    text, so retrieval cost tracks the index, not the corpus bytes.
    Identical arithmetic and tie-breaks to :func:`bm25_bydoc_topk`
    (int64-quantized term parts, exact integer stats), so a store
    covering the same corpus returns identical rows.

    The candidate's ``dl`` is read off the posting row itself (every
    :func:`postings_frame` row carries it), so the probe never joins
    the per-doc sentinel range; sentinels feed only the corpus stats.
    ``stats`` — when given — is a one-row (N, avgdl) frame replacing
    the sentinel-derived default: the pruned-store path derives it from
    materialized per-batch partials so the probe touches ZERO
    corpus-linear rows (exact-equal: dl/N sums are integer-valued
    doubles, order-free below 2^53)."""
    qids = [int(i) for i in query_ids]
    tf = postings.filter(F.col("token").isNotNull()).select(
        "doc_id",
        "token",
        F.col("tf").cast("double").alias("tf"),
        F.col("dl").cast("double").alias("dl"),
    )
    if stats is None:
        dls = postings.filter(
            F.col("token").isNull() & F.col("doc_id").isNotNull()
        ).select("doc_id", F.col("dl").cast("double").alias("dl"))
        stats = dls.agg(
            F.count("*").cast("double").alias("N"),
            F.avg("dl").alias("avgdl"),
        )
    dfreq = tf.groupBy("token").agg(
        F.count("*").cast("double").alias("df")
    )
    qterms = tf.filter(F.col("doc_id").isin(qids)).select(
        F.col("doc_id").alias("query_id"), "token"
    )
    probe = (
        qterms.join(tf, "token")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dfreq, "token")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("N") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    part = (
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        probe.select(
            "query_id",
            "doc_id",
            F.round(part * F.lit(1000000.0), 0).cast("long").alias("part_q"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("part_q").alias("bm25_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_q").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "doc_id",
            (F.col("bm25_q").cast("double") / F.lit(1000000.0)).alias("bm25"),
            "rank",
        )
    )


def hashed_embedding_entries(
    docs, dim: int = 64, text: str = "text"
):
    """Sparse feature-hashed document embeddings — the "hashing trick"
    (Weinberger et al. 2009, Vowpal Wabbit's representation): every
    token maps to ``idx = h32(token:hdim) mod dim`` with a sign from an
    independent hash bit, and a document's embedding is the signed sum
    of its term frequencies per index. A MODEL-FREE dense proxy that
    bridges the text corpus to the vector stack (cosine ANN, SemDeDup,
    clustering) when no learned embeddings exist — the classic
    bootstrap for curation pipelines.

    Returned SPARSE, as (doc_id, idx, val) integer entries (zero-sum
    indexes dropped): sparse is the scale-correct shape — similarity
    joins probe the inverted dimension index instead of materializing
    dense arrays, and every value is an exact integer (signed tf sums),
    so dot products and norms are cross-engine bit-exact with no
    quantization step at all.

    One tokenize pass + one hash aggregate; both hashes are the
    cross-engine md5-prefix ``h32``.
    """
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.coalesce(
                    tokens(F.col(text)), F.array().cast("array<string>")
                )
            ).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    idx = h32(F.concat(F.col("token"), F.lit(":hdim"))) % F.lit(dim)
    sign = F.when(
        h32(F.concat(F.col("token"), F.lit(":hsign"))) % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        tf.select(
            "doc_id",
            idx.cast("int").alias("idx"),
            (sign * F.col("tf")).cast("long").alias("sv"),
        )
        .groupBy("doc_id", "idx")
        .agg(F.sum("sv").cast("long").alias("val"))
        .filter(F.col("val") != 0)
    )


def _lnq(col: Column) -> Column:
    """ln(x) quantized to the 1e-6 integer lattice — the cross-engine
    spelling for log-scores (functions/lm.py discipline): quantize
    each ln BEFORE any arithmetic, so scores are exact int64 and both
    engines rank identically (no sum-order ulps, no rounding ties)."""
    return F.round(F.log(col) * F.lit(1e6), 0).cast("long")


def tfidf_keywords(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the classic corpus
    summarizer/feature extractor. tf is the in-doc count; idf is
    quantized ``lnq(N) − lnq(df)`` (defined ON the lattice, so the
    score ``tf · idf_q`` is an exact integer both engines agree on).

    Plan shape: one explode + (doc_id, token) partial-aggregated
    groupBy for tf; df folds from the tf table (token-keyed partials,
    never documents); N rides as a one-row broadcast. The per-doc
    top-k is ``row_number() <= k`` — WindowGroupLimit, map-side
    partial top-k, O(k·docs) shuffle rows. Ties break on token asc
    (total order, deterministic).

    Output: (doc_id, token, tf, score_q).
    """
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    nd = docs.agg(F.count("*").cast("long").alias("__n"))
    return _tfidf_score(tf, nd, k)


def _tfidf_score(tf: DataFrame, nd: DataFrame, k: int) -> DataFrame:
    """TF-IDF scoring + per-doc top-k over pre-counted (doc_id, token,
    tf) rows and a one-row doc count ``nd(__n)`` — shared by the batch
    :func:`tfidf_keywords` and the store read
    (:func:`keywords_from_store`), so the lattice arithmetic and
    tie-break can never de-synchronize the twins (the
    :func:`pmi_score` factoring, applied here too)."""
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            "tf",
            (
                F.col("tf") * (_lnq(F.col("__n")) - _lnq(F.col("df")))
            ).cast("long").alias("score_q"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_q").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def pmi_score(
    uni: DataFrame,
    c12: DataFrame,
    min_count: int = 5,
    top: int = 20,
    totals: DataFrame | None = None,
) -> DataFrame:
    """PMI scoring over pre-aggregated counts — shared by the batch
    :func:`pmi_collocations`, the store read
    (``incremental.pmi_from_store``), and the pruned term probe
    (``incremental.collocations_for_terms``). ``uni`` is (token, c)
    unigram counts, ``c12`` is (w1, w2, c12) adjacent-bigram counts;
    ``totals`` — when given — is a one-row (__t, __b) frame supplying
    the CORPUS token/bigram totals (the probe's frames cover only the
    probed vocabulary, so totals must come from stats partials);
    default derives them from the aggregated frames (Σc, Σc12 — exact
    integers, identical to counting the raw streams), so any additive
    split of the corpus scores identically."""
    if totals is None:
        totals = F.broadcast(
            uni.agg(F.sum("c").cast("long").alias("__t")).crossJoin(
                c12.agg(F.sum("c12").cast("long").alias("__b"))
            )
        )
    u1 = uni.select(F.col("token").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("c").alias("c2"))
    scored = (
        c12.filter(F.col("c12") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(totals)
        .select(
            "w1",
            "w2",
            "c12",
            (
                _lnq(F.col("c12"))
                - _lnq(F.col("__b"))
                - _lnq(F.col("c1"))
                - _lnq(F.col("c2"))
                + F.lit(2) * _lnq(F.col("__t"))
            ).cast("long").alias("pmi_q"),
        )
    )
    return scored.orderBy(
        F.col("pmi_q").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(top)


def pmi_collocations(
    docs: DataFrame, min_count: int = 5, top: int = 20
) -> DataFrame:
    """Top collocations by pointwise mutual information over adjacent
    token bigrams — tokenizer-vocabulary and phrase-mining staple.
    ``pmi_q = lnq(c12) − lnq(B) − lnq(c1) − lnq(c2) + 2·lnq(T)`` with
    every ln on the 1e-6 integer lattice (see :func:`_lnq`), ``T`` =
    total tokens, ``B`` = total bigrams — exact int64, rank-stable
    across engines. ``min_count`` floors c12 (PMI's rare-pair
    pathology); the global top-``top`` compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort).

    Output: (w1, w2, c12, pmi_q), ties broken on (w1, w2).
    """
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    uni = toks.groupBy("token").agg(F.count("*").cast("long").alias("c"))
    bg = docs.select(
        F.explode(shingles(tokens(F.col("text")), 2)).alias("bg")
    ).select(
        F.split(F.col("bg"), " ").getItem(0).alias("w1"),
        F.split(F.col("bg"), " ").getItem(1).alias("w2"),
    )
    c12 = bg.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c12")
    )
    return pmi_score(uni, c12, min_count, top)


def bigram_frame(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, w1, w2, c12) — per-document adjacent-bigram counts,
    one tokenize scan: the collocation index rows the bigram store
    persists (``incremental.ingest_bigram_postings``). Doc-grained so
    the store's redelivery guard works at the same granularity as the
    BM25 postings store; Σ over docs equals the corpus bigram counts
    exactly (integer additivity)."""
    return (
        docs.select(
            "doc_id",
            F.explode(shingles(tokens(F.col(text)), 2)).alias("bg"),
        )
        .select(
            "doc_id",
            F.split(F.col("bg"), " ").getItem(0).alias("w1"),
            F.split(F.col("bg"), " ").getItem(1).alias("w2"),
        )
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
    )


def keywords_from_store(postings: DataFrame, k: int = 5) -> DataFrame:
    """TF-IDF keywords answered from the PERSISTED postings store
    (:func:`postings_frame` rows, the same store BM25 retrieval reads)
    — corpus text is never touched: tf is the posting row, df folds
    from token-keyed postings, N counts the per-doc length sentinels.
    Identical lattice arithmetic and tie-breaks to
    :func:`tfidf_keywords`, so a store covering the same corpus
    returns identical rows (pytest pins it across drops +
    redelivery)."""
    tf = postings.filter(
        F.col("token").isNotNull() & F.col("doc_id").isNotNull()
    ).select("doc_id", "token", "tf")
    nd = (
        postings.filter(F.col("token").isNull() & F.col("doc_id").isNotNull())
        .agg(F.count("*").cast("long").alias("__n"))
    )
    return _tfidf_score(tf, nd, k)
