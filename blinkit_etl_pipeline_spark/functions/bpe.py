"""BPE tokenizer training primitives (Sennrich et al. 2016,
arXiv:1508.07909) — the step after `ns_text_vocab` in a
training-data pipeline.

Spark-first shape: BPE trains on the WORD-FREQUENCY table, not the
corpus — one explode + groupBy collapses 100 TB of text into a vocab
of (word, count) rows (bounded by distinct words, not corpus size),
and every subsequent merge iteration runs over that small table.
Symbols are arrays of strings; pair counting is an explode over
adjacent positions weighted by word count; applying a merge is a pure
Catalyst ``aggregate`` fold that rebuilds each symbol array
left-to-right (greedy non-overlapping, matching the reference
implementation: after ``(a, b) → ab`` merges, a following ``b`` can't
re-merge because the fold's last element is now ``ab``).

Driver state per iteration is ONE row (the argmax pair) — O(merges)
Spark jobs, O(1) driver memory; lineage is cut with localCheckpoint
every few merges so long trainings don't accrete plans. Tie-breaks are
deterministic (count desc, then pair lexicographic), so the learned
merge list is engine-reproducible; the iteration-0 statistics are
value-checked against a DuckDB oracle (`ns_text_bpe_pairs`) and the
loop itself against a hand-computed reference corpus in
``tests/test_quality.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: cut lineage every N merges (each merge adds a transform layer)
_CHECKPOINT_EVERY = 4


def word_counts(docs: DataFrame, text: str = "text") -> DataFrame:
    """(word, wcount): the frequency table BPE trains on. One explode +
    one partial-aggregated groupBy; the shuffle carries (word, partial
    count), never documents."""
    return (
        docs.select(F.explode(tokens(F.col(text))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("wcount"))
    )


def with_symbols(words: DataFrame) -> DataFrame:
    """Add the initial symbol array: one single-character string per
    position (``split`` with an empty pattern keeps no empty edges in
    Spark 4)."""
    syms = F.filter(
        F.split(F.col("word"), ""), lambda s: s != ""
    )
    return words.select("word", "wcount", syms.alias("symbols"))


def pair_counts(symbolized: DataFrame) -> DataFrame:
    """(sym_a, sym_b, pair_count): adjacent-symbol pair frequencies
    weighted by word count. Words with fewer than two symbols
    contribute nothing."""
    two_plus = symbolized.filter(F.size("symbols") >= 2)
    idx = F.sequence(F.lit(1), F.size("symbols") - 1)
    pairs = two_plus.select(
        "wcount",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("symbols", i).alias("sym_a"),
                    F.element_at("symbols", i + 1).alias("sym_b"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.sym_a").alias("sym_a"), F.col("p.sym_b").alias("sym_b")
    ).agg(F.sum("wcount").cast("bigint").alias("pair_count"))


def top_pairs(symbolized: DataFrame, k: int) -> DataFrame:
    """Top-``k`` pairs, deterministically ordered (count desc, then
    pair ascending) — plans as TakeOrderedAndProject."""
    return (
        pair_counts(symbolized)
        .orderBy(
            F.col("pair_count").desc(),
            F.col("sym_a").asc(),
            F.col("sym_b").asc(),
        )
        .limit(k)
    )


def apply_merge(symbols: Column, a: str, b: str) -> Column:
    """Rebuild a symbol array with every adjacent ``(a, b)`` fused to
    ``a+b``, greedily left-to-right (non-overlapping)."""
    merged = F.lit(a + b)

    def step(acc: Column, s: Column) -> Column:
        can_merge = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b))
        )
        return F.when(
            can_merge,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(
        symbols, F.array().cast("array<string>"), step
    )


def bpe_train(
    docs: DataFrame, num_merges: int, text: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns [(sym_a, sym_b, pair_count_at_merge_time), …] in merge
    order. Stops early if no pair remains. Only the single argmax row
    crosses to the driver per iteration.
    """
    state = with_symbols(word_counts(docs, text))
    merges: list[tuple[str, str, int]] = []
    for i in range(num_merges):
        best = top_pairs(state, 1).collect()
        if not best:
            break
        a, b, c = best[0]["sym_a"], best[0]["sym_b"], int(best[0]["pair_count"])
        merges.append((a, b, c))
        state = state.select(
            "word", "wcount", apply_merge(F.col("symbols"), a, b).alias("symbols")
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            state = state.localCheckpoint(eager=True)
    return merges


def segment(symbols_df: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Apply a learned merge list to a symbolized vocabulary — the
    inference half (tokenize new text with the trained merges)."""
    state = symbols_df
    for a, b, _ in merges:
        state = state.select(
            *[c for c in state.columns if c != "symbols"],
            apply_merge(F.col("symbols"), a, b).alias("symbols"),
        )
    return state
