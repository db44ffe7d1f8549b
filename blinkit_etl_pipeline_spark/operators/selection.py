"""Dataset selection for training-data pipelines: deterministic
stratified sampling and train/val/test splitting (north-star surface).

Both operators are **pure map-side filters/projections** — no shuffle,
no sampling state, no driver round-trip — so they scale embarrassingly:
each row's fate is a function of its own id. Determinism comes from the
cross-engine ``h32`` hash (functions/text.py): the same row is kept and
lands in the same split on every run, on every engine, regardless of
partitioning — unlike ``DataFrame.sample`` (seed × partition-layout
dependent) or ``rand()`` (nondeterministic under retries).

Why hash-gating is the production spelling at 100 TB:
- re-runs are idempotent (retried tasks select identical rows);
- the sample composes with incremental data (new rows don't reshuffle
  old rows' membership);
- train/test splits stay leak-free across pipeline versions (a doc can
  never migrate between splits unless the salt changes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import h32

#: hash-gate resolution: rates are quantized to 1e-6.
GATE_MOD = 1_000_000


def _gate(id_col: Column, salt: str) -> Column:
    """Uniform [0, GATE_MOD) bucket from a row id — h32 of the salted id."""
    return h32(F.concat(id_col.cast("string"), F.lit(":" + salt))) % GATE_MOD


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    *,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Keep a per-stratum fraction of rows, deterministically.

    ``rates`` maps stratum value → keep-fraction (e.g. downsample the
    dominant language, keep all of a rare one — the standard move when
    mixing a training corpus). Strata absent from ``rates`` use
    ``default_rate``. A row survives iff
    ``h32(id:salt) % 1e6 < rate(stratum) * 1e6``.
    """
    rate_col: Column = F.lit(int(default_rate * GATE_MOD))
    for value, rate in sorted(rates.items()):
        rate_col = (
            F.when(F.col(strata_col) == value, F.lit(int(rate * GATE_MOD)))
            .otherwise(rate_col)
        )
    return df.filter(_gate(F.col(id_col), salt) < rate_col)


def hash_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    labels: Sequence[str] = ("train", "val", "test"),
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one split by stable hash bucket.

    Cumulative-weight thresholds over ``h32(id:salt) % 1e6`` — each row
    gets exactly one label, fractions converge to ``weights`` in
    expectation, and membership is a pure function of the id (leak-free
    across runs and engines).
    """
    if len(weights) != len(labels):
        raise ValueError("weights and labels must align")
    total = sum(weights)
    gate = _gate(F.col(id_col), salt)
    expr: Column | None = None
    acc = 0.0
    # build thresholds low→high; the final label is the otherwise-branch
    for w, label in zip(weights[:-1], labels[:-1]):
        acc += w / total
        cond = gate < int(acc * GATE_MOD)
        expr = (
            F.when(cond, F.lit(label))
            if expr is None
            else expr.when(cond, F.lit(label))
        )
    expr = (
        F.lit(labels[-1]) if expr is None else expr.otherwise(F.lit(labels[-1]))
    )
    return df.withColumn(split_col, expr)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    *,
    id_col: str = "doc_id",
    salt: str = "wsample",
    scale: float = 1.0,
) -> DataFrame:
    """Keep each row with probability ``scale · weight`` (weight ∈ [0,1]),
    deterministically: ``h32(id:salt) % 1e6 < weight · scale · 1e6``.

    The corpus-curation form of importance sampling — e.g. keep
    probability proportional to a quality score, so high-quality
    documents dominate the mix without a hard cutoff. Same idempotency
    and leak-freedom properties as :func:`stratified_sample` (a row's
    fate is a pure function of its id), and still a map-side filter:
    the weight column rides the row, so no shuffle, no driver state.
    """
    gate = _gate(F.col(id_col), salt).cast("double")
    return df.filter(
        gate < F.col(weight_col) * F.lit(float(scale) * GATE_MOD)
    )


def mixture_rates(
    docs: DataFrame,
    targets_ppm: dict[str, int],
    *,
    source: str = "source",
) -> DataFrame:
    """Static data-mixing plan (Pile/DoReMi-style fixed mixture): given
    target mixture WEIGHTS per source (parts-per-million, summing to ≤
    1e6), derive the largest feasible corpus honoring them without
    oversampling, and each source's deterministic keep rate.

    All arithmetic is exact integer ppm — ``T = min_s(n_s·1e6 div w_s)``
    is the largest total for which every source can supply its share;
    ``keep_s = T·w_s div 1e6``, ``rate_s = keep_s·1e6 div n_s`` (floors
    make the plan conservative, never oversampling a source). One
    partial-aggregated ``groupBy(source)`` (source cardinality is
    bounded — this is a catalog, not data) and a broadcast scalar
    attach; nothing scales with corpus size except the count scan.

    Returns (source, n_obs, w_ppm, keep_target, rate_ppm) for sources
    with positive weight.
    """
    if not targets_ppm:
        raise ValueError("targets_ppm must be non-empty")
    if sum(targets_ppm.values()) > GATE_MOD:
        raise ValueError("mixture weights exceed 1e6 ppm")
    if any(w <= 0 for w in targets_ppm.values()):
        raise ValueError("mixture weights must be positive")
    w_col: Column = F.lit(0)
    for value, w in sorted(targets_ppm.items()):
        w_col = F.when(F.col(source) == value, F.lit(int(w))).otherwise(w_col)
    counts = (
        docs.groupBy(source)
        .agg(F.count("*").cast("bigint").alias("n_obs"))
        .withColumn("w_ppm", w_col.cast("bigint"))
        .filter(F.col("w_ppm") > 0)
    )
    # a target source with ZERO corpus rows never surfaces from the
    # groupBy, which would silently drop it from the min() and produce
    # a plan violating the requested mixture (the only corpus honoring
    # a positive weight for an empty source is the empty corpus) —
    # detect and raise instead. Bounded collect: ≤ len(targets) rows.
    present = {r[source] for r in counts.select(source).collect()}
    missing = sorted(set(targets_ppm) - present)
    if missing:
        raise ValueError(
            f"mixture infeasible: target sources have no corpus rows: "
            f"{missing}"
        )
    return _plan_from_counts(counts)


def _plan_from_counts(counts: DataFrame) -> DataFrame:
    """Shared feasible-corpus arithmetic over a (source, n_obs, w_ppm)
    frame — see :func:`mixture_rates` for the semantics."""
    feasible = counts.agg(
        F.min(F.expr(f"n_obs * {GATE_MOD} div w_ppm")).alias("t_max")
    )
    return (
        counts.crossJoin(F.broadcast(feasible))
        .select(
            *[c for c in counts.columns if c != "t_max"],
            F.least(
                F.col("n_obs"),
                F.expr(f"t_max * w_ppm div {GATE_MOD}"),
            ).alias("keep_target"),
        )
        .withColumn(
            "rate_ppm", F.expr(f"keep_target * {GATE_MOD} div n_obs")
        )
    )


def temperature_mixture_plan(
    docs: DataFrame,
    *,
    source: str = "source",
) -> DataFrame:
    """Temperature-scaled mixing at α = 0.5 (the classic "square-root
    sampling" of multilingual pretraining — upweight small sources,
    damp dominant ones): weights derive from the observed counts,
    ``w_s ∝ sqrt(n_s)``, then the same feasible-corpus plan as
    :func:`mixture_rates`.

    Exactness: IEEE ``sqrt`` is correctly rounded (unlike ``pow``/
    ``ln``), and it is immediately quantized — ``q_s = floor(sqrt(n_s)
    · 2^20)`` — so the normalization sum is an INTEGER sum
    (order-independent) and every engine derives identical ppm
    weights; a general-α ``pow`` would reintroduce libm ulp drift
    into a floor boundary. Same bounded-cardinality scale shape as
    :func:`mixture_rates`.
    """
    counts = docs.groupBy(source).agg(
        F.count("*").cast("bigint").alias("n_obs")
    )
    q = counts.withColumn(
        "q_s",
        F.floor(F.sqrt(F.col("n_obs").cast("double")) * (1 << 20)).cast(
            "bigint"
        ),
    )
    total = q.agg(F.sum("q_s").cast("bigint").alias("q_total"))
    weighted = (
        q.crossJoin(F.broadcast(total))
        .select(
            source,
            "n_obs",
            F.expr(f"q_s * {GATE_MOD} div q_total").alias("w_ppm"),
        )
        .filter(F.col("w_ppm") > 0)
    )
    return _plan_from_counts(weighted)


def apply_mixture(
    docs: DataFrame,
    rates: DataFrame,
    *,
    source: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Execute a :func:`mixture_rates` plan: broadcast the (bounded)
    per-source rate table and hash-gate each row — map-side except the
    broadcast, idempotent under retries, incremental-data-stable (same
    guarantees as :func:`stratified_sample`). Sources without a plan
    row are dropped (weight 0)."""
    joined = docs.join(
        F.broadcast(rates.select(source, "rate_ppm")), source, "inner"
    )
    return joined.filter(
        _gate(F.col(id_col), salt) < F.col("rate_ppm")
    ).drop("rate_ppm")


def shuffle_shards(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global shuffle into training shards.

    Training runs need the corpus in a pseudorandom order that is (a)
    decorrelated from ingest order (domain/time clumps hurt loss), and
    (b) exactly reproducible across re-runs, retries, and engines —
    which rules out ``DataFrame.orderBy(rand())`` (nondeterministic
    under task retry, partition-layout dependent). The standard trick:
    order by a salted hash of the row id.

    Each row gets ``shard = h32(id:salt) % n_shards`` and ``pos`` = its
    rank within the shard ordered by (full hash, id). Changing the salt
    is a fresh epoch-level reshuffle; changing nothing reproduces the
    byte-same order.

    Scale shape (100 TB): the hash is map-side; the only shuffle is the
    hash-partition by ``shard`` + per-shard sort that the rank needs —
    the same single exchange any global shuffle pays, but split into
    n_shards independent sorts. Choose ``n_shards`` so one shard fits
    an executor's sort spill budget (production: thousands); the rank
    window is per-shard, so no global-order bottleneck exists.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    key = h32(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    ).alias("__key")
    out = df.withColumn("__key", key).withColumn(
        "shard", (F.col("__key") % n_shards).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__key").asc(), F.col(id_col).asc())
    )
    return (
        out.withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__key")
    )


# ----------------------------------------------------------------------
# Contrastive triplet mining (embedding-model training data)
# ----------------------------------------------------------------------

#: deterministic negative-probe parameters: LCG-style candidate ids
#: ``(anchor·A + j·B + C) mod n_max`` for j in [0, NEG_PROBES)
NEG_PROBES = 8
NEG_A, NEG_B, NEG_C = 48271, 104729, 12345


def triplet_mine(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(anchor, positive, negative) triplets for contrastive embedding
    training, mined from a near-duplicate pair set.

    Every document appearing in ``pairs`` (symmetrized) anchors one
    triplet: its POSITIVE is its most-similar partner (ties → lowest
    id); its NEGATIVE is drawn by deterministic modular probing —
    candidate ids ``(anchor·A + j·B + C) mod n_max`` for j = 0..7,
    keeping the first probe that (a) exists in the corpus, (b) isn't
    the anchor, and (c) isn't one of the anchor's near-dup partners.
    Anchors whose 8 probes all fail yield no row (measure-zero on any
    corpus where near-dup partners are sparse).

    Determinism is structural: similarity ties break on ids, negative
    selection is integer arithmetic — no ``rand()``, so retried tasks
    and both engines mine identical triplets, and the sample composes
    with incremental data the way the hash-gates above do.

    Scale shape: ``pairs`` is answer-proportional (banded/prefix
    candidate generation upstream); probing is anchors×8 rows through
    one semi-join on corpus ids and one anti-join on the pair set —
    all linear equi-joins, no corpus product anywhere.

    ``pairs`` must have (doc_a, doc_b, jaccard) columns (the
    ``dedup.ngram_jaccard_pairs`` contract).
    Returns (anchor_id, positive_id, pos_jaccard, negative_id).
    """
    sym = pairs.select(
        F.col("doc_a").alias("anchor"),
        F.col("doc_b").alias("partner"),
        "jaccard",
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("anchor"),
            F.col("doc_a").alias("partner"),
            "jaccard",
        )
    )
    w = Window.partitionBy("anchor").orderBy(
        F.col("jaccard").desc(), F.col("partner").asc()
    )
    best = (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("anchor", F.col("partner").alias("positive"), "jaccard")
    )
    nmax = docs.agg(
        (F.max(F.col(id_col)) + F.lit(1)).cast("long").alias("n_max")
    )
    probes = (
        best.crossJoin(F.broadcast(nmax))
        .select(
            "anchor",
            "positive",
            "jaccard",
            F.explode(
                F.sequence(F.lit(0), F.lit(NEG_PROBES - 1))
            ).alias("j"),
            "n_max",
        )
        .withColumn(
            "cand",
            (
                F.col("anchor") * F.lit(NEG_A)
                + F.col("j") * F.lit(NEG_B)
                + F.lit(NEG_C)
            )
            % F.col("n_max"),
        )
        .filter(F.col("cand") != F.col("anchor"))
    )
    ids = docs.select(F.col(id_col).alias("cand"))
    valid = probes.join(ids, "cand").join(
        sym.select("anchor", F.col("partner").alias("cand")),
        ["anchor", "cand"],
        "left_anti",
    )
    wj = Window.partitionBy("anchor").orderBy(F.col("j").asc())
    return (
        valid.withColumn("rnj", F.row_number().over(wj))
        .filter(F.col("rnj") == 1)
        .select(
            F.col("anchor").cast("long").alias("anchor_id"),
            F.col("positive").cast("long").alias("positive_id"),
            F.col("jaccard").alias("pos_jaccard"),
            F.col("cand").cast("long").alias("negative_id"),
        )
    )


def triplet_mine_knn(
    emb: DataFrame,
    k: int = 5,
    iters: int = 1,
    nbits: int = 4,
    ntables: int = 8,
) -> DataFrame:
    """(anchor, positive, HARD negative) triplets mined from the k-NN
    graph (r10 — the composition :func:`~blinkit_etl_pipeline_spark.
    operators.vector.knn_graph` was built to feed): where
    :func:`triplet_mine`'s modular probing draws negatives uniformly
    (easy negatives — far from the anchor almost surely), the graph
    variant draws each anchor's negative from INSIDE its neighborhood:

    - ``positive``  = the anchor's rank-1 graph neighbor (most
      similar, ties already broken by the graph's deterministic
      order);
    - ``negative``  = the LAST-ranked neighbor in the anchor's top-k
      list (rank > 1) — semantically close enough to collide in the
      LSH buckets / local joins, yet the least similar of the
      neighborhood: the classic in-batch hard negative, the gradient
      signal easy negatives stop providing once training converges.

    Anchors with fewer than two graph edges yield no row. Everything
    inherits the graph's determinism (integer-lattice cosines, fixed
    tie order), so the DuckDB oracle replays seed pairs, refinement,
    ranks, and both picks value-exactly.

    Scale shape = the graph build (never all-pairs) + two k·n-row
    window passes; no new shuffles beyond :func:`knn_graph` itself.
    Returns (anchor_id, positive_id, pos_cos, negative_id, neg_cos).
    """
    from .vector import knn_graph

    g = knn_graph(emb, k=k, iters=iters, nbits=nbits, ntables=ntables)
    pos = g.filter(F.col("rank") == 1).select(
        F.col("node_id").alias("anchor_id"),
        F.col("neighbor_id").alias("positive_id"),
        F.col("cosine_sim").alias("pos_cos"),
    )
    wn = Window.partitionBy("node_id").orderBy(F.col("rank").desc())
    neg = (
        g.filter(F.col("rank") > 1)
        .withColumn("rb", F.row_number().over(wn))
        .filter(F.col("rb") == 1)
        .select(
            F.col("node_id").alias("anchor_id"),
            F.col("neighbor_id").alias("negative_id"),
            F.col("cosine_sim").alias("neg_cos"),
        )
    )
    return pos.join(neg, "anchor_id")
