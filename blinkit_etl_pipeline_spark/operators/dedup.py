"""Document deduplication at scale: exact, n-gram Jaccard, MinHash-LSH,
SimHash, and embedding-cosine near-dup (north-star surface).

Scale design (100 TB framing):

- **Exact**: hash-groupBy on ``md5(text)`` — the shuffle carries a
  32-char hash + doc_id, never the document body. Partial aggregation
  collapses per-partition duplicates before the exchange.
- **n-gram Jaccard**: the classic shingle inverted-index join. The
  quadratic blowup on ultra-common shingles is capped by a document-
  frequency filter (``max_shingle_df``) — the standard stop-shingle
  technique; dropped shingles are the ones with no discriminating power.
- **MinHash-LSH**: 16 permutations → 4 bands × 4 rows. Candidate
  generation joins on (band, band-key) buckets, i.e. the shuffle is
  O(docs × bands), not O(docs²); exact Jaccard then verifies candidates.
- **SimHash**: 32-bit signatures; pigeonhole banding (4 bands × 8 bits)
  guarantees every pair within Hamming distance 3 shares ≥1 exact band,
  so candidate generation is again an equi-join, verified by
  ``bit_count(xor)``.
- All signatures are integer arithmetic on the cross-engine ``h32``
  (functions/text.py) — fully deterministic, so every operator here has
  a value-exact DuckDB oracle; nothing hides behind rows-only checks.

Reference parity note: the reference only has key-based ``dropDuplicates``
(SURVEY.md §2.3 D1-D2, implemented in operators/clean.py); this module is
the D3 north-star extension.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import h32, shingles, tokens

MINHASH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne); keeps terms < 2^38
NUM_MINHASHES = 16
MINHASH_BANDS = 4
SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 4 bands × 8 bits → catches Hamming distance ≤ 3


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Exact dedup: one row per distinct text, min doc_id survives.

    Returns (text_hash, keep_doc_id, dup_count) — the survivor set and
    how many raw rows each collapses.
    """
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").cast("bigint").alias("dup_count"),
        )
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup returning surviving rows (deterministic: min doc_id)."""
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@dataclass(frozen=True)
class ShingleIndex:
    """A prebuilt shingle inverted index plus the parameters it was built
    with, so consumers can verify compatibility instead of silently
    computing wrong Jaccard values from an index built with a different
    ``n`` or document-frequency cap (ADVICE r3)."""

    df: DataFrame
    n: int
    max_shingle_df: int | None = None


def build_shingle_index(
    docs: DataFrame, n: int, max_shingle_df: int | None = None
) -> ShingleIndex:
    """Persisted :class:`ShingleIndex` for sharing across operators."""
    return ShingleIndex(
        shingle_index(docs, n, max_shingle_df).persist(), n, max_shingle_df
    )


def _resolve_idx(
    idx: DataFrame | ShingleIndex | None,
    docs: DataFrame,
    n: int,
    max_shingle_df: int | None,
    caller: str,
) -> DataFrame:
    """Shared idx-injection contract for the shingle-based pair operators.

    - ``None``: build (and persist) the index here.
    - :class:`ShingleIndex`: assert its (n, max_shingle_df) match the
      caller's arguments — a mismatched index yields silently wrong
      Jaccard values, so this raises instead.
    - raw ``DataFrame``: trusted as-is. Contract: it MUST be
      ``shingle_index(docs, n)`` with the same ``n`` and cap the caller
      passes (prefer :func:`build_shingle_index`, which carries the
      metadata and gets checked).
    """
    if idx is None:
        return shingle_index(docs, n, max_shingle_df).persist()
    if isinstance(idx, ShingleIndex):
        if idx.n != n or idx.max_shingle_df != max_shingle_df:
            raise ValueError(
                f"{caller}: injected ShingleIndex was built with "
                f"(n={idx.n}, max_shingle_df={idx.max_shingle_df}) but the "
                f"call requests (n={n}, max_shingle_df={max_shingle_df}) — "
                "Jaccard values would be silently wrong"
            )
        return idx.df
    return idx


def shingle_index(docs: DataFrame, n: int, max_shingle_df: int | None = None) -> DataFrame:
    """Inverted index (doc_id, shingle), distinct per doc.

    ``max_shingle_df`` drops shingles appearing in more than that many
    documents (stop-shingle cap; prevents quadratic candidate blowup).
    """
    idx = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens(F.col("text")), n))).alias("shingle"),
    )
    if max_shingle_df is not None:
        dfreq = idx.groupBy("shingle").agg(F.count("*").alias("__df"))
        idx = (
            idx.join(dfreq.filter(F.col("__df") <= max_shingle_df), "shingle")
            .drop("__df")
        )
    return idx


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    idx: DataFrame | ShingleIndex | None = None,
) -> DataFrame:
    """All doc pairs with word-n-gram Jaccard ≥ threshold.

    Candidate pairs must share ≥1 (non-capped) shingle; Jaccard is
    computed on the capped shingle sets: |A∩B| / (|A|+|B|−|A∩B|).
    Rounded to 6 before the threshold compare on BOTH engines so the
    boundary decision is identical.

    ``idx`` injects a prebuilt (persisted) shingle index so callers
    running several shingle-based operators over the same corpus (e.g.
    the recall gauges) tokenize once, not once per operator. Pass a
    :class:`ShingleIndex` (from :func:`build_shingle_index`) to get the
    (n, max_shingle_df) compatibility check; a raw DataFrame is trusted
    and MUST have been built with the same parameters.
    """
    # three consumers (sizes + both join sides) — _resolve_idx persists
    # a locally-built index so the tokenize+shingle explode runs once
    idx = _resolve_idx(idx, docs, n, max_shingle_df, "ngram_jaccard_pairs")
    sizes = idx.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    # the co-occurrence self-join keys on xxhash64(shingle): an 8-byte
    # long instead of a ~20-byte string — smaller shuffle, cheaper
    # probes (~1.5× at sf0.1). Only the JOIN KEY is hashed (sizes and
    # Jaccard use the true distinct-shingle sets); a 64-bit collision
    # would need two distinct shingles to hash equal (P ≈ n²/2⁶⁵ —
    # ~1e-10 for a million-shingle vocabulary).
    hidx = idx.select("doc_id", F.xxhash64("shingle").alias("sh"))
    a, b = hidx.alias("a"), hidx.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("intersection"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("set_size", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("set_size", "size_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("intersection")
                / (F.col("size_a") + F.col("size_b") - F.col("intersection")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "intersection", "size_a", "size_b", "jaccard")
    )


def ngram_jaccard_pairs_prefix(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    idx: DataFrame | ShingleIndex | None = None,
) -> DataFrame:
    """EXACT Jaccard pairs via prefix filtering (PPJoin-family).

    Same answer set as :func:`ngram_jaccard_pairs`, asymptotically fewer
    candidates. Order all shingles by global document frequency
    (rarest first, shingle as tie-break); each document keeps only its
    first ``|A| − ceil(t·|A|) + 1`` shingles as its *prefix*. Pigeonhole
    guarantee: if ``J(A,B) ≥ t`` then ``|A∩B| ≥ t·|A∪B| ≥ t·max(|A|,|B|)``,
    but shingles outside A's prefix number only ``ceil(t·|A|) − 1 <
    t·|A|`` — so the intersection cannot fit in the suffixes alone and
    the pair MUST share a prefix shingle. Candidate generation joins
    prefixes only (the rarest shingles, so bucket sizes are small by
    construction); the exact intersection count is then computed for
    candidates alone.

    Scale shape vs the plain inverted-index join: the quadratic term
    ``Σ_s df(s)²`` runs over prefix frequencies only — common shingles
    (the df² blowup) sit at the END of the global order and fall out of
    most prefixes. Costs two extra small shuffles (df counts + the
    per-doc rank) and a candidate-proportional verify.

    Every post-tokenize stage keys on ``xxhash64(shingle)`` — the df
    join, the ranking window, the prefix join, and the verify all
    shuffle 8-byte longs, never shingle strings (r7: the string-keyed
    df-join + window spilled >77 GB at a 5M-doc corpus; hashed keys cut
    the shuffled bytes ~3×). Correctness is unchanged: the pigeonhole
    bound holds under ANY consistent global order (it only counts
    elements, and (df, sh64) is as total an order as (df, shingle)),
    prefix lengths come from TRUE set sizes, and the exact verify fixes
    the final answer set. A 64-bit collision would need two distinct
    shingles of one document to hash equal (P ≈ 2⁻⁶⁵ per pair — the
    same accepted trade as the verify keys here and in
    :func:`ngram_jaccard_pairs`).
    """
    idx = _resolve_idx(idx, docs, n, None, "ngram_jaccard_pairs_prefix")
    sizes = idx.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    hidx64 = idx.select("doc_id", F.xxhash64("shingle").alias("sh"))
    dfreq = hidx64.groupBy("sh").agg(F.count("*").alias("__df"))
    w = Window.partitionBy("doc_id").orderBy("__df", "sh")
    ranked = (
        hidx64.join(dfreq, "sh")
        .withColumn("__rn", F.row_number().over(w))
        .join(sizes, "doc_id")
    )
    # Pigeonhole bound in EXACT integer arithmetic (ADVICE r3): float
    # ``ceil(set_size * t)`` over-rounds when the double product lands an
    # ulp above the exact rational (t=0.55, |A|=100 → ceil gives 56, the
    # exact bound is 55), shortening the prefix and silently DROPPING
    # true pairs. Quantize t to parts-per-million, minus one ppm because
    # the final filter compares round(J, 6) ≥ t — a pair with true J as
    # low as t − 5e-7 still passes it, so the prefix must be sized for
    # that slightly-lower effective threshold. A ppm-longer prefix only
    # adds candidates (the exact verify keeps the answer set identical).
    t_ppm = int(round(threshold * 1_000_000)) - 1
    required = F.expr(f"(set_size * {t_ppm} + 999999) div 1000000")
    ph = ranked.filter(
        F.col("__rn") <= F.col("set_size") - required + 1
    ).select("doc_id", "sh")
    a, b = ph.alias("a"), ph.alias("b")
    candidates = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify on per-doc hashed-shingle ARRAYS, not an exploded
    # (pair, shingle) join: the exploded form shuffles |candidates| ×
    # |set| ~25-byte ROWS into the pair-group aggregate (r7: >90 GB
    # spill at a 5M-doc corpus with replica-driven candidate counts);
    # arrays ship the same longs at ~8 bytes each, skip the aggregate
    # shuffle entirely, and array_intersect counts JVM-side per pair.
    sets64 = hidx64.groupBy("doc_id").agg(F.collect_list("sh").alias("shs"))
    inter = (
        candidates.join(
            sets64.select(
                F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a")
            ),
            "doc_a",
        )
        .join(
            sets64.select(
                F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("shs_a", "shs_b")).cast("long").alias(
                "intersection"
            ),
        )
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "set_size", "size_a"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "set_size", "size_b"
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("intersection")
                / (F.col("size_a") + F.col("size_b") - F.col("intersection")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "intersection", "size_a", "size_b", "jaccard")
    )


def _minhash_agg_cols() -> list:
    """The 16 per-document MIN aggregates over hashed shingles."""
    cols = []
    for i in range(NUM_MINHASHES):
        a, c = 2 * i + 1, 101 * i + 12289
        cols.append(
            F.min((F.col("sh32") * a + c) % MINHASH_PRIME).alias(f"sig{i}")
        )
    return cols


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """16-permutation MinHash signature per doc, single aggregation pass.

    Permutation family: ``h_i(x) = ((2i+1)·h32(x) + 101i + 12289) mod P``
    over distinct word-n-gram shingles. One shuffle on doc_id; all 16
    mins computed map-side first.
    """
    exploded = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens(F.col("text")), n))).alias(
            "shingle"
        ),
    )
    hashed = exploded.select("doc_id", h32(F.col("shingle")).alias("sh32"))
    return hashed.groupBy("doc_id").agg(*_minhash_agg_cols())


def band_frame(sigs: DataFrame, keys: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """(*keys, band, key) — LSH banding of a signature frame: band
    ``bi`` concatenates its ``NUM_MINHASHES // MINHASH_BANDS`` rows of
    the signature into one join key. This frame IS the persistable LSH
    index (see ``operators/incremental.py``): signatures are a few
    dozen bytes per document, so the index scales as metadata, not
    corpus. ``keys`` generalizes the unit of deduplication — e.g.
    ``("doc_id", "chunk_id")`` for chunk-level banding."""
    rows_per_band = NUM_MINHASHES // MINHASH_BANDS
    return sigs.select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"sig{bi * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for bi in range(MINHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(*keys, "bk.band", "bk.key")


def _lsh_candidates(idx) -> DataFrame:
    """``(doc_a, doc_b)`` candidate pairs from the 16-perm/4-band
    MinHash band join over a shingle index — the shared blocking pass
    of every LSH-candidate tier (Jaccard verify, edit-distance
    verify). One definition so banding changes cannot silently
    diverge between tiers (r7 review)."""
    sigs = idx.select("doc_id", h32(F.col("shingle")).alias("sh32")).groupBy(
        "doc_id"
    ).agg(*_minhash_agg_cols())
    bands = band_frame(sigs)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.35,
    idx: DataFrame | ShingleIndex | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified by exact Jaccard.

    Banding: 4 bands × 4 rows (s-curve threshold ≈ (1/4)^(1/4) ≈ 0.71 on
    signature agreement; with 16 perms this surfaces pairs well below
    that, and the exact-Jaccard verify makes the final answer precise:
    candidates = LSH, verdict = exact).

    ``idx`` injects a prebuilt (persisted) shingle index (see
    :func:`ngram_jaccard_pairs` for the compatibility contract).
    """
    # One shingle index feeds signatures, candidate verification, and
    # set sizes — a locally-built one is persisted so the
    # tokenize+shingle explode runs once.
    idx = _resolve_idx(idx, docs, n, None, "minhash_lsh_pairs")
    candidates = _lsh_candidates(idx)
    # Verify candidates only: exact Jaccard computed per candidate pair
    # (the candidate set is small, so these joins broadcast), NOT the
    # all-pairs shingle self-join — at scale that is the whole point of
    # LSH; computing full Jaccard to verify would negate it.
    sizes = idx.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    inter = (
        candidates.join(idx.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(idx.withColumnRenamed("doc_id", "doc_b"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("intersection"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "set_size", "size_a"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "set_size", "size_b"
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("intersection")
                / (F.col("size_a") + F.col("size_b") - F.col("intersection")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Transitive closure of near-dup pairs → survivor groups.

    Near-dup operators emit *pairs*; production dedup needs the
    transitive groups ("A~B, B~C ⇒ {A,B,C} keep one"). This is
    iterative min-label propagation with path halving — the
    small-star-family trick that contracts label chains so convergence
    is O(log n) rounds, not O(longest path):

    each round (all pure DataFrame ops — shuffles on node/label keys):
      1. ``label(v) ← min(label(v), min over neighbors label(u))``
      2. path halving: ``label(v) ← label(label(v))``
    until no label changes. The driver holds ONE scalar per round (the
    changed-count used for the convergence test) — never node or edge
    data, so the operator scales with the cluster, not the driver.

    Returns (node, label) where label = min node id of the component.
    Only nodes that appear in some edge are returned (singletons are
    trivially their own survivors).

    Iteration hygiene (this loop runs inside one driver process):

    - Every per-round frame is cut with ``localCheckpoint`` — without it
      the logical plan grows by four joins per round and Catalyst
      re-analyzes the whole history each iteration (O(rounds²) planning),
      and the returned frame would silently depend on caches the loop
      has already released. The result is a plan-free leaf the caller
      can use (and the engine can GC) like any other DataFrame.
    - Labels are monotonically non-increasing, so the convergence test
      is exact; the old label rides along in the round's frame, making
      the changed-count a filter on already-materialized data instead
      of an extra self-join.
    - Exhausting ``max_iters`` without a fixpoint raises — returning
      half-propagated labels would silently split components downstream.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iters):
        nbr = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("u", "node")
        )
        # NOT checkpointed (r13): relabeled is referenced twice below
        # (ptr + the halving join), so skipping its materialization
        # re-computes one leaf-join subtree instead of paying a full
        # plan-compile + checkpoint job per round — the round's single
        # checkpoint (halved) still truncates lineage before the next
        # iteration, so plans stay flat
        relabeled = labels.join(nbr, "node", "left").select(
            "node",
            F.col("label").alias("old_label"),
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        ptr = relabeled.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        halved = (
            relabeled.join(ptr, relabeled["label"] == ptr["pnode"], "left")
            .select(
                "node",
                "old_label",
                F.coalesce(F.col("plabel"), F.col("label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = halved.filter(F.col("label") != F.col("old_label")).count()
        labels = halved.select("node", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iters} "
            "iterations — raise max_iters (labels would be wrong: one "
            "component could surface as several survivor groups)"
        )
    return labels


def dedup_groups(
    docs_pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Survivor groups from near-dup pairs: (doc_id, group_id,
    group_size), group_id = min doc_id of the transitive component."""
    labels = connected_components(docs_pairs, src, dst)
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("bigint").alias("group_size")
    )
    return labels.join(sizes, "label").select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("label").cast("bigint").alias("group_id"),
        "group_size",
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """32-bit SimHash per doc from token-occurrence hashes.

    bit_b(doc) = [ Σ_tokens (2·((h32(tok)>>b)&1) − 1) > 0 ] — one
    aggregation pass with 32 conditional sums, then bits folded into one
    BIGINT. Token multiplicity counts (standard SimHash weighting).
    """
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).select("doc_id", h32(F.col("tok")).alias("t32"))
    bitsums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftright(F.col("t32"), b) % 2) * 2 - 1
            ).alias(f"bs{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"bs{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << b).cast("long")
        sim = term if sim is None else sim + term
    return bitsums.select("doc_id", sim.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_distance: int = 3) -> DataFrame:
    """Doc pairs within SimHash Hamming distance ``max_distance`` (≤3).

    Pigeonhole banding: 4 bands × 8 bits — any pair with ≤3 differing
    bits matches exactly on ≥1 band, so candidates come from an
    equi-join, then ``bit_count(xor)`` verifies. O(docs×4) shuffle.
    """
    # both self-join sides read the signatures — persist so the
    # tokenize + 32-bit-sum aggregation runs once, not twice
    sigs = simhash_signatures(docs).persist()
    band_bits = SIMHASH_BITS // SIMHASH_BANDS
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        (
                            F.shiftright(F.col("simhash"), bi * band_bits)
                            % (1 << band_bits)
                        ).alias("key"),
                    )
                    for bi in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("simhash_a"),
            F.col("b.simhash").alias("simhash_b"),
        )
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))),
        )
        .filter(F.col("hamming") <= max_distance)
    )


def _chunk_shingle_index(chunks: DataFrame, n: int) -> DataFrame:
    """(doc_id, chunk_id, sh32, shingle) — per-chunk distinct word
    n-grams with the cross-engine h32, the shared front half of the
    chunk-granularity band machinery."""
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.explode(
            F.array_distinct(shingles(tokens(F.col("chunk_text")), n))
        ).alias("shingle"),
    ).select(
        "doc_id", "chunk_id", h32(F.col("shingle")).alias("sh32"), "shingle"
    )


def chunk_decontam_pairs(
    train_chunks: DataFrame,
    test_chunks: DataFrame,
    n: int = 3,
    chunk_threshold: float = 0.5,
) -> DataFrame:
    """Chunk-level benchmark decontamination: which TEST documents
    contain a chunk that near-duplicates a TRAIN chunk? The span-level
    contamination check real LLM pipelines run on top of whole-doc
    n-gram overlap (``ns_decontam_overlap``): an eval answer pasted
    into one paragraph of a long train document dilutes to nothing at
    doc granularity but lights up its chunk.

    Same machinery as :func:`chunk_containment_pairs` with the banded
    equi-join restricted to CROSS-SPLIT pairs — test-chunk band rows
    join train-chunk band rows on (band, key), never a train×test
    product; exact-Jaccard verification of candidate chunk pairs only
    (xxhash64 verify keys); rollup per (test_doc, train_doc). The two
    inputs are :func:`~..functions.text.chunk_frame` results over
    disjoint doc sets (a leak-free hash split upstream).

    Returns (test_doc_id, train_doc_id, matched_pairs,
    contaminated_chunks, n_chunks_test, contamination) — contamination
    is the fraction of the test doc's chunks with a verified train
    match; any emitted row is actionable (≥ 1 leaked span).
    """
    ht = _chunk_shingle_index(train_chunks, n).persist()
    he = _chunk_shingle_index(test_chunks, n).persist()
    sig_t = ht.groupBy("doc_id", "chunk_id").agg(*_minhash_agg_cols())
    sig_e = he.groupBy("doc_id", "chunk_id").agg(*_minhash_agg_cols())
    bt = band_frame(sig_t, keys=("doc_id", "chunk_id")).select(
        F.col("doc_id").alias("train_doc_id"),
        F.col("chunk_id").alias("train_chunk"),
        "band",
        "key",
    )
    be = band_frame(sig_e, keys=("doc_id", "chunk_id")).select(
        F.col("doc_id").alias("test_doc_id"),
        F.col("chunk_id").alias("test_chunk"),
        "band",
        "key",
    )
    cand = (
        be.join(bt, ["band", "key"])
        .select("test_doc_id", "test_chunk", "train_doc_id", "train_chunk")
        .distinct()
    )
    ha = ht.select(
        F.col("doc_id").alias("train_doc_id"),
        F.col("chunk_id").alias("train_chunk"),
        F.xxhash64("shingle").alias("sh64"),
    )
    hb = he.select(
        F.col("doc_id").alias("test_doc_id"),
        F.col("chunk_id").alias("test_chunk"),
        F.xxhash64("shingle").alias("sh64"),
    )
    inter = (
        cand.join(hb, ["test_doc_id", "test_chunk"])
        .join(ha, ["train_doc_id", "train_chunk", "sh64"])
        .groupBy("test_doc_id", "test_chunk", "train_doc_id", "train_chunk")
        .agg(F.count("*").cast("bigint").alias("isect"))
    )
    st = ht.groupBy("doc_id", "chunk_id").agg(
        F.count("*").cast("bigint").alias("size_t")
    ).select(
        F.col("doc_id").alias("train_doc_id"),
        F.col("chunk_id").alias("train_chunk"),
        "size_t",
    )
    se = he.groupBy("doc_id", "chunk_id").agg(
        F.count("*").cast("bigint").alias("size_e")
    ).select(
        F.col("doc_id").alias("test_doc_id"),
        F.col("chunk_id").alias("test_chunk"),
        "size_e",
    )
    cpairs = (
        inter.join(se, ["test_doc_id", "test_chunk"])
        .join(st, ["train_doc_id", "train_chunk"])
        .withColumn(
            "jaccard",
            F.round(
                F.col("isect")
                / (F.col("size_e") + F.col("size_t") - F.col("isect")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= chunk_threshold)
    )
    nch = test_chunks.select(
        F.col("doc_id").alias("test_doc_id"),
        F.col("n_chunks").alias("n_chunks_test"),
    ).distinct()
    return (
        cpairs.groupBy("test_doc_id", "train_doc_id")
        .agg(
            F.count("*").cast("bigint").alias("matched_pairs"),
            F.countDistinct("test_chunk")
            .cast("bigint")
            .alias("contaminated_chunks"),
        )
        .join(nch, "test_doc_id")
        .select(
            "test_doc_id",
            "train_doc_id",
            "matched_pairs",
            "contaminated_chunks",
            "n_chunks_test",
            F.round(
                F.col("contaminated_chunks") / F.col("n_chunks_test"), 6
            ).alias("contamination"),
        )
    )


def chunk_containment_pairs(
    chunks: DataFrame,
    n: int = 3,
    chunk_threshold: float = 0.5,
    containment_threshold: float = 0.2,
) -> DataFrame:
    """Chunk-level near-dedup composed up to doc-level containment — the
    fine-grained pass real LLM pipelines run on top of doc-level dedup:
    two documents that share most of their CHUNKS (boilerplate, quoted
    passages, templated sections) slip past whole-document Jaccard but
    still leak duplicated training tokens.

    Input is a :func:`~..functions.text.chunk_frame` result — (doc_id,
    chunk_id, n_chunks, chunk_text) at minimum. Pipeline, all via the
    existing band machinery at chunk granularity:

    1. shingle each chunk (distinct word n-grams), MinHash 16-perm
       signatures per (doc_id, chunk_id) — one aggregation pass;
    2. candidates via the banded equi-join (:func:`band_frame` with
       composite keys) restricted to CROSS-document pairs, oriented
       ``doc_a < doc_b`` — shuffle is O(chunks × bands), never chunks²;
    3. exact-Jaccard verification of candidate chunk pairs only, kept at
       ``jaccard ≥ chunk_threshold``;
    4. doc-level rollup: ``containment_a`` = fraction of A's chunks with
       a matching chunk in B (and symmetrically), emitted when either
       side's containment reaches ``containment_threshold``.

    At 100 TB the chunk count is corpus-tokens/stride — linear — and
    every join here is either the banded equi-join or bounded by the
    candidate set, so the composition scales exactly like doc-level
    MinHash-LSH with a constant-factor-larger unit count.

    Returns (doc_a, doc_b, matched_pairs, matched_chunks_a,
    matched_chunks_b, n_chunks_a, n_chunks_b, containment_a,
    containment_b).
    """
    # the chunk shingle index feeds FOUR consumers (signatures, set
    # sizes, both verify-join sides); persisting it runs the
    # tokenize+chunk+shingle explode once instead of four times
    # (measured 9.4 s → expected ~1/2 at sf1.0). Same pattern as the
    # doc-level _resolve_idx; cache holds the index (ints + shingles),
    # never document text.
    hashed = _chunk_shingle_index(chunks, n).persist()
    sigs = hashed.groupBy("doc_id", "chunk_id").agg(*_minhash_agg_cols())
    bands = band_frame(sigs, keys=("doc_id", "chunk_id"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.chunk_id").alias("chunk_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.chunk_id").alias("chunk_b"),
        )
        .distinct()
    )
    sizes = hashed.groupBy("doc_id", "chunk_id").agg(
        F.count("*").cast("bigint").alias("set_size")
    )
    # verify-join key is xxhash64(shingle) — an 8-byte long instead of
    # the shingle string (same trade as ngram_jaccard_pairs: sizes and
    # candidates use true distinct sets; a 64-bit collision would need
    # two distinct shingles of ONE chunk pair to hash equal, P ≈ 2⁻⁶⁵
    # per pair)
    ha = hashed.select(
        F.col("doc_id").alias("doc_a"),
        F.col("chunk_id").alias("chunk_a"),
        F.xxhash64("shingle").alias("sh64"),
    )
    hb = hashed.select(
        F.col("doc_id").alias("doc_b"),
        F.col("chunk_id").alias("chunk_b"),
        F.xxhash64("shingle").alias("sh64"),
    )
    inter = (
        cand.join(ha, ["doc_a", "chunk_a"])
        .join(hb, ["doc_b", "chunk_b", "sh64"])
        .groupBy("doc_a", "chunk_a", "doc_b", "chunk_b")
        .agg(F.count("*").cast("bigint").alias("isect"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"),
        F.col("chunk_id").alias("chunk_a"),
        F.col("set_size").alias("size_a"),
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"),
        F.col("chunk_id").alias("chunk_b"),
        F.col("set_size").alias("size_b"),
    )
    cpairs = (
        inter.join(sa, ["doc_a", "chunk_a"])
        .join(sb, ["doc_b", "chunk_b"])
        .withColumn(
            "jaccard",
            F.round(
                F.col("isect")
                / (F.col("size_a") + F.col("size_b") - F.col("isect")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= chunk_threshold)
    )
    nch = chunks.select("doc_id", "n_chunks").distinct()
    agg = cpairs.groupBy("doc_a", "doc_b").agg(
        F.count("*").cast("bigint").alias("matched_pairs"),
        F.countDistinct("chunk_a").cast("bigint").alias("matched_chunks_a"),
        F.countDistinct("chunk_b").cast("bigint").alias("matched_chunks_b"),
    )
    return (
        agg.join(
            nch.select(
                F.col("doc_id").alias("doc_a"),
                F.col("n_chunks").alias("n_chunks_a"),
            ),
            "doc_a",
        )
        .join(
            nch.select(
                F.col("doc_id").alias("doc_b"),
                F.col("n_chunks").alias("n_chunks_b"),
            ),
            "doc_b",
        )
        .withColumn(
            "containment_a",
            F.round(F.col("matched_chunks_a") / F.col("n_chunks_a"), 6),
        )
        .withColumn(
            "containment_b",
            F.round(F.col("matched_chunks_b") / F.col("n_chunks_b"), 6),
        )
        .filter(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= containment_threshold
        )
        .select(
            "doc_a",
            "doc_b",
            "matched_pairs",
            "matched_chunks_a",
            "matched_chunks_b",
            "n_chunks_a",
            "n_chunks_b",
            "containment_a",
            "containment_b",
        )
    )


def window_hash_frame(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, h): xxhash64 of every k-token window, pos 1-based.

    The shared windowing of :func:`span_dedup` and the incremental
    span-window store (operators/incremental.py) — one definition so
    batch and incremental answers agree by construction. Empty for
    documents under k tokens (``sequence(1, 0)`` counts DOWN — guarded
    like functions.text.shingles).
    """
    tk = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    win_hashes = F.when(
        F.size(tk) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (k - 1)),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tk, i, k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return docs.select(
        "doc_id", F.posexplode(win_hashes).alias("idx", "h")
    ).select("doc_id", (F.col("idx") + 1).alias("pos"), "h")


#: empty accumulator for the span-merge fold (shared literal)
_EMPTY_SPANS = "CAST(array() AS array<struct<start:int,end:int>>)"


def merge_spans(spans_col) -> F.Column:
    """Merge a (start, end) struct array into maximal non-overlapping
    spans: sort, then a JVM array fold that extends the last span when
    the next one overlaps or is adjacent. Bounded by the input array —
    no shuffle, no Python."""
    return F.aggregate(
        F.array_sort(spans_col),
        F.expr(_EMPTY_SPANS),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (s["start"] <= F.element_at(acc, -1)["end"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["start"].alias("start"),
                        F.greatest(
                            F.element_at(acc, -1)["end"], s["end"]
                        ).alias("end"),
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def span_counts(spans_col) -> tuple[F.Column, F.Column]:
    """(span count, token count) for a merged-spans array — the single
    span-accounting definition shared by the batch operator, the
    incremental span store's pre-commit search, and the read-only
    probe, so a change to the adjacency rule or the width arithmetic
    cannot make their answers diverge."""
    return (
        F.size(spans_col).cast("bigint"),
        F.aggregate(
            spans_col,
            F.lit(0).cast("bigint"),
            lambda acc, s: acc + (s["end"] - s["start"] + 1),
        ),
    )


def span_dedup(docs: DataFrame, k: int = 10) -> DataFrame:
    """Exact duplicated-span removal — the substring-granularity dedup of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), re-expressed as a rolling-window inverted index instead of
    the paper's suffix array (which is inherently single-machine).

    Any ``k``-token window whose text occurs more than once in the corpus
    is a duplicated span; the globally-first occurrence (min (doc_id,
    position)) is the canonical one and survives, every other occurrence
    is removed from its document. Overlapping/adjacent removed windows
    merge into maximal spans, so a long verbatim quote is counted as ONE
    span, and the document text is reconstructed without the removed
    tokens.

    Returns one row per input document: (doc_id, n_tokens,
    spans_removed, tokens_removed, clean_text). ``clean_text`` is the
    whitespace-normalized reconstruction (``concat_ws`` over surviving
    tokens) for every row, so unaffected documents are byte-comparable
    with affected ones.

    Scale shape (100 TB framing): one position explode (the same
    O(corpus tokens) row count as every inverted-index pass here), then
    every shuffle carries 8-byte ``xxhash64`` window keys — the window
    TEXT never leaves the map side. Duplicate detection is a hash
    groupBy with partial aggregation; only duplicated windows (answer-
    proportional) flow into the per-document interval merge, which is a
    JVM array fold over that document's own removed windows. No
    driver-side state, no quadratic pair set — cost is O(tokens) +
    O(duplicated occurrences). Window equality is by 64-bit hash (the
    same accepted 2**-64 collision trade as the Jaccard verify keys).
    """
    tk = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    base = docs.select("doc_id", tk.alias("tk")).withColumn(
        "n_tokens", F.size("tk").cast("bigint")
    )
    # two consumers (the dup aggregate and the removed-join probe side)
    # read the O(corpus tokens) window explode — persist so the
    # tokenize+hash pass runs once, not twice (the _resolve_idx pattern)
    wins = window_hash_frame(docs, k).persist()
    # duplicated windows and their canonical (first) occurrence
    dup = (
        wins.groupBy("h")
        .agg(
            F.count("*").alias("occ"),
            F.min(F.struct("doc_id", "pos")).alias("canon"),
        )
        .filter(F.col("occ") > 1)
        .select("h", "canon")
    )
    removed = (
        wins.join(dup, "h")
        .filter(
            (F.col("doc_id") != F.col("canon.doc_id"))
            | (F.col("pos") != F.col("canon.pos"))
        )
        .select(
            "doc_id",
            F.col("pos").alias("start"),
            (F.col("pos") + (k - 1)).alias("end"),
        )
    )
    empty_spans = F.expr(_EMPTY_SPANS)
    merged = merge_spans(F.col("spans"))
    doc_spans = (
        removed.groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("start").cast("int").alias("start"),
                    F.col("end").cast("int").alias("end"),
                )
            ).alias("spans")
        )
        .select("doc_id", merged.alias("spans"))
    )
    out = base.join(doc_spans, "doc_id", "left").withColumn(
        "spans", F.coalesce("spans", empty_spans)
    )
    # removed 1-based positions, flattened; per-token membership test is
    # O(doc removed tokens) inside the JVM — no second shuffle
    removed_pos = F.flatten(
        F.transform(
            F.col("spans"), lambda s: F.sequence(s["start"], s["end"])
        )
    )
    n_spans, n_toks = span_counts(F.col("spans"))
    return out.select(
        "doc_id",
        "n_tokens",
        n_spans.alias("spans_removed"),
        n_toks.alias("tokens_removed"),
        F.concat_ws(
            " ",
            F.filter(
                F.col("tk"),
                lambda t, i: ~F.array_contains(removed_pos, i + 1),
            ),
        ).alias("clean_text"),
    )


def edit_distance_pairs(
    docs: DataFrame,
    n: int = 3,
    prefix_len: int = 96,
    max_dist: int = 16,
    idx: DataFrame | ShingleIndex | None = None,
) -> DataFrame:
    """Record-linkage tier: LSH-blocked candidates verified by BOUNDED
    edit distance — the classic entity-resolution shape (blocking pass
    + expensive pairwise verify), with Levenshtein as the verifier the
    set-based Jaccard/MinHash tiers cannot express (it sees
    transpositions, typos and small insertions as CLOSE even when the
    shingle sets diverge).

    Candidates come from the same 16-perm/4-band MinHash join as
    :func:`minhash_lsh_pairs` (never all-pairs); the verify compares
    ``prefix_len``-char text prefixes with Spark's thresholded
    ``levenshtein(l, r, max_dist)`` — O(prefix·max_dist) per pair and
    early-exits at the bound (returns -1), so a false candidate costs
    the band probe plus a capped scan, not a full O(L²) DP table.

    Returns ``(doc_a, doc_b, edit_distance)`` for candidate pairs with
    prefix distance ≤ ``max_dist``.
    """
    idx = _resolve_idx(idx, docs, n, None, "edit_distance_pairs")
    candidates = _lsh_candidates(idx)
    pfx = docs.select(
        "doc_id", F.substring(F.col("text"), 1, prefix_len).alias("pfx")
    )
    dist = F.levenshtein(F.col("pa"), F.col("pb"), max_dist)
    return (
        candidates.join(
            pfx.select(
                F.col("doc_id").alias("doc_a"), F.col("pfx").alias("pa")
            ),
            "doc_a",
        )
        .join(
            pfx.select(
                F.col("doc_id").alias("doc_b"), F.col("pfx").alias("pb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            dist.alias("edit_distance"),
        )
        .filter(
            (F.col("edit_distance") >= 0)
            & (F.col("edit_distance") <= max_dist)
        )
        .withColumn("edit_distance", F.col("edit_distance").cast("long"))
    )
