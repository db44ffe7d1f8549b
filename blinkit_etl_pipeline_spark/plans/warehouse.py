"""Warehouse-modeling and sketch-set query surfaces (r7 second wave).

Same contract as :mod:`northstar`: ``QUERIES`` maps name -> Spark
callable, ``ORACLES`` maps name -> DuckDB SQL over the pre-registered
testdata views; column names/aliases match pairwise so the driver's
sorted-column value hash compares exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import register_base

QUERIES: dict = {}
ORACLES: dict = {}


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return register_base(spark, sf_dir)["events"]


# ---------------------------------------------------------------------------
# SCD Type-2 dimension build (ns_scd2_user_state)
# ---------------------------------------------------------------------------


def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of each user's observed state (the event
    feed's ``event_type`` as the tracked attribute): consecutive
    same-state observations compress, each surviving change opens a
    half-open ``[valid_from, valid_to)`` version. One shuffle on
    user_id; see operators/scd.py."""
    from ..operators import scd

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    return scd.scd2_build(ev, "user_id", "event_type", "ts", "event_id")


QUERIES["ns_scd2_user_state"] = q_scd2_user_state

ORACLES["ns_scd2_user_state"] = """WITH ord AS (
  SELECT user_id, event_type AS state, ts, event_id,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev
  FROM events),
chg AS (
  SELECT user_id, state, ts, event_id FROM ord
  WHERE prev IS NULL OR state <> prev)
SELECT user_id, state, ts AS valid_from, event_id AS opened_by,
  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS BIGINT) AS version,
  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
    AS is_current
FROM chg"""


# ---------------------------------------------------------------------------
# KMV theta-sketch set intersection (ns_sketch_kmv_overlap)
# ---------------------------------------------------------------------------


def q_sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between every pair of event types via KMV
    (k-minimum-values) theta sketches — distinct-set INTERSECTION
    estimates, the question HLL registers cannot answer. Exact
    intersection rides along as the error gauge. See
    operators/sketch.py::kmv_overlap."""
    from ..operators import sketch

    ev = _events(spark, sf_dir)
    out = sketch.kmv_overlap(ev, "event_type", "user_id")
    return out.orderBy("type_a", "type_b")


QUERIES["ns_sketch_kmv_overlap"] = q_sketch_kmv_overlap

_KMV_K = 256
_KMV_SPACE = 1 << 48
_KMV_EST = (
    f"CASE WHEN n < {_KMV_K} THEN n "
    f"ELSE ({_KMV_K - 1} * {_KMV_SPACE}) // mx END"
)

ORACLES["ns_sketch_kmv_overlap"] = f"""WITH dv AS (
  SELECT DISTINCT event_type AS g,
    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM events),
sk AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS r
  FROM dv QUALIFY r <= {_KMV_K}),
per AS (SELECT g, count(*) AS n, max(h) AS mx FROM sk GROUP BY g),
est_g AS (SELECT g, CAST({_KMV_EST} AS BIGINT) AS est FROM per),
pairs AS (
  SELECT a.g AS ga, b.g AS gb FROM per a, per b WHERE a.g < b.g),
u AS (
  SELECT ga, gb, h, max(fa) AS fa, max(fb) AS fb FROM (
    SELECT pairs.ga, pairs.gb, sk.h, 1 AS fa, 0 AS fb
    FROM pairs JOIN sk ON sk.g = pairs.ga
    UNION ALL
    SELECT pairs.ga, pairs.gb, sk.h, 0 AS fa, 1 AS fb
    FROM pairs JOIN sk ON sk.g = pairs.gb)
  GROUP BY ga, gb, h),
kept AS (
  SELECT ga, gb, h, fa, fb,
    row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS r
  FROM u QUALIFY r <= {_KMV_K}),
stats AS (
  SELECT ga, gb, count(*) AS n, max(h) AS mx,
    SUM(CASE WHEN fa = 1 AND fb = 1 THEN 1 ELSE 0 END) AS rho
  FROM kept GROUP BY ga, gb),
pair_est AS (
  SELECT ga, gb, CAST({_KMV_EST} AS BIGINT) AS est_union,
    CAST(CASE WHEN n < {_KMV_K} THEN rho
      ELSE rho * ((({_KMV_K - 1} * {_KMV_SPACE}) // mx) // {_KMV_K}) END
      AS BIGINT) AS est_inter
  FROM stats),
dvx AS (SELECT DISTINCT event_type AS g, user_id AS v FROM events),
exact AS (
  SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS exact_inter
  FROM dvx a JOIN dvx b ON a.v = b.v AND a.g < b.g
  GROUP BY a.g, b.g)
SELECT pair_est.ga AS type_a, pair_est.gb AS type_b,
  ea.est AS est_a, eb.est AS est_b, est_union, est_inter,
  COALESCE(exact.exact_inter, 0) AS exact_inter
FROM pair_est
JOIN est_g ea ON ea.g = pair_est.ga
JOIN est_g eb ON eb.g = pair_est.gb
LEFT JOIN exact ON exact.ga = pair_est.ga AND exact.gb = pair_est.gb
ORDER BY type_a, type_b"""


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM perplexity filter (ns_lm_kn_perplexity)
# ---------------------------------------------------------------------------


def q_lm_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram NLL filter — the KenLM smoothing
    real perplexity gates use (continuation probabilities instead of
    add-one mass). Same one-explode + model-equi-join shape as
    ns_lm_perplexity; see functions/lm.py::kn_nll_frame."""
    from ..functions import lm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lm.kn_nll_frame(docs)


QUERIES["ns_lm_kn_perplexity"] = q_lm_kn_perplexity


def _kn_oracle() -> str:
    from .northstar import _TOKS

    return f"""WITH {_TOKS},
bg AS (
  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk), 1)),
      i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS b
    FROM toks)),
occ AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf
  FROM bg GROUP BY doc_id, w1, w2),
cb AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS cb
  FROM occ GROUP BY w1, w2),
byw1 AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS ctx,
  CAST(count(*) AS BIGINT) AS n1 FROM cb GROUP BY w1),
nbt AS (SELECT w2, CAST(count(*) AS BIGINT) AS nb FROM cb GROUP BY w2),
btot AS (SELECT CAST(count(*) AS BIGINT) AS btypes FROM cb),
logp AS (SELECT cb.w1, cb.w2,
  CAST(ROUND(ln(CAST((4 * CAST(cb.cb AS HUGEINT) - 3) * btypes
      + 3 * CAST(byw1.n1 AS HUGEINT) * nbt.nb AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
  - CAST(ROUND(ln(CAST(4 * CAST(byw1.ctx AS HUGEINT) * btypes AS DOUBLE))
      * 1000000.0, 0) AS BIGINT) AS logp_q
  FROM cb JOIN byw1 ON cb.w1 = byw1.w1
  JOIN nbt ON cb.w2 = nbt.w2 CROSS JOIN btot),
per_doc AS (SELECT occ.doc_id,
  CAST(SUM(tf) AS BIGINT) AS n_bigrams,
  CAST(-SUM(tf * logp_q) AS BIGINT) AS kn_nll_q
  FROM occ JOIN logp ON occ.w1 = logp.w1 AND occ.w2 = logp.w2
  GROUP BY occ.doc_id),
scored AS (SELECT t.doc_id,
  COALESCE(p.n_bigrams, 0) AS n_bigrams,
  COALESCE(p.kn_nll_q, 0) AS kn_nll_q,
  CASE WHEN COALESCE(p.n_bigrams, 0) > 0
    THEN CAST(ROUND(CAST(p.kn_nll_q AS DOUBLE) / p.n_bigrams, 0) AS BIGINT)
    ELSE 0 END AS avg_q
  FROM toks t LEFT JOIN per_doc p ON t.doc_id = p.doc_id),
m AS (SELECT CAST(SUM(avg_q) AS DOUBLE) / count(*) AS mean_avg_q
  FROM scored WHERE n_bigrams > 0)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
  CAST(kn_nll_q AS BIGINT) AS kn_nll_q,
  ROUND(CAST(avg_q AS DOUBLE) / 1000000.0, 6) AS avg_kn_nll,
  (n_bigrams > 0 AND CAST(avg_q AS DOUBLE) > m.mean_avg_q) AS flagged
FROM scored CROSS JOIN m"""


ORACLES["ns_lm_kn_perplexity"] = _kn_oracle()


# ---------------------------------------------------------------------------
# LSH-blocked edit-distance matching (ns_dedup_edit_distance)
# ---------------------------------------------------------------------------

_EDIT_PFX = 96
_EDIT_MAX = 16


def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution tier: MinHash-banded candidate blocking +
    bounded-Levenshtein verify on 96-char prefixes (threshold arg
    early-exits the DP at the bound). The distance Jaccard tiers can't
    express; never all-pairs. See operators/dedup.py::
    edit_distance_pairs."""
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.edit_distance_pairs(
        docs, prefix_len=_EDIT_PFX, max_dist=_EDIT_MAX
    )


QUERIES["ns_dedup_edit_distance"] = q_dedup_edit_distance


def _edit_oracle() -> str:
    from .northstar import _MINHASH_CTES, _TOKS, _sh_cte

    return f"""WITH {_TOKS},
{_sh_cte(3)},
{_MINHASH_CTES},
pfx AS (SELECT doc_id, substr(text, 1, {_EDIT_PFX}) AS pfx FROM documents)
SELECT c.doc_a, c.doc_b,
  CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_distance
FROM cand c
JOIN pfx a ON c.doc_a = a.doc_id
JOIN pfx b ON c.doc_b = b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= {_EDIT_MAX}"""


ORACLES["ns_dedup_edit_distance"] = _edit_oracle()


# ---------------------------------------------------------------------------
# Differentially-private aggregate release (ns_privacy_dp_release)
# ---------------------------------------------------------------------------

_DP_CLIP = 1000


def q_privacy_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 Laplace release of per-(lang, source) document counts and
    clipped n_chars sums — the private-statistics twin of the k-anon
    gate. Noise is hash-derived (both engines draw the identical
    sample); see operators/privacy.py::dp_release."""
    from ..operators import privacy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return privacy.dp_release(
        docs, ["lang", "source"], "n_chars", _DP_CLIP, eps_inv=1
    )


QUERIES["ns_privacy_dp_release"] = q_privacy_dp_release


def _dp_noise_sql(seed_expr: str, b: int) -> str:
    n_const = (1 << 48) + 2
    lnq = "CAST(ROUND(ln(CAST({x} AS DOUBLE)) * 1000000.0, 0) AS BIGINT)"
    v = f"(('0x' || substr(md5({seed_expr}), 1, 12))::BIGINT + 1)"
    d = f"(2 * {v} - {n_const})"
    sign = f"(CASE WHEN {d} > 0 THEN -1 WHEN {d} < 0 THEN 1 ELSE 0 END)"
    m = f"({n_const} - ABS({d}))"
    return (
        f"({sign} * {b} * ({lnq.format(x=m)} - {lnq.format(x=n_const)}))"
    )


def _dp_oracle() -> str:
    def part(c: str) -> str:
        return (
            f"CASE WHEN {c} IS NULL THEN chr(0) "
            f"ELSE chr(1) || CAST({c} AS VARCHAR) END"
        )

    gkey = (
        f"'dp-v1' || chr(31) || {part('lang')} || chr(31) "
        f"|| {part('source')}"
    )
    noise_n = _dp_noise_sql(f"{gkey} || chr(31) || 'n'", 1)
    noise_s = _dp_noise_sql(f"{gkey} || chr(31) || 's'", _DP_CLIP)
    return f"""WITH agg AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
    CAST(SUM(LEAST(GREATEST(n_chars, 0), {_DP_CLIP})) AS BIGINT)
      AS clipped_sum
  FROM documents GROUP BY lang, source)
SELECT lang, source, n,
  ROUND(CAST(n * 1000000 + {noise_n} AS DOUBLE) / 1000000.0, 6) AS dp_n,
  ROUND(CAST(clipped_sum * 1000000 + {noise_s} AS DOUBLE) / 1000000.0, 6)
    AS dp_sum
FROM agg"""


ORACLES["ns_privacy_dp_release"] = _dp_oracle()


# ---------------------------------------------------------------------------
# Exact-integer k-means clustering (ns_cluster_kmeans)
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 3
_KM_DIM = 64


def q_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means on the integer lattice: the DuckDB
    oracle re-derives the ENTIRE training run (init, 3 update rounds,
    final assignment) and matches value-exact — clustering with the
    PageRank determinism discipline. One map pass + one k-row
    aggregate per round; see operators/cluster.py."""
    from ..operators import cluster

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cluster.kmeans_exact(emb, k=_KM_K, iters=_KM_ITERS, dim=_KM_DIM)


QUERIES["ns_cluster_kmeans"] = q_cluster_kmeans


def _kmeans_oracle(k: int = _KM_K, iters: int = _KM_ITERS,
                   dim: int = _KM_DIM) -> str:
    def assign(name: str, cent: str) -> str:
        return (
            f"{name} AS MATERIALIZED (SELECT vec_id, e, j, d FROM ("
            "SELECT *, row_number() OVER "
            "(PARTITION BY vec_id ORDER BY d, j) AS rn FROM ("
            f"SELECT eq.vec_id, eq.e, {cent}.j, "
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> (eq.e[i] - {cent}.c[i]) * (eq.e[i] - {cent}.c[i]))) AS d "
            f"FROM eq CROSS JOIN {cent})) WHERE rn = 1)"
        )

    ctes = [
        "eq AS MATERIALIZED (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(round(x::DOUBLE * 1000000.0) AS BIGINT)) AS e "
        "FROM embeddings)",
        "c0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 "
        f"AS j, e AS c FROM (SELECT vec_id, e FROM eq ORDER BY vec_id "
        f"LIMIT {k}))",
    ]
    cur = "c0"
    for t in range(iters):
        ctes.append(assign(f"a{t}", cur))
        ctes.append(
            f"s{t} AS (SELECT j, r.range AS i, SUM(e[r.range]) AS s, "
            f"count(*) AS n FROM a{t} CROSS JOIN range(1, {dim + 1}) r "
            "GROUP BY j, r.range)"
        )
        ctes.append(
            f"u{t} AS (SELECT j, list(s // n ORDER BY i) AS c FROM s{t} "
            "GROUP BY j)"
        )
        ctes.append(
            f"c{t + 1} AS MATERIALIZED (SELECT {cur}.j, "
            f"COALESCE(u{t}.c, {cur}.c) AS c FROM {cur} "
            f"LEFT JOIN u{t} USING (j))"
        )
        cur = f"c{t + 1}"
    ctes.append(assign("af", cur))
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT vec_id, CAST(j AS BIGINT) AS cluster, "
        "CAST(d AS BIGINT) AS dist_q FROM af"
    )


ORACLES["ns_cluster_kmeans"] = _kmeans_oracle()


# ---------------------------------------------------------------------------
# EWMA rate-anomaly detection (ns_events_ewma_anomaly)
# ---------------------------------------------------------------------------


def q_events_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-rate anomalies per type against a truncated-EWMA
    baseline (decay 3/4, 8 observed hours, exact integer weights — no
    division anywhere). See operators/events.py::ewma_anomaly."""
    from ..operators import events as EV

    return EV.ewma_anomaly(_events(spark, sf_dir))


QUERIES["ns_events_ewma_anomaly"] = q_events_ewma_anomaly


def _ewma_oracle() -> str:
    from ..operators.events import EWMA_DENOM, EWMA_WEIGHTS

    terms = " + ".join(
        f"lag(n, {i}) OVER w * {wt}"
        for i, wt in enumerate(EWMA_WEIGHTS, start=1)
    )
    return f"""WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
    CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)),
p AS (
  SELECT event_type, hour, n, CAST({terms} AS BIGINT) AS pred_q
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour))
SELECT event_type, hour, n, pred_q,
  CASE WHEN pred_q IS NULL THEN FALSE
    ELSE (n * {EWMA_DENOM} > 2 * pred_q
          OR 2 * n * {EWMA_DENOM} < pred_q) END AS anomaly
FROM p"""


ORACLES["ns_events_ewma_anomaly"] = _ewma_oracle()


# ---------------------------------------------------------------------------
# Point-in-time enrichment against the SCD2 dim (ns_scd2_pit_enrich)
# ---------------------------------------------------------------------------


def q_scd2_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reason SCD2 dims exist: enrich a fact stream with the
    dimension state AS OF each fact's timestamp. Purchases get the
    user's browsing state (SCD2 over the non-purchase feed) live at
    purchase time — half-open interval containment on an equi-keyed
    sort-merge join (the range conditions ride the user_id join);
    purchases before a user's first observation stay NULL (left)."""
    from ..operators import scd

    ev = _events(spark, sf_dir)
    dim = scd.scd2_build(
        ev.filter(F.col("event_type") != "purchase").select(
            "user_id", "event_type", "ts", "event_id"
        ),
        "user_id", "event_type", "ts", "event_id",
    )
    # same-lineage self join: alias both sides so column resolution is
    # positional-unambiguous (the raw frames share the events lineage)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .alias("p")
    )
    d = dim.alias("d")
    cond = (
        (F.col("p.user_id") == F.col("d.user_id"))
        & (F.col("d.valid_from") <= F.col("p.ts"))
        & (F.col("d.valid_to").isNull() | (F.col("d.valid_to") > F.col("p.ts")))
    )
    return p.join(d, cond, "left").select(
        F.col("p.event_id").alias("event_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.ts").alias("ts"),
        F.col("d.state").alias("state_at_purchase"),
    )


QUERIES["ns_scd2_pit_enrich"] = q_scd2_pit_enrich

ORACLES["ns_scd2_pit_enrich"] = """WITH np AS (
  SELECT user_id, event_type AS state, ts, event_id FROM events
  WHERE event_type <> 'purchase'),
ord AS (
  SELECT user_id, state, ts, event_id,
    lag(state) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM np),
chg AS (
  SELECT user_id, state, ts, event_id FROM ord
  WHERE prev IS NULL OR state <> prev),
dim AS (
  SELECT user_id, state, ts AS valid_from,
    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM chg)
SELECT p.event_id, p.user_id, p.ts, dim.state AS state_at_purchase
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
LEFT JOIN dim ON dim.user_id = p.user_id
  AND dim.valid_from <= p.ts
  AND (dim.valid_to IS NULL OR dim.valid_to > p.ts)"""


# ---------------------------------------------------------------------------
# Market-basket association lift (ns_basket_lift)
# ---------------------------------------------------------------------------


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-pair co-occurrence + exact-integer lift over order
    baskets — the reference domain's cross-sell analysis. Pair
    fan-out is per-basket, never corpus²; see
    operators/agg.py::basket_lift."""
    from ..operators.agg import basket_lift

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return basket_lift(li, min_support=2)


QUERIES["ns_basket_lift"] = q_basket_lift

ORACLES["ns_basket_lift"] = """WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
tot AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM li),
item AS (SELECT p, CAST(count(*) AS BIGINT) AS n_p FROM li GROUP BY p),
pairs AS (
  SELECT a.p AS part_a, b.p AS part_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= 2)
SELECT part_a, part_b, n_ab, na.n_p AS n_a, nb.n_p AS n_b,
  CAST((CAST(n_ab AS HUGEINT) * n_orders * 1000000)
       // (CAST(na.n_p AS HUGEINT) * nb.n_p) AS BIGINT)
    AS lift_ppm
FROM pairs
JOIN item na ON na.p = part_a
JOIN item nb ON nb.p = part_b
CROSS JOIN tot"""


# ---------------------------------------------------------------------------
# RFM segmentation via sketch quantiles (ns_customer_rfm)
# ---------------------------------------------------------------------------


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/frequency/monetary quartile scores per customer, with
    cutpoints from the 256-bin histogram sketch instead of a global
    ntile sort. See operators/agg.py::rfm_segments."""
    from ..operators.agg import rfm_segments

    return rfm_segments(spark.read.parquet(f"{sf_dir}/orders.parquet"))


QUERIES["ns_customer_rfm"] = q_customer_rfm


def _rfm_oracle() -> str:
    from ..operators.sketch import histogram_quantiles_sql

    def cuts(col: str) -> str:
        inner = histogram_quantiles_sql(
            "base", ["_g"], col, quantiles=(0.25, 0.5, 0.75)
        )
        return (
            f"cuts_{col} AS (SELECT _g, "
            f"MAX(CASE WHEN q = 0.25 THEN quantile_estimate END) AS _c25, "
            f"MAX(CASE WHEN q = 0.5 THEN quantile_estimate END) AS _c50, "
            f"MAX(CASE WHEN q = 0.75 THEN quantile_estimate END) AS _c75 "
            f"FROM ({inner}) GROUP BY _g)"
        )

    def band(col: str) -> str:
        return (
            f"(1 + CASE WHEN {col} > cuts_{col}._c25 THEN 1 ELSE 0 END"
            f" + CASE WHEN {col} > cuts_{col}._c50 THEN 1 ELSE 0 END"
            f" + CASE WHEN {col} > cuts_{col}._c75 THEN 1 ELSE 0 END)"
        )

    r = f"(5 - {band('recency_days')})"
    f_ = band("frequency")
    m = band("monetary_cents")
    return f"""WITH maxd AS (SELECT max(o_orderdate) AS d FROM orders),
base AS (
  SELECT o_custkey AS custkey,
    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
      CAST((SELECT d FROM maxd) AS DATE)) AS BIGINT) AS recency_days,
    CAST(count(*) AS BIGINT) AS frequency,
    CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS monetary_cents,
    0 AS _g
  FROM orders GROUP BY o_custkey),
{cuts('recency_days')},
{cuts('frequency')},
{cuts('monetary_cents')}
SELECT custkey, recency_days, frequency, monetary_cents,
  CAST({r} AS BIGINT) AS r_score,
  CAST({f_} AS BIGINT) AS f_score,
  CAST({m} AS BIGINT) AS m_score,
  CAST({r} * 100 + {f_} * 10 + {m} AS BIGINT) AS rfm_cell
FROM base
JOIN cuts_recency_days USING (_g)
JOIN cuts_frequency USING (_g)
JOIN cuts_monetary_cents USING (_g)"""


ORACLES["ns_customer_rfm"] = _rfm_oracle()


# ---------------------------------------------------------------------------
# Snapshot version diff over the MVCC SCD2 store (ns_snapshot_diff, r9)
# ---------------------------------------------------------------------------


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What did version 2 change? — row-level diff between two
    committed versions of the bucketed MVCC SCD2 dimension
    (operators/scd.py::scd2_apply_snapshot + operators/snapshot.py::
    snapshot_diff): bootstrap the dim from the pre-cutoff observation
    feed (v1), fold the post-cutoff batch (v2, touched buckets only —
    untouched buckets' files carried by reference), then diff.
    Manifest-level cancellation means the diff READS only the files
    unique to one version — the touched buckets — never the table;
    the oracle recomputes both dimension states in SQL and takes the
    multiset EXCEPT ALL both ways, so equality proves the pruned diff
    is exact. The store rebuilds in a per-SESSION scratch dir (keyed
    by Spark application id) that each invocation wipes before
    building — the returned frame reads the store lazily, so the dir
    can't be removed on return, but repeated bench runs (median-of-3
    + respots) now reuse one path instead of leaking a store per run
    (r9 ADVICE)."""
    import shutil
    import tempfile

    from ..operators import scd, snapshot

    obs = _events(spark, sf_dir).filter(F.col("user_id") % 4 == 0).select(
        "user_id", "event_type", "ts", "event_id"
    )
    cutoff = "2024-01-21 00:00:00"
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"snapdiff-{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(scratch, ignore_errors=True)
    table = os.path.join(scratch, "dim")
    scd.scd2_apply_snapshot(
        spark, table,
        obs.filter(F.col("ts") <= F.lit(cutoff).cast("timestamp")),
        "user_id", "event_type", "ts", "event_id", n_buckets=8,
    )
    scd.scd2_apply_snapshot(
        spark, table,
        obs.filter(F.col("ts") > F.lit(cutoff).cast("timestamp")),
        "user_id", "event_type", "ts", "event_id",
    )
    return snapshot.snapshot_diff(spark, table, 1, 2)


QUERIES["ns_snapshot_diff"] = q_snapshot_diff


def _scd2_sql(src: str) -> str:
    return f"""(
  SELECT user_id, state, ts AS valid_from, event_id AS opened_by,
    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS valid_to,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS BIGINT) AS version,
    (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
      AS is_current
  FROM (
    SELECT user_id, state, ts, event_id FROM (
      SELECT user_id, event_type AS state, ts, event_id,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev
      FROM {src})
    WHERE prev IS NULL OR state <> prev))"""


ORACLES["ns_snapshot_diff"] = f"""WITH obs AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE user_id % 4 = 0),
b1 AS (SELECT * FROM obs WHERE ts <= TIMESTAMP '2024-01-21 00:00:00'),
dim1 AS {_scd2_sql('b1')},
dim2 AS {_scd2_sql('obs')}
SELECT 'added' AS change, * FROM (
  SELECT * FROM dim2 EXCEPT ALL SELECT * FROM dim1)
UNION ALL
SELECT 'removed' AS change, * FROM (
  SELECT * FROM dim1 EXCEPT ALL SELECT * FROM dim2)"""


# ---------------------------------------------------------------------------
# SCD2 CDC-out change feed (ns_scd2_changes, r9)
# ---------------------------------------------------------------------------


def q_scd2_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed change feed between two dimension states (operators/
    scd.py::scd2_changes_frames — the derived Delta-CDF shape):
    multiset-diff the version rows of the pre-cutoff dim vs the full
    dim, then classify into insert / delete / update pre+post images
    by the version's opening identity. The store twin
    (scd2_changes over scd2_apply_snapshot versions) inherits
    manifest-level cancellation and is pytest-pinned equal."""
    from ..operators import scd

    obs = _events(spark, sf_dir).filter(F.col("user_id") % 4 == 0).select(
        "user_id", "event_type", "ts", "event_id"
    )
    cutoff = F.lit("2024-01-21 00:00:00").cast("timestamp")
    dim1 = scd.scd2_build(
        obs.filter(F.col("ts") <= cutoff),
        "user_id", "event_type", "ts", "event_id",
    )
    dim2 = scd.scd2_build(obs, "user_id", "event_type", "ts", "event_id")
    return scd.scd2_changes_frames(dim1, dim2, "user_id")


QUERIES["ns_scd2_changes"] = q_scd2_changes

_CHG_IDENT = (
    "p.user_id = x.user_id AND p.state = x.state AND "
    "p.valid_from = x.valid_from AND p.opened_by = x.opened_by"
)

ORACLES["ns_scd2_changes"] = f"""WITH obs AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE user_id % 4 = 0),
b1 AS (SELECT * FROM obs WHERE ts <= TIMESTAMP '2024-01-21 00:00:00'),
dim1 AS {_scd2_sql('b1')},
dim2 AS {_scd2_sql('obs')},
added AS (SELECT * FROM dim2 EXCEPT ALL SELECT * FROM dim1),
removed AS (SELECT * FROM dim1 EXCEPT ALL SELECT * FROM dim2),
paired AS (
  SELECT user_id, state, valid_from, opened_by FROM added
  INTERSECT
  SELECT user_id, state, valid_from, opened_by FROM removed)
SELECT 'insert' AS change_type, * FROM added x
  WHERE NOT EXISTS (SELECT 1 FROM paired p WHERE {_CHG_IDENT})
UNION ALL
SELECT 'delete', * FROM removed x
  WHERE NOT EXISTS (SELECT 1 FROM paired p WHERE {_CHG_IDENT})
UNION ALL
SELECT 'update_preimage', * FROM removed x
  WHERE EXISTS (SELECT 1 FROM paired p WHERE {_CHG_IDENT})
UNION ALL
SELECT 'update_postimage', * FROM added x
  WHERE EXISTS (SELECT 1 FROM paired p WHERE {_CHG_IDENT})"""


# ---------------------------------------------------------------------------
# r10: event-driven incremental curated tables (IA2–IA5, VERDICT r9 #1)
# ---------------------------------------------------------------------------
# Each gauge maintains one of the reference's implied curated tables
# through the IVM partial algebra (operators/curated.py): three insert
# delta slices + one delete slice retracting a time range fold to
# per-key quantized partials and merge; the oracle recomputes the same
# quantized aggregate DIRECTLY over the surviving rows — equality IS
# the maintenance proof (delta merge ≡ recompute), the ns_incr_revenue
# pattern. The persisted-store + file-router form is pytest-pinned
# (tests/test_streaming.py::test_curated_maintenance_routes_drops).

MKT_CUTOFF = "2024-01-21 00:00:00"
ORD_CUTOFF = "2000-01-01 00:00:00"
INV_CUTOFF = "2000-01-01"


def _curated_batches(src: DataFrame, split_col, delete_pred) -> list:
    """3 insert slices (hash split — merge is split-invariant) + 1
    delete slice; the source frame is a lazy-checkpoint leaf so the
    four consumers share one materialization (r8 gauge lesson)."""
    src = src.localCheckpoint(eager=False)
    batches = [
        src.filter(F.crc32(split_col.cast("string")) % 3 == b).withColumn(
            "__sign", F.lit(1)
        )
        for b in range(3)
    ]
    batches.append(src.filter(delete_pred).withColumn("__sign", F.lit(-1)))
    return batches


def q_incr_campaign_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IA2 maintained incrementally: per-day marketing KPI rows arrive
    in three hash-split insert drops, then post-cutoff days retract —
    the merged store view must equal the direct curated aggregate over
    surviving days (the oracle). All measures ride integer lattices
    (cents for money, 1e-6 for ratios), so the partial merge is
    batch-split/order invariant. At 100 TB a marketing file drop costs
    one map-side KPI pass over the drop + a store-grain merge."""
    from ..operators import curated
    from ..pipelines import marketing_roi
    from ..sources.testdata import register_blinkit

    t = register_blinkit(spark, sf_dir)
    kpis = marketing_roi.marketing_kpis(t["b_marketing"]).select(
        "campaign_id", "campaign_name", "channel", "date", "spend",
        "revenue_generated", "conversions", "ctr", "conversion_rate",
        "roas_calculated",
    )
    batches = _curated_batches(
        kpis,
        F.col("campaign_id"),
        F.col("date") > F.lit(MKT_CUTOFF).cast("timestamp"),
    )
    return curated.curated_delta_view("campaign_summary", batches)


QUERIES["ns_incr_campaign_summary"] = q_incr_campaign_summary


def _mkt_oracle() -> str:
    from ..sources.testdata import oracle_with_clause
    from .parity import MARKETING_KPIS_CTE

    return (
        oracle_with_clause("b_marketing")
        + ",\n"
        + MARKETING_KPIS_CTE
        + f""",
q AS (
  SELECT campaign_id, campaign_name, channel,
    CAST(ROUND(spend * 100, 0) AS BIGINT) AS sq,
    CAST(ROUND(revenue_generated * 100, 0) AS BIGINT) AS rq,
    CAST(conversions AS BIGINT) AS cv,
    CAST(ROUND(ctr * 1000000.0, 0) AS BIGINT) AS cq,
    CAST(ROUND(conversion_rate * 1000000.0, 0) AS BIGINT) AS vq,
    CAST(ROUND(roas_calculated * 1000000.0, 0) AS BIGINT) AS aq
  FROM marketing_kpis
  WHERE date <= TIMESTAMP '{MKT_CUTOFF}')
SELECT campaign_id, campaign_name, channel,
  ROUND(SUM(sq) / 100.0, 2) AS total_spend,
  ROUND(SUM(rq) / 100.0, 2) AS total_revenue,
  CAST(SUM(cv) AS BIGINT) AS total_conversions,
  ROUND(SUM(cq) / (1000000.0 * COUNT(*)), 4) AS avg_ctr,
  ROUND(SUM(vq) / (1000000.0 * COUNT(*)), 4) AS avg_conversion_rate,
  ROUND(SUM(aq) / (1000000.0 * COUNT(*)), 4) AS avg_roas,
  ROUND(CASE WHEN SUM(sq) > 0
        THEN (SUM(rq) - SUM(sq)) * 100.0 / SUM(sq)
        ELSE CAST(0 AS DOUBLE) END, 2) AS overall_roi
FROM q GROUP BY campaign_id, campaign_name, channel"""
    )


ORACLES["ns_incr_campaign_summary"] = _mkt_oracle()


def q_incr_delivery_partner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IA3 maintained incrementally: order rows (unique order_id — the
    slice contract) arrive in three insert drops, post-cutoff orders
    retract; store grain IS the output grain, so maintenance is one
    map-side quantize + partial sum per drop."""
    from ..operators import curated
    from ..sources.testdata import register_blinkit

    t = register_blinkit(spark, sf_dir)
    orders = t["b_orders"].select(
        "order_id", "delivery_partner_id", "order_date", "is_delayed",
        "delivery_time_hours", "distance_km",
    )
    batches = _curated_batches(
        orders,
        F.col("order_id"),
        F.col("order_date") > F.lit(ORD_CUTOFF).cast("timestamp_ntz"),
    )
    return curated.curated_delta_view("delivery_partner", batches)


QUERIES["ns_incr_delivery_partner"] = q_incr_delivery_partner


def _delivery_oracle() -> str:
    from ..sources.testdata import oracle_with_clause

    return (
        oracle_with_clause("b_orders")
        + f""",
q AS (
  SELECT delivery_partner_id,
    CAST(is_delayed AS BIGINT) AS dl,
    CAST(ROUND(delivery_time_hours * 1000000.0, 0) AS BIGINT) AS tq,
    CAST(ROUND(distance_km * 1000000.0, 0) AS BIGINT) AS dq
  FROM b_orders
  WHERE order_id IS NOT NULL AND delivery_partner_id IS NOT NULL
    AND order_date <= TIMESTAMP '{ORD_CUTOFF}')
SELECT delivery_partner_id,
  CAST(COUNT(*) AS BIGINT) AS total_deliveries,
  CAST(SUM(dl) AS BIGINT) AS delayed_deliveries,
  ROUND((SUM(dl) / COUNT(*)) * 100, 2) AS delay_percentage,
  ROUND(SUM(tq) / (1000000.0 * COUNT(*)), 2) AS avg_delivery_time,
  ROUND(SUM(dq) / (1000000.0 * COUNT(*)), 2) AS avg_distance
FROM q GROUP BY delivery_partner_id"""
    )


ORACLES["ns_incr_delivery_partner"] = _delivery_oracle()


def _recon_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipelines import inventory_recon
    from ..sources.testdata import register_blinkit

    t = register_blinkit(spark, sf_dir)
    return inventory_recon.reconcile(
        t["b_inventory_old"], t["b_inventory_new"], t["b_products"]
    ).select(
        "product_id", "product_name", "category", "date",
        "has_discrepancy", "severity_rank", "stock_variance",
        "damaged_variance", "financial_impact",
    )


def q_incr_category_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IA4 maintained incrementally — the COUNT(DISTINCT product_id)
    case: partials persist at the FINER (category, product_id) grain
    and the distinct count derives at read time as a count over live
    per-product groups (hierarchical cascade, the
    ns_incr_category_revenue precedent). The recon join partitions by
    (product_id, date), so a per-date-slice drop reconciles wholly
    within itself — the property that makes the event-driven
    decomposition exact."""
    from ..operators import curated

    recon = _recon_src(spark, sf_dir)
    batches = _curated_batches(
        recon,
        F.col("product_id"),
        F.col("date") > F.lit(INV_CUTOFF).cast("date"),
    )
    return curated.curated_delta_view("category_impact", batches)


QUERIES["ns_incr_category_impact"] = q_incr_category_impact


def _recon_oracle(body: str) -> str:
    from ..sources.testdata import oracle_with_clause
    from .parity import INVENTORY_RECON_CTE

    return (
        oracle_with_clause(
            "b_inventory_old", "b_inventory_new", "b_products"
        )
        + ",\n"
        + INVENTORY_RECON_CTE
        + body
    )


ORACLES["ns_incr_category_impact"] = _recon_oracle(
    f""",
q AS (
  SELECT category, product_id,
    CAST(ROUND(financial_impact * 100, 0) AS BIGINT) AS fq,
    CAST(stock_variance AS BIGINT) AS sv,
    CAST(damaged_variance AS BIGINT) AS dv
  FROM inventory_recon
  WHERE has_discrepancy = 1 AND date <= DATE '{INV_CUTOFF}'),
g1 AS (
  SELECT category, product_id, CAST(SUM(fq) AS BIGINT) AS fq,
    CAST(SUM(sv) AS BIGINT) AS sv, CAST(SUM(dv) AS BIGINT) AS dv,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM q GROUP BY category, product_id)
SELECT category,
  ROUND(SUM(fq) / 100.0, 2) AS total_impact,
  CAST(COUNT(*) AS BIGINT) AS affected_products,
  ROUND(SUM(sv) / SUM(n), 4) AS avg_stock_variance,
  ROUND(SUM(dv) / SUM(n), 4) AS avg_damaged_variance
FROM g1 GROUP BY category"""
)


def q_incr_product_discrepancies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IA5 maintained incrementally — the MAX(severity_rank) case:
    severity_rank lives IN the store key (count per distinct rank,
    the value-multiset min/max IVM fix), so the max over live ranks
    stays exact under retraction; fully-retracted ranks fold to count
    0 and vanish."""
    from ..operators import curated

    recon = _recon_src(spark, sf_dir)
    batches = _curated_batches(
        recon,
        F.col("product_id"),
        F.col("date") > F.lit(INV_CUTOFF).cast("date"),
    )
    return curated.curated_delta_view("product_discrepancies", batches)


QUERIES["ns_incr_product_discrepancies"] = q_incr_product_discrepancies

ORACLES["ns_incr_product_discrepancies"] = _recon_oracle(
    f""",
q AS (
  SELECT product_id, product_name, category, severity_rank,
    CAST(ROUND(financial_impact * 100, 0) AS BIGINT) AS fq,
    CAST(stock_variance AS BIGINT) AS sv,
    CAST(damaged_variance AS BIGINT) AS dv
  FROM inventory_recon
  WHERE has_discrepancy = 1 AND date <= DATE '{INV_CUTOFF}'),
g1 AS (
  SELECT product_id, product_name, category, severity_rank,
    CAST(SUM(fq) AS BIGINT) AS fq, CAST(SUM(sv) AS BIGINT) AS sv,
    CAST(SUM(dv) AS BIGINT) AS dv, CAST(COUNT(*) AS BIGINT) AS n
  FROM q GROUP BY product_id, product_name, category, severity_rank)
SELECT product_id, product_name, category,
  CAST(SUM(n) AS BIGINT) AS discrepancy_occurrences,
  CAST(SUM(sv) AS BIGINT) AS total_stock_variance,
  CAST(SUM(dv) AS BIGINT) AS total_damaged_variance,
  ROUND(SUM(fq) / 100.0, 2) AS total_impact,
  CASE MAX(severity_rank) WHEN 4 THEN 'Critical' WHEN 3 THEN 'High'
       WHEN 2 THEN 'Medium' WHEN 1 THEN 'Low' ELSE 'None'
  END AS max_severity
FROM g1 GROUP BY product_id, product_name, category"""
)

# ---------------------------------------------------------------------------
# r10 addendum: IA1 + area_feedback incremental twins — with these, every
# curated table the batch runner writes is IVM-maintained, and the
# runner's incremental mode (runner.handle_new_file_incremental) routes
# file drops through exactly these specs (pytest-pinned end-to-end in
# tests/test_curated_runner.py).
# ---------------------------------------------------------------------------

SALES_CUTOFF = "2000-01-01 00:00:00"
FB_CUTOFF = "2024-01-21 00:00:00"


def q_incr_sales_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IA1 maintained incrementally over the Blinkit sales fact — the
    double-COUNT(DISTINCT) case (orders AND customers): partials
    persist at the finer (category, customer, order) grain, both
    distincts derive from the read-time cascade (order_id functionally
    determines customer_id — agg.py:48). Three hash-split insert
    drops + a retraction of post-cutoff orders; the oracle recomputes
    the identical quantized cascade over survivors."""
    from ..operators import curated
    from ..pipelines import sales_revenue
    from ..sources.testdata import register_blinkit

    t = register_blinkit(spark, sf_dir)
    fact = sales_revenue.sales_fact(
        t["b_orders"], t["b_order_items"], t["b_products"]
    ).select(
        "category", "customer_id", "order_id", "order_date",
        "line_total", "profit_margin",
    )
    batches = _curated_batches(
        fact,
        F.col("order_id"),
        F.col("order_date") > F.lit(SALES_CUTOFF).cast("timestamp_ntz"),
    )
    return curated.curated_delta_view("revenue_by_category", batches)


QUERIES["ns_incr_sales_revenue"] = q_incr_sales_revenue


def _sales_oracle() -> str:
    from ..sources.testdata import oracle_with_clause
    from .parity import SALES_FACT_CTE

    return (
        oracle_with_clause("b_orders", "b_order_items", "b_products")
        + ",\n"
        + SALES_FACT_CTE
        + f""",
q AS (
  SELECT category, customer_id, order_id,
    CAST(ROUND(line_total * 100, 0) AS BIGINT) AS lq,
    CAST(ROUND(profit_margin * 100, 0) AS BIGINT) AS pq
  FROM sales_fact
  WHERE order_date <= TIMESTAMP '{SALES_CUTOFF}'),
g1 AS (
  SELECT category, customer_id, order_id,
    CAST(SUM(lq) AS BIGINT) AS lq, CAST(SUM(pq) AS BIGINT) AS pq
  FROM q GROUP BY category, customer_id, order_id),
g2 AS (
  SELECT category, customer_id, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(lq) AS BIGINT) AS lq, CAST(SUM(pq) AS BIGINT) AS pq
  FROM g1 GROUP BY category, customer_id)
SELECT category,
  CAST(SUM(n) AS BIGINT) AS total_orders,
  CAST(COUNT(*) AS BIGINT) AS unique_customers,
  ROUND(SUM(lq) / 100.0, 2) AS total_revenue,
  ROUND(SUM(pq) / 100.0, 2) AS total_profit,
  ROUND(SUM(lq) / (100.0 * SUM(n)), 2) AS avg_order_value
FROM g2 GROUP BY category"""
    )


ORACLES["ns_incr_sales_revenue"] = _sales_oracle()


def q_incr_area_feedback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feedback job's curated table maintained incrementally:
    enriched feedback rows (the SAME pipeline transform the batch job
    runs) arrive in three hash-split drops, post-cutoff feedback
    retracts. rating and sentiment_score are exact small ints, so the
    averages are exact int64-sum/count divisions — bit-identical to
    the batch AVG in both engines."""
    from ..operators import curated
    from ..pipelines import customer_feedback
    from ..sources import readers
    from ..sources.testdata import register_blinkit

    t = register_blinkit(spark, sf_dir)
    enriched = customer_feedback.enriched_feedback(
        t["b_feedback"], t["b_customers"], t["b_orders"],
        readers.rating_icons(spark),
    ).select(
        "feedback_id", "feedback_date", "area", "rating",
        "sentiment_normalized", "sentiment_score",
    )
    batches = _curated_batches(
        enriched,
        F.col("feedback_id"),
        F.col("feedback_date") > F.lit(FB_CUTOFF).cast("timestamp"),
    )
    return curated.curated_delta_view("area_feedback", batches)


QUERIES["ns_incr_area_feedback"] = q_incr_area_feedback


def _feedback_oracle() -> str:
    from ..sources.testdata import oracle_with_clause
    from .parity import ENRICHED_FEEDBACK_CTE, RATING_ICONS_CTE

    return (
        oracle_with_clause("b_feedback", "b_customers", "b_orders")
        + ",\n"
        + RATING_ICONS_CTE
        + ",\n"
        + ENRICHED_FEEDBACK_CTE
        + f""",
q AS (
  SELECT area, CAST(rating AS BIGINT) AS rating,
    CAST(sentiment_score AS BIGINT) AS score,
    CASE WHEN sentiment_normalized = 'Positive' THEN 1 ELSE 0 END AS pos,
    CASE WHEN sentiment_normalized = 'Negative' THEN 1 ELSE 0 END AS neg
  FROM enriched_feedback
  WHERE feedback_id IS NOT NULL
    AND feedback_date <= TIMESTAMP '{FB_CUTOFF}')
SELECT area,
  CAST(COUNT(*) AS BIGINT) AS total_feedback,
  CAST(SUM(rating) AS BIGINT) / COUNT(rating) AS avg_rating,
  CAST(SUM(pos) AS BIGINT) AS positive_count,
  CAST(SUM(neg) AS BIGINT) AS negative_count,
  CAST(SUM(score) AS BIGINT) / COUNT(*) AS avg_sentiment_score,
  CAST(SUM(pos) AS BIGINT) / COUNT(*) AS satisfaction_rate
FROM q GROUP BY area"""
    )


ORACLES["ns_incr_area_feedback"] = _feedback_oracle()


def q_incr_curated_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-OUT between two committed versions of a maintained curated
    table (operators/curated.py::curated_changes): marketing KPI rows
    land as two date-sliced drops into a scratch campaign_summary
    store (the store build IS the gauge), and the labeled diff between
    the post-drop versions answers "what did that drop change in the
    dashboard?" from two merge-on-read folds — never a base-table
    replay. The oracle recomputes both finalized views directly and
    EXCEPT ALLs them with the same labels (the scd2_changes pattern).
    """
    import shutil
    import tempfile

    from ..operators import curated
    from ..pipelines import marketing_roi
    from ..sources.testdata import register_blinkit

    t = register_blinkit(spark, sf_dir)
    kpis = marketing_roi.marketing_kpis(t["b_marketing"]).select(
        "campaign_id", "campaign_name", "channel", "date", "spend",
        "revenue_generated", "conversions", "ctr", "conversion_rate",
        "roas_calculated",
    ).localCheckpoint(eager=False)
    cutoff = F.lit(MKT_CUTOFF).cast("timestamp")
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"curatedcdc-{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(scratch, ignore_errors=True)
    store = os.path.join(scratch, "campaign_summary")
    v1 = curated.ingest_curated_deltas(
        spark, store, "campaign_summary",
        kpis.filter(F.col("date") <= cutoff), batch_id="drop-1",
    )
    v2 = curated.ingest_curated_deltas(
        spark, store, "campaign_summary",
        kpis.filter(F.col("date") > cutoff), batch_id="drop-2",
    )
    return curated.curated_changes(
        spark, store, "campaign_summary", v1, v2
    )


QUERIES["ns_incr_curated_cdc"] = q_incr_curated_cdc


def _campaign_view_sql(src: str) -> str:
    """The finalized campaign_summary view from quantized rows CTE
    ``src`` — the SELECT the incremental-campaign oracle uses, shared
    by both versions of the CDC diff."""
    return f"""SELECT campaign_id, campaign_name, channel,
  ROUND(SUM(sq) / 100.0, 2) AS total_spend,
  ROUND(SUM(rq) / 100.0, 2) AS total_revenue,
  CAST(SUM(cv) AS BIGINT) AS total_conversions,
  ROUND(SUM(cq) / (1000000.0 * COUNT(*)), 4) AS avg_ctr,
  ROUND(SUM(vq) / (1000000.0 * COUNT(*)), 4) AS avg_conversion_rate,
  ROUND(SUM(aq) / (1000000.0 * COUNT(*)), 4) AS avg_roas,
  ROUND(CASE WHEN SUM(sq) > 0
        THEN (SUM(rq) - SUM(sq)) * 100.0 / SUM(sq)
        ELSE CAST(0 AS DOUBLE) END, 2) AS overall_roi
FROM {src} GROUP BY campaign_id, campaign_name, channel"""


def _cdc_oracle() -> str:
    from ..sources.testdata import oracle_with_clause
    from .parity import MARKETING_KPIS_CTE

    return (
        oracle_with_clause("b_marketing")
        + ",\n"
        + MARKETING_KPIS_CTE
        + f""",
q AS (
  SELECT campaign_id, campaign_name, channel, date,
    CAST(ROUND(spend * 100, 0) AS BIGINT) AS sq,
    CAST(ROUND(revenue_generated * 100, 0) AS BIGINT) AS rq,
    CAST(conversions AS BIGINT) AS cv,
    CAST(ROUND(ctr * 1000000.0, 0) AS BIGINT) AS cq,
    CAST(ROUND(conversion_rate * 1000000.0, 0) AS BIGINT) AS vq,
    CAST(ROUND(roas_calculated * 1000000.0, 0) AS BIGINT) AS aq
  FROM marketing_kpis),
q1 AS (SELECT * FROM q WHERE date <= TIMESTAMP '{MKT_CUTOFF}'),
v1 AS ({_campaign_view_sql('q1')}),
v2 AS ({_campaign_view_sql('q')}),
added AS (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1),
removed AS (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2)
SELECT 'added' AS change, * FROM added
UNION ALL
SELECT 'removed', * FROM removed"""
    )


ORACLES["ns_incr_curated_cdc"] = _cdc_oracle()
