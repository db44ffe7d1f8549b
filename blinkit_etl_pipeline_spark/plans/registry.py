"""Central query registry: name -> Spark callable, name -> oracle SQL.

The driver contract (``__spark_entry__.py``) re-exports these. Queries
without an oracle entry (genuinely non-SQL-expressible ops: LSH dedup,
streaming, iterative) get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import parity

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver samples a subset of the registry per round, preferring
# earlier entries (insertion order).  Queries that have never received a
# driver-side CORRECTNESS row go first so the next sample attests them;
# everything else keeps its natural (parity-then-northstar) order.
PRIORITY = [
    # r4 additions, locally oracle-green but never driver-checked
    "ns_media_png",
    "ns_media_jpeg",
    "ns_media_video_frames",
    "ns_media_adpcm",
    "ns_media_phash_dedup",
    "ns_media_audio_fp_dedup",
    "ns_media_resize_exec",
    "ns_events_funnel",
    "ns_events_cohorts",
    "ns_events_moving_avg",
    "ns_sketch_hll_cumulative",
    # r5 additions
    "ns_media_gif",
    "ns_text_chunks",
    "ns_text_bm25",
    "ns_mix_sources",
    "ns_mix_temperature",
    "ns_ann_pq_topk",
    "ns_ann_pq_recall",
]


def _prioritized(items: dict) -> dict:
    front = {k: items[k] for k in PRIORITY if k in items}
    front.update({k: v for k, v in items.items() if k not in front})
    return front


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    out.update(parity.QUERIES)
    try:
        from . import northstar

        out.update(northstar.QUERIES)
    except ImportError:
        pass
    return _prioritized(out)


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(parity.ORACLES)
    try:
        from . import northstar

        out.update(northstar.ORACLES)
    except ImportError:
        pass
    return _prioritized(out)
