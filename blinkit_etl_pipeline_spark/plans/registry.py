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


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    out.update(parity.QUERIES)
    try:
        from . import northstar

        out.update(northstar.QUERIES)
    except ImportError:
        pass
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(parity.ORACLES)
    try:
        from . import northstar

        out.update(northstar.ORACLES)
    except ImportError:
        pass
    return out
