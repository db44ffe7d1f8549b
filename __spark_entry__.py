"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (sales fact → revenue-by-category →
customer metrics, the spine of the reference) on sf0.001.
``queries()`` / ``oracle_sql()`` — the engine's full query registry
(see ``blinkit_etl_pipeline_spark/plans/``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from blinkit_etl_pipeline_spark.plans import all_oracle_sql, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from blinkit_etl_pipeline_spark.plans.parity import q_customer_metrics

    return q_customer_metrics(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return all_oracle_sql()
