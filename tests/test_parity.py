"""Every registered query must match its DuckDB oracle (driver gate mirror)."""

from __future__ import annotations

import pytest

from blinkit_etl_pipeline_spark.oracle_check import compare_query
from blinkit_etl_pipeline_spark.plans import all_oracle_sql, all_queries

from conftest import SF_CORRECTNESS

_QUERIES = all_queries()
_ORACLES = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, name):
    res = compare_query(
        spark, name, _QUERIES[name], _ORACLES.get(name), SF_CORRECTNESS
    )
    assert res.ok, str(res)
