"""Ad-hoc oracle checker: ``python tools/check.py [names...]``.

Runs the named registry queries (default: all) through the local mirror
of the driver's correctness gate at $SPARK_GRAFT_TEST_SF (default
sf0.01). Exits non-zero on any failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blinkit_etl_pipeline_spark.oracle_check import compare_query  # noqa: E402
from blinkit_etl_pipeline_spark.plans import all_oracle_sql, all_queries  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    queries, oracles = all_queries(), all_oracle_sql()
    names = sys.argv[1:] or sorted(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    spark = get_session("blinkit-check")
    failed = 0
    for name in names:
        res = compare_query(spark, name, queries[name], oracles.get(name), sf_dir)
        print(res)
        failed += 0 if res.ok else 1
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
