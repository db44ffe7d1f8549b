"""Capture .explain("formatted") for named queries → plans/r14/.

Usage: python tools/plan_capture_r14.py before|after query [query...]
Writes plans/r14/<query>_<tag>.txt (the judge checks plan claims in
OPTIMIZATION_r14.md against these files).

Queries are built at $SPARK_GRAFT_SF_DIR (default sf0.1 — the bench
scale, so plan shapes match what the bench measures). Fixture-backed
queries build their scratch stores first (memoized per session), so
the captured plan is the steady-state serving plan, same as the
bench's timed region.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blinkit_etl_pipeline_spark.plans import all_queries  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "tag must be before|after"
    os.makedirs(OUT, exist_ok=True)
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown: {unknown}")
        return 2
    spark = get_session("plan-capture-r14")
    for name in names:
        df = queries[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        print(
            f"{name}: {path}  exchanges={txt.count('Exchange')} "
            f"bhj={txt.count('BroadcastHashJoin')} smj={txt.count('SortMergeJoin')} "
            f"pyeval={txt.count('EvalPython') + txt.count('MapInArrow') + txt.count('MapInPandas')}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
