"""CLI: run pipelines, analytics, or any registry query.

    python -m blinkit_etl_pipeline_spark list
    python -m blinkit_etl_pipeline_spark run --file orders_2024.csv \
        --sf-dir /root/testdata/sf0.01 --out-dir /tmp/blinkit-out
    python -m blinkit_etl_pipeline_spark run-all --sf-dir ... --out-dir ...
    python -m blinkit_etl_pipeline_spark analytics --sf-dir ... --out-dir ...
    python -m blinkit_etl_pipeline_spark query ns_dedup_minhash_lsh \
        --sf-dir /root/testdata/sf0.01 --limit 20

The `run` form mirrors the reference's event entry point: the filename
routes to jobs (unrecognized → all), statuses are reported per job.
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_SF = "/root/testdata/sf0.01"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="blinkit_etl_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="route a new raw file to jobs (C1-C4)")
    run.add_argument("--file", required=True, help="raw filename to route")
    run.add_argument("--sf-dir", default=DEFAULT_SF)
    run.add_argument("--out-dir", required=True)

    runall = sub.add_parser("run-all", help="run every pipeline job")
    runall.add_argument("--sf-dir", default=DEFAULT_SF)
    runall.add_argument("--out-dir", required=True)

    ana = sub.add_parser("analytics", help="run jobs + the six analytic queries")
    ana.add_argument("--sf-dir", default=DEFAULT_SF)
    ana.add_argument("--out-dir", required=True)

    q = sub.add_parser("query", help="run one registry query and print rows")
    q.add_argument("name")
    q.add_argument("--sf-dir", default=DEFAULT_SF)
    q.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from .plans import all_queries

    if args.cmd == "list":
        for name in sorted(all_queries()):
            print(name)
        return 0

    from . import runner
    from .session import get_session

    spark = get_session("blinkit-cli")

    if args.cmd == "query":
        queries = all_queries()
        if args.name not in queries:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        queries[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
        return 0

    conf = runner.RunnerConfig(sf_dir=args.sf_dir, out_dir=args.out_dir)
    if args.cmd == "run":
        report = runner.handle_new_file(spark, conf, args.file)
    else:
        report = runner.run_jobs_sequential(spark, conf, list(runner.ALL_JOBS))

    print(
        json.dumps(
            {
                "overall": report.overall,
                "statuses": report.statuses,
                "row_counts": report.row_counts,
                "errors": report.errors,
            }
        )
    )
    if args.cmd == "analytics" and report.overall != "failed":
        for name, df in runner.run_analytics(spark).items():
            print(f"\n== {name} ==")
            df.show(20, truncate=False)
    return 0 if report.overall == "ok" else 1


if __name__ == "__main__":
    sys.exit(main())
