"""Local mirror of the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet, then compares row count, column names, and an
order-insensitive canonicalization of all values. Stricter than any
reasonable driver comparator (exact cell equality after canonical
string formatting), so passing here should imply passing the gate.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from .sources.testdata import BASE_TABLES


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        ts = pd.Timestamp(v)
        # DuckDB's fetchdf renders DATE as midnight datetime64; fold both
        # representations to the date form so the comparison is type-blind.
        if ts.tz is None and ts == ts.normalize():
            return ts.date().isoformat()
        return ts.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        s = "OK " if self.ok else "FAIL"
        msg = f"[{s}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for m in self.mismatches[:8]:
            msg += f"\n    {m}"
        return msg


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    import os
    import re

    if os.environ.get("SPARK_GRAFT_ORACLE_MATERIALIZE") == "1":
        # Beyond-contract-SF spot checks (sf1.0+): DuckDB 1.0 INLINES
        # every CTE reference, so the unrolled iterative oracles
        # (NN-descent rounds, beam walks) re-evaluate corpus-sized
        # subtrees multiplicatively — 60 GB spills at sf1.0 where the
        # hinted form runs in memory. `AS MATERIALIZED` is an
        # optimization fence, not a semantic change; the driver's own
        # gate still runs the unhinted text. WINDOW specs (`WINDOW w
        # AS (`) are excluded — only CTE bodies take the hint.
        sql = re.sub(r"(?<!WINDOW )\b(\w+ AS) \(", r"\1 MATERIALIZED (", sql)
    con = duckdb.connect()
    try:
        # Spill guard: beyond-contract-SF oracle replays (sf1.0 spot
        # checks) can spill heavily when DuckDB inlines a multiply-
        # referenced CTE; fail loudly instead of filling the disk.
        con.execute(
            "SET max_temp_directory_size = "
            f"'{os.environ.get('SPARK_GRAFT_ORACLE_TEMP_CAP', '24GB')}'"
        )
        for t in BASE_TABLES:
            path = f"{sf_dir}/{t}.parquet"
            # driver testdata ships single files; Spark-written scale
            # corpora (tools/scale_testdata.py) are directories of parts
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def compare_query(
    spark: SparkSession, name: str, fn, oracle: str | None, sf_dir: str
) -> CompareResult:
    sdf = fn(spark, sf_dir).toPandas()
    res = CompareResult(name=name, ok=True, spark_rows=len(sdf))
    if oracle is None:
        res.oracle_rows = -1
        if len(sdf) == 0:
            res.ok = False
            res.mismatches.append("rows-only check: 0 rows")
        return res
    odf = duckdb_run(oracle, sf_dir)
    res.oracle_rows = len(odf)

    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        res.ok = False
        res.mismatches.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return res
    if len(sdf) != len(odf):
        res.ok = False
        res.mismatches.append("row count differs")
        return res

    s_rows, o_rows = canonicalize(sdf), canonicalize(odf)
    if s_rows != o_rows:
        res.ok = False
        diffs = 0
        for a, b in zip(s_rows, o_rows):
            if a != b:
                res.mismatches.append(f"spark : {a}\n    oracle: {b}")
                diffs += 1
                if diffs >= 5:
                    break
    return res
