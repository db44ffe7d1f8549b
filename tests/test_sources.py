"""Source surface: CSV explicit-schema reads (S1), provenance (S2),
filename demux (S3), literal dim (S4); sink hygiene (S5)."""

from __future__ import annotations

import glob as _glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blinkit_etl_pipeline_spark.sources import readers, sinks


def _write_inventory_csvs(tmp_path):
    old = tmp_path / "inventoryOld_jan.csv"
    new = tmp_path / "inventoryNew_jan.csv"
    old.write_text(
        "product_id,date,stock_received,damaged_stock\n"
        "p1,2024-01-01,100,3\np2,2024-01-01,50,1\n"
    )
    new.write_text(
        "product_id,date,stock_received,damaged_stock\n"
        "p1,2024-01-01,90,3\np3,2024-01-01,10,0\n"
    )
    return str(tmp_path / "*.csv")


def test_csv_explicit_schema_and_demux(spark, tmp_path):
    glob = _write_inventory_csvs(tmp_path)
    df = readers.read_csv(spark, glob, "inventory")
    # declared types, no inference pass
    assert df.schema["stock_received"].dataType == T.IntegerType()
    assert df.count() == 4

    tagged = readers.with_provenance(df)
    assert "source_file" in tagged.columns

    old, new = readers.demux_by_filename(tagged, "inventoryNew")
    assert old.count() == 2 and new.count() == 2
    assert "source_file" not in old.columns  # dropped post-demux (05:41,45)
    assert {r.product_id for r in old.collect()} == {"p1", "p2"}
    assert {r.product_id for r in new.collect()} == {"p1", "p3"}


def test_csv_compat_infer_matches_declared(spark, tmp_path):
    glob = _write_inventory_csvs(tmp_path)
    declared = readers.read_csv(spark, glob, "inventory")
    inferred = readers.read_csv(spark, glob, "inventory", compat_infer=True)
    assert inferred.count() == declared.count()
    # inference also lands on integer for these columns (compat mode)
    assert dict(inferred.dtypes)["stock_received"] in ("int", "bigint")


def test_literal_dimension(spark):
    dim = readers.rating_icons(spark)
    rows = {r.rating: r.rating_icon for r in dim.collect()}
    assert rows[1] == "⭐" and rows[5] == "⭐" * 5 and len(rows) == 5


def test_sink_bounds_file_size_and_sorts_row_groups(spark, tmp_path):
    """maxRecordsPerFile caps every output file; sortWithinPartitions
    clusters the sort key so parquet min/max stats become selective."""
    n = 10_000
    df = spark.range(n).select(
        (F.col("id") % 2 + 2020).cast("int").alias("year"),
        # pseudo-shuffled key: unsorted on input, sorted at the sink
        ((F.col("id") * 2654435761) % 997).cast("int").alias("k"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "sink")
    sinks.write_partitioned(
        df,
        path,
        partition_cols=("year",),
        max_records_per_file=1000,
        sort_cols=("k",),
    )
    files = _glob.glob(f"{path}/year=*/*.parquet")
    # 5000 rows per partition / 1000-cap => >= 5 files each, none above cap
    assert len(files) >= 10
    total = 0
    for f in files:
        t = pq.read_table(f, columns=["k"])
        assert t.num_rows <= 1000, f
        total += t.num_rows
        ks = t.column("k").to_pylist()
        assert ks == sorted(ks), f"unsorted row group in {f}"
    assert total == n


def test_jsonl_permissive_scan_quarantines_corrupt_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from blinkit_etl_pipeline_spark.sources import readers

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        "{not json at all}\n"
        '{"doc_id": 2, "text": "second"}\n'
        '{"doc_id": "not-a-number", "text": "type clash"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = readers.read_jsonl(spark, str(p), schema)
    clean, quarantine = readers.split_corrupt(df)
    assert sorted(map(tuple, clean.collect())) == [
        (1, "hello world"),
        (2, "second"),
    ]
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)
    assert any("not-a-number" in b for b in bad)


def test_parquet_schema_evolution_reads_unified(spark, tmp_path):
    """Appending files with an evolved schema (extra column) must stay
    readable: mergeSchema unifies the footer schemas and old rows
    surface NULL for the new column — the contract a long-lived
    curated table depends on across pipeline versions."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, v string"
    ).write.parquet(path)
    spark.createDataFrame(
        [(3, "c", 9.5)], "id bigint, v string, score double"
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[3]["score"] == 9.5
    assert merged.count() == 3


def test_bucketed_tables_join_and_agg_without_exchange(spark):
    """The ingest-once/shuffle-never contract: two tables bucketed on
    the join key sort-merge-join with ZERO Exchange, and a groupBy on
    the bucket key aggregates exchange-free too."""
    from blinkit_etl_pipeline_spark.sources.sinks import write_bucketed
    from blinkit_etl_pipeline_spark.sources.testdata import register_base

    from conftest import SF_SMOKE

    t = register_base(spark, SF_SMOKE)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the planner must choose SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(t["orders"], "bkt_orders", "o_orderkey", 8)
        write_bucketed(
            t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
            "bkt_lineitem", "o_orderkey", 8,
        )
        a = spark.table("bkt_orders")
        b = spark.table("bkt_lineitem")
        joined = a.join(b, "o_orderkey").select("o_orderkey", "l_quantity")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        # same rows as the plain parquet join
        expect = (
            t["orders"].join(
                t["lineitem"],
                t["orders"].o_orderkey == t["lineitem"].l_orderkey,
            ).count()
        )
        assert joined.count() == expect
        agg = spark.table("bkt_lineitem").groupBy("o_orderkey").count()
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan  # pre-clustered aggregation
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
