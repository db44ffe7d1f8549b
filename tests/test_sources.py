"""Source surface: CSV explicit-schema reads (S1), provenance (S2),
filename demux (S3), literal dim (S4)."""

from __future__ import annotations

from pyspark.sql import types as T

from blinkit_etl_pipeline_spark.sources import readers


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
