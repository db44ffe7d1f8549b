"""Sources: CSV/parquet readers, file provenance, literal dimensions.

Reproduces the reference's source surface (SURVEY.md §2.1) Spark-first:

- S1: CSV glob scan — but with an **explicit schema** from
  ``schemas.RAW_SCHEMAS`` instead of ``inferSchema`` (which costs an
  extra full scan and risks type drift; reference ``01:35-48``).
- S2: file-provenance column (``input_file_name`` — reference ``05:31-37``).
- S3: multi-file demux by filename substring (reference ``05:39-45``).
- S4: literal in-memory dimension with explicit schema (reference
  ``03:54-70``): the rating→icon lookup, kept as a broadcast-join dim
  (deliberately NOT a UDF, preserving the reference's codegen-friendly
  pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas


def read_csv(spark: SparkSession, path: str, table: str, *, compat_infer: bool = False) -> DataFrame:
    """S1: header CSV scan with the declared schema for ``table``.

    ``compat_infer=True`` opts into the reference's inferSchema behavior
    (2× scan) for byte-compat experiments only.
    """
    reader = spark.read.option("header", "true")
    if compat_infer:
        return reader.option("inferSchema", "true").csv(path)
    return reader.schema(schemas.RAW_SCHEMAS[table]).csv(path)


def with_provenance(df: DataFrame, col: str = "source_file") -> DataFrame:
    """S2: append the source-file path to every row."""
    return df.withColumn(col, F.input_file_name())


def demux_by_filename(
    df: DataFrame, needle: str, col: str = "source_file"
) -> tuple[DataFrame, DataFrame]:
    """S3: split one provenance-tagged scan into (without, with) ``needle``.

    Mirrors the reference's old/new inventory demux
    (``~col("source_file").contains("inventoryNew")`` / positive twin).
    Both halves drop the provenance column, as the reference does (05:41,45).
    """
    without = df.filter(~F.col(col).contains(needle)).drop(col)
    withit = df.filter(F.col(col).contains(needle)).drop(col)
    return without, withit


RATING_ICON_SCHEMA = T.StructType(
    [
        T.StructField("rating", T.IntegerType()),
        T.StructField("rating_icon", T.StringType()),
    ]
)


def rating_icons(spark: SparkSession) -> DataFrame:
    """S4: the 5-row rating→icon literal dimension (reference 03:54-70)."""
    rows = [(i, "⭐" * i) for i in range(1, 6)]
    return spark.createDataFrame(rows, RATING_ICON_SCHEMA)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSONL scan with explicit schema and corrupt-record capture.

    At ingestion scale, malformed lines are a fact of life; FAILFAST
    kills a 6-hour job on row one and DROPMALFORMED silently loses
    data. PERMISSIVE with a named corrupt column keeps the job running
    AND auditable: bad lines surface as rows with every schema field
    NULL and the raw line in ``corrupt_col`` — route them to a
    quarantine sink, alert on the count (see `sources/metrics.py`),
    and keep going. The returned frame includes ``corrupt_col``; use
    :func:`split_corrupt` to partition clean/quarantine.
    """
    full = schema.add(T.StructField(corrupt_col, T.StringType()))
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantine_rows) from a
    PERMISSIVE scan. Quarantine keeps only the raw line — the payload a
    re-ingestion or bug report needs.

    The scan is cached first: Spark disallows querying ONLY the
    internal corrupt column from a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the column
    is populated during full-row parsing), and both halves read the
    same pass anyway, so one materialization serves both sinks.
    """
    df = df.cache()
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return clean, quarantine
