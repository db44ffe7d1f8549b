"""blinkit_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark implementation of the query and
data-processing capabilities of the reference ETL stack
(slinkytea10/Blinkit-ETL-Pipeline: AWS Glue PySpark jobs + Lambda
orchestration + Athena SQL), re-expressed Spark-first:

- DataFrame / Spark SQL logical plans, Catalyst + Tungsten execution,
  AQE for runtime re-planning.
- Explicit ``StructType`` schemas instead of ``inferSchema``.
- Deterministic dedup (window ``row_number``) instead of arbitrary-row
  ``dropDuplicates`` so results are oracle-reproducible.
- Structured Streaming file-source mode reproducing the reference's
  S3-event-driven incremental contract.

Layout:
  session.py    SparkSession factory (AQE, UTC, sane shuffle partitions)
  schemas.py    explicit schema registry (FIXTURES.md as code)
  sources/      readers (csv/parquet/literal dims, provenance), sinks,
                and the testdata semantic-mapping layer
  operators/    reusable operator library (clean/derive/joins/agg/text/
                dedup/similarity/multimodal)
  pipelines/    the five reference pipelines as pure functions
  plans/        query registry: name -> (spark_fn, duckdb_oracle_sql)
  sql/          dialect-normalized analytic queries
  streaming/    incremental file-source mode
  runner.py     event->job routing / orchestration
"""

__version__ = "0.1.0"
