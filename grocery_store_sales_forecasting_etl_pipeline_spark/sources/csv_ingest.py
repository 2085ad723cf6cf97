"""CSV → bronze ingestion with corrupt-record quarantine
(reference bronze_ingestion.py.py:12-46, S1-S4).

The reference relies on Databricks-only ``badRecordsPath``; OSS Spark
re-expresses it (SURVEY.md §2.1 S3): read PERMISSIVE with a
``_corrupt_record`` column, split the frame — clean rows to the bronze
table, corrupt raw lines to a quarantine table — in one scan each
(the split is two filters over the same cached read).

Scale notes: schema is always explicit (never inferSchema — that is a
full extra pass over 100 TB); the per-file loop matches the reference's
one-job-per-source shape but each job is itself fully parallel over the
file's splits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from grocery_store_sales_forecasting_etl_pipeline_spark.sources.error_log import log_error

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_capture(schema: StructType) -> StructType:
    if any(f.name == CORRUPT_COL for f in schema.fields):
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])


def read_csv_permissive(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S1+S2+S4: header CSV with explicit schema, corrupt-record capture,
    and source-file lineage column."""
    return (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(_with_corrupt_capture(schema))
        .csv(path)
        .withColumn("source_file", F.col("_metadata.file_path"))
    )


def prepare_clean(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine_table: str | None = None,
    partition_by_date: bool = False,
    stage: str = "bronze_ingestion",
) -> tuple[DataFrame, int]:
    """Read + quarantine-split WITHOUT writing the clean side: returns
    ``(clean_df, n_quarantined)`` for callers that route clean rows into
    an upsert instead of an overwrite (the incremental daily-batch path,
    ``pipeline/bronze.run_incremental``).

    The read is cached only across the quarantine count/write (Spark
    rejects corrupt-column-only queries on an uncached CSV read —
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) and unpersisted
    before returning: the clean frame recomputes from the file when the
    caller's upsert materializes it, so no cache entry outlives this call
    in a long-running orchestrator. Daily batches are small by
    construction; the second scan is the right trade.
    """
    try:
        df = read_csv_permissive(spark, path, schema).cache()
        corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
            F.col(CORRUPT_COL).alias("raw_record"),
            F.col("source_file"),
            F.current_timestamp().alias("quarantined_at"),
            F.lit(stage).alias("stage"),
        )
        n_quarantined = 0
        try:
            if quarantine_table is not None:
                n_quarantined = corrupt.count()
                if n_quarantined:
                    corrupt.write.mode("append").saveAsTable(quarantine_table)
        finally:
            df.unpersist()
        clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        if partition_by_date and "date" in clean.columns:
            clean = (
                clean.withColumn("date", F.to_date(F.col("date").cast("string"), "yyyy-MM-dd"))
                .withColumn("year", F.year("date"))
                .withColumn("month", F.month("date"))
            )
        return clean, n_quarantined
    except Exception as exc:  # noqa: BLE001 — reference logs then re-raises any failure
        log_error(spark, str(exc), stage=stage, source_file=path)
        raise


def ingest_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    table: str,
    quarantine_table: str | None = None,
    partition_by_date: bool = False,
    stage: str = "bronze_ingestion",
) -> tuple[int, int]:
    """Reference ``load_to_bronze`` (bronze_ingestion.py.py:12-46) with
    OSS quarantine. Returns (clean_rows, quarantined_rows).

    - clean rows → overwrite ``table`` (partitioned by year/month when a
      date column exists and ``partition_by_date``)
    - corrupt rows (raw line + source file + timestamp) → append
      ``quarantine_table``
    - any failure → structured row in logs.etl_errors, then re-raise
      (reference bronze_ingestion.py.py:32-46)
    """
    try:
        df = read_csv_permissive(spark, path, schema)
        # cache: the clean/corrupt split reads the file once, not twice
        df = df.cache()
        corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
            F.col(CORRUPT_COL).alias("raw_record"),
            F.col("source_file"),
            F.current_timestamp().alias("quarantined_at"),
            F.lit(stage).alias("stage"),
        )
        clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)

        n_quarantined = 0
        if quarantine_table is not None:
            n_quarantined = corrupt.count()
            if n_quarantined:
                corrupt.write.mode("append").saveAsTable(quarantine_table)

        writer = clean.write.mode("overwrite")
        if partition_by_date and "date" in clean.columns:
            clean = (
                clean.withColumn("date", F.to_date(F.col("date").cast("string"), "yyyy-MM-dd"))
                .withColumn("year", F.year("date"))
                .withColumn("month", F.month("date"))
            )
            writer = clean.write.mode("overwrite").partitionBy("year", "month")
        writer.format("parquet").saveAsTable(table)
        n_clean = spark.table(table).count()
        df.unpersist()
        return n_clean, n_quarantined
    except Exception as exc:  # noqa: BLE001 — reference logs then re-raises any failure
        log_error(spark, str(exc), stage=stage, source_file=path)
        raise
