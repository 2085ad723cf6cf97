"""Bronze ingestion (reference bronze_ingestion.py.py:50-139).

Declares the six Kaggle-shaped source schemas verbatim (SURVEY.md §1) and
ingests each CSV to ``raw.<name>`` with corrupt-record quarantine to
``logs.quarantine`` — the OSS replacement for badRecordsPath (S3)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from grocery_store_sales_forecasting_etl_pipeline_spark.sources.csv_ingest import ingest_csv


def _s(*fields: tuple[str, type]) -> StructType:
    return StructType([StructField(n, t(), True) for n, t in fields])


# reference bronze_ingestion.py.py:52-91 (schemas are load-bearing: dates
# arrive as strings and are parsed downstream)
STORES_SCHEMA = _s(
    ("store_nbr", IntegerType),
    ("city", StringType),
    ("state", StringType),
    ("type", StringType),
    ("cluster", IntegerType),
)
SAMPLE_SUBMISSION_SCHEMA = _s(("id", IntegerType), ("sales", DoubleType))
OIL_SCHEMA = _s(("date", StringType), ("dcoilwtico", DoubleType))
HOLIDAYS_EVENTS_SCHEMA = _s(
    ("date", StringType),
    ("type", StringType),
    ("locale", StringType),
    ("locale_name", StringType),
    ("description", StringType),
    ("transferred", StringType),
)
TRANSACTIONS_SCHEMA = _s(
    ("date", StringType),
    ("store_nbr", IntegerType),
    ("transactions", IntegerType),
)
TEST_SCHEMA = _s(
    ("id", IntegerType),
    ("date", StringType),
    ("store_nbr", IntegerType),
    ("family", StringType),
    ("onpromotion", IntegerType),
)

# (name, schema, partitioned-by-date) — reference bronze_ingestion.py.py:95-139
SOURCES: tuple[tuple[str, StructType, bool], ...] = (
    ("stores", STORES_SCHEMA, False),
    ("sample_submission", SAMPLE_SUBMISSION_SCHEMA, False),
    ("oil", OIL_SCHEMA, True),
    ("holidays_events", HOLIDAYS_EVENTS_SCHEMA, True),
    ("transactions", TRANSACTIONS_SCHEMA, True),
    ("test", TEST_SCHEMA, True),
)

QUARANTINE_TABLE = "logs.quarantine"

# natural key per source — what an incremental re-delivery upserts on.
# run_incremental uses partition_upsert ONLY when the partition column
# (date) is part of the key, so its key-stability contract holds by
# construction; key-without-date sources (test: keyed on id but
# date-partitioned) take merge_upsert instead — a corrected date there
# re-homes the row across partitions, which a partition-scoped rewrite
# would silently duplicate.
SOURCE_KEYS: dict[str, tuple[str, ...]] = {
    "stores": ("store_nbr",),
    "sample_submission": ("id",),
    "oil": ("date",),
    "holidays_events": ("date", "type", "locale", "locale_name", "description"),
    "transactions": ("date", "store_nbr"),
    "test": ("id",),
}


def run(spark: SparkSession, source_dir: str) -> dict[str, tuple[int, int]]:
    """Ingest every source CSV under ``source_dir`` (``<name>.csv``) to
    ``raw.<name>``. Returns {name: (clean_rows, quarantined_rows)}.
    Missing files raise (and are error-logged), matching the reference's
    fail-visibly behavior."""
    results = {}
    for name, schema, by_date in SOURCES:
        results[name] = ingest_csv(
            spark,
            path=f"{source_dir}/{name}.csv",
            schema=schema,
            table=f"raw.{name}",
            quarantine_table=QUARANTINE_TABLE,
            partition_by_date=by_date,
        )
    return results


def run_incremental(
    spark: SparkSession, source_dir: str, batch_date
) -> dict[str, tuple[int, int]]:
    """Ingest ONE daily folder ``<source_dir>/YYYY/MM/DD/<name>.csv``
    (docx §Source layout), upserting into the existing ``raw.*`` tables:

    - date-partitioned facts → ``partition_upsert`` keyed on the natural
      key (only the touched year/month partitions rewrite; a re-delivered
      batch replays idempotently and corrected values win)
    - dimensions → ``merge_upsert`` on the natural key
    - a source absent from the day's folder is skipped (sources deliver
      on their own cadence), unlike the full run where absence raises

    Returns {name: (rows_written, rows_quarantined)} for present
    sources, where rows_written counts rows PHYSICALLY WRITTEN by the
    branch taken — the whole post-merge table for ``merge_upsert`` (its
    portable path rewrites the table), only the affected partitions for
    ``partition_upsert``, the full initial load on table creation. It is
    a write-cost metric, not "rows changed". Local existence probe is an
    ``os.path`` check; on an object store this is the same single LIST
    the reader would do anyway.
    """
    import os

    from grocery_store_sales_forecasting_etl_pipeline_spark.sources import maintenance
    from grocery_store_sales_forecasting_etl_pipeline_spark.sources.csv_ingest import (
        prepare_clean,
    )

    day_dir = f"{source_dir}/{batch_date:%Y/%m/%d}"
    results: dict[str, tuple[int, int]] = {}
    for name, schema, by_date in SOURCES:
        path = f"{day_dir}/{name}.csv"
        if not os.path.exists(path):
            continue
        clean, n_q = prepare_clean(
            spark, path, schema, QUARANTINE_TABLE, partition_by_date=by_date
        )
        table = f"raw.{name}"
        keys = list(SOURCE_KEYS[name])
        if not spark.catalog.tableExists(table):
            w = clean.write.mode("overwrite").format("parquet")
            if by_date:
                w = w.partitionBy("year", "month")
            w.saveAsTable(table)
            n = spark.table(table).count()
        elif by_date and "date" in keys:
            # partition column in the key => keys can't move partitions
            n = maintenance.partition_upsert(
                spark, table, clean, keys=keys, partition_cols=("year", "month")
            )
        else:
            n = maintenance.merge_upsert(spark, table, clean, keys=keys)
        results[name] = (n, n_q)
    return results
