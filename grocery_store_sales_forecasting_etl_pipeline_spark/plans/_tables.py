"""Shared table loaders for registered queries.

``events.parquet`` carries TIMESTAMP(NANOS) which Spark 4 refuses to read
natively; we read nanos as long (runtime conf, safe for the other tables
which use ms/us timestamps) and rebuild a microsecond timestamp column —
matching DuckDB's own nanos→micros truncation when it hands rows to Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # integer DIV — float division loses precision above 2^53 ns
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
