"""Shared table loaders for registered queries.

``events.parquet``'s ``ts`` physical type has varied across driver data
generations: TIMESTAMP(NANOS) (which Spark 4 refuses to read natively —
we read nanos as long via the legacy conf and rebuild micros, matching
DuckDB's own nanos→micros truncation) and plain TIMESTAMP(MICROS)
without the UTC-adjusted flag (which Spark reads directly as
TIMESTAMP_NTZ). ``events()`` branches on the landed dtype so either
generation yields the same TIMESTAMP_NTZ column.
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
    # timestamp_micros produces TIMESTAMP (LTZ), and PySpark's collect
    # converts LTZ to Python datetimes via the PROCESS timezone — so a
    # driver running under TZ=America/New_York would see shifted wall
    # clocks while the oracle's naive timestamps never move. Pin the
    # session TZ to UTC and cast to TIMESTAMP_NTZ: the cast snapshots
    # the UTC wall clock into a TZ-independent type (NTZ collects
    # without any local-TZ conversion).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", _ts_as_ntz(df))


def _ts_as_ntz(df: DataFrame):
    """Normalize whatever physical type ``ts`` landed as to TIMESTAMP_NTZ
    (UTC session assumed pinned by the caller)."""
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        # nanos-as-long generation; integer DIV — float division loses
        # precision above 2^53 ns
        return F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
    return F.col("ts").cast("timestamp_ntz")
