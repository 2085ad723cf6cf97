"""stream_scd2_to_table: foreachBatch CDC folding into an SCD2 history
table — stream result must equal the sequential batch application of
scd2_apply_changes, and a full replay must be a no-op."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
import pytest

from grocery_store_sales_forecasting_etl_pipeline_spark.sources import maintenance
from grocery_store_sales_forecasting_etl_pipeline_spark.streaming import events as ev

SCHEMA = "custkey LONG, segment STRING, acctbal LONG"

# three change micro-batches (one file each):
#   b0: A, B appear            b1: A changes, C appears
#   b2: B re-sent unchanged (no-op) + C changes
BATCHES = [
    [(1, "BUILDING", 100), (2, "MACHINERY", 200)],
    [(1, "AUTOMOBILE", 100), (3, "HOUSEHOLD", 300)],
    [(2, "MACHINERY", 200), (3, "HOUSEHOLD", 350)],
]


@pytest.fixture()
def changes_dir(spark, tmp_path):
    d = tmp_path / "dim_changes"
    d.mkdir()
    for i, rows in enumerate(BATCHES):
        df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
        path = str(d / f"batch_{i}")
        df.write.mode("overwrite").parquet(path)
        # file-stream batch order follows modification time — space them
        # out so maxFilesPerTrigger=1 yields exactly one change set per
        # micro-batch in submission order
        now = time.time() + i * 10
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (now, now))
    return str(d)


def _expected_history(spark):
    """Sequential batch application — the semantics the stream must hit."""
    cur = None
    for version, rows in enumerate(BATCHES):
        batch = spark.createDataFrame(rows, SCHEMA)
        if cur is None:
            cur = batch.select(
                "*",
                F.lit(0).cast("long").alias("valid_from"),
                F.lit(None).cast("long").alias("valid_to"),
            )
        else:
            cur = maintenance.scd2_apply_changes(
                cur, batch, keys=["custkey"], version=version
            )
    return cur


def _drain(spark, changes_dir, table, cp):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{changes_dir}/batch_*")
    )
    ev.stream_scd2_to_table(
        spark, stream, table, keys=("custkey",), checkpoint_dir=cp
    )


def test_stream_scd2_matches_sequential_batch(spark, changes_dir, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS sscd2")
    table = "sscd2.dim_customer_hist"
    try:
        _drain(spark, changes_dir, table, str(tmp_path / "cp1"))
        got = _key(spark.table(table).collect())
        want = _key(_expected_history(spark).collect())
        assert got == want
        # semantic spot-checks: A closed at v1 and reopened; B never
        # closed (CDC no-op, not full-snapshot deletion); C closed at v2
        hist = {
            (r["custkey"], r["valid_from"]): r
            for r in spark.table(table).collect()
        }
        assert hist[(1, 0)]["valid_to"] == 1
        assert hist[(1, 1)]["valid_to"] is None
        assert hist[(2, 0)]["valid_to"] is None
        assert hist[(3, 1)]["valid_to"] == 2
        assert hist[(3, 2)]["acctbal"] == 350
    finally:
        spark.sql("DROP DATABASE sscd2 CASCADE")


def _key(rows):
    return sorted((tuple((v is None, v) for v in r) for r in map(tuple, rows)))


def test_stream_scd2_last_batch_replay_is_noop(spark, changes_dir, tmp_path):
    """Structured Streaming's at-least-once failure mode is re-delivery
    of the LAST batch (crash between the table write and the checkpoint
    commit) — re-applying that batch at the same version must leave the
    history byte-identical. (A FULL replay from a fresh checkpoint is
    deliberately NOT a no-op: re-applying OLD change sets on top of
    newer history re-versions it — SCD2 folds are ordered, unlike the
    last-writer-wins upsert sink.)"""
    spark.sql("CREATE DATABASE IF NOT EXISTS sscd2r")
    table = "sscd2r.dim_customer_hist"
    try:
        _drain(spark, changes_dir, table, str(tmp_path / "cp1"))
        first = _key(spark.table(table).collect())
        last = spark.createDataFrame(BATCHES[-1], SCHEMA)
        replayed = maintenance.scd2_apply_changes(
            spark.table(table), last, keys=["custkey"], version=len(BATCHES) - 1
        )
        assert _key(replayed.collect()) == first
    finally:
        spark.sql("DROP DATABASE sscd2r CASCADE")
