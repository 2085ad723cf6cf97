"""applyInPandasWithState operator: cross-batch state must produce the
same flags as a single-pass batch computation when batches arrive
time-ordered."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark.streaming import events as ev
from grocery_store_sales_forecasting_etl_pipeline_spark.streaming.stateful import (
    _score_batch,
    stateful_outliers,
)


def test_stateful_outliers_stream_equals_batch(spark, sf_smoke, tmp_path):
    import shutil
    import time
    from pathlib import Path

    # time-ordered multi-file stream (state must carry across batches)
    d = str(tmp_path / "stream")
    Path(d).mkdir()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_smoke}/events.parquet").orderBy("ts")
    rows = raw.collect()
    third = len(rows) // 3 + 1
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        if not chunk:
            continue
        tmp = str(tmp_path / f"part{i}")
        spark.createDataFrame(chunk, raw.schema).coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in Path(tmp).glob("*.parquet"):
            shutil.copy(str(f), f"{d}/chunk_{i}.parquet")
        time.sleep(1.1)

    stream = ev.stream_events(spark, d, max_files_per_trigger=1)
    q = (
        stateful_outliers(stream)
        .writeStream.format("memory")
        .queryName("outliers_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.event_id: (round(r.zscore, 6), r.is_outlier)
        for r in spark.table("outliers_out").collect()
    }

    # batch reference: one _score_batch pass per user over all events
    batch_events = (
        ev.normalize_ts(spark.read.schema(ev.raw_events_schema(spark, d)).parquet(d))
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
    )
    want = {}
    for _, g in batch_events.groupby("user_id"):
        out, *_ = _score_batch(g, 0, 0.0, 0.0)
        for _, r in out.iterrows():
            want[r.event_id] = (round(r.zscore, 6), bool(r.is_outlier))

    assert len(got) == len(want)
    mismatches = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. {list(mismatches.items())[:3]}"


def test_score_batch_flags_extremes():
    pdf = pd.DataFrame(
        {
            "user_id": [1] * 12,
            "event_id": range(12),
            "ts": pd.date_range("2024-01-01", periods=12, freq="min"),
            "value": [10.0, 10.1, 9.9, 10.0, 10.05, 9.95, 10.0, 10.1, 9.9, 10.0, 10.0, 500.0],
        }
    )
    out, n, mean, m2 = _score_batch(pdf, 0, 0.0, 0.0)
    assert bool(out.iloc[-1].is_outlier)
    assert not out.iloc[:-1].is_outlier.any()
    assert n == 12


def test_registered_batch_query_matches_welford_scorer(spark, sf_oracle):
    """The contract query (plans/streamops.py:stateful_outlier_scores,
    two-pass sufficient statistics) computes the same z-scores as the
    streaming operator's incremental Welford kernel — the analytic
    identity, checked to 1e-6 on every sf0.01 event."""
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.streamops import (
        stateful_outlier_scores,
    )

    got = {
        r.event_id: (round(r.zscore, 4), r.is_outlier == 1)
        for r in stateful_outlier_scores(spark, sf_oracle).collect()
    }

    events = (
        spark.read.parquet(f"{sf_oracle}/events.parquet")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
    )
    # the contract query quantizes to cents before scoring — mirror it
    events["value"] = (events["value"] * 100).round() / 100
    want = {}
    for _, g in events.groupby("user_id"):
        out, *_ = _score_batch(g, 0, 0.0, 0.0)
        for _, r in out.iterrows():
            want[r.event_id] = (r.zscore, bool(r.is_outlier))

    assert len(got) == len(want)
    bad = {
        k: (got[k], want[k])
        for k in want
        if abs(got[k][0] - round(want[k][0], 4)) > 1e-6 or got[k][1] != want[k][1]
    }
    assert not bad, f"{len(bad)} mismatches, e.g. {list(bad.items())[:3]}"
