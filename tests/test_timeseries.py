"""Calendar gap fill / forward fill (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from grocery_store_sales_forecasting_etl_pipeline_spark.operators import timeseries as TS


def test_gap_fill_zero_and_ffill(spark):
    d = dt.date
    df = spark.createDataFrame(
        [
            (1, d(2020, 1, 1), 5, 10.0),
            (1, d(2020, 1, 4), 2, 12.0),  # 3-day gap before this
            (2, d(2020, 3, 1), 7, 99.0),  # different span entirely
        ],
        ["entity", "day", "n", "price"],
    )
    out = TS.gap_fill(df, ["entity"], "day", zero_fill=("n",), ffill=("price",))
    rows = {
        (r["entity"], r["day"]): (r["n"], r["price"]) for r in out.collect()
    }
    assert rows == {
        (1, d(2020, 1, 1)): (5, 10.0),
        (1, d(2020, 1, 2)): (0, 10.0),   # zero count, price carried forward
        (1, d(2020, 1, 3)): (0, 10.0),
        (1, d(2020, 1, 4)): (2, 12.0),
        (2, d(2020, 3, 1)): (7, 99.0),   # entity 2 span is just one day
    }


def test_entity_calendar_spans_are_per_entity(spark):
    d = dt.date
    df = spark.createDataFrame(
        [(1, d(2020, 1, 1)), (1, d(2020, 1, 3)), (2, d(2021, 6, 1))],
        ["entity", "day"],
    )
    cal = TS.entity_calendar(df, ["entity"], "day")
    got = sorted((r["entity"], r["day"]) for r in cal.collect())
    assert got == [
        (1, d(2020, 1, 1)), (1, d(2020, 1, 2)), (1, d(2020, 1, 3)),
        (2, d(2021, 6, 1)),
    ]
