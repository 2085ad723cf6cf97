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


def test_holt_winters_replays_in_python(spark):
    """The HW fold (alpha=beta=gamma=0.5, m=4) replays exactly in pure
    Python over the same ordered weekly series, including the seasonal
    rotation and the first-season initialization."""
    from grocery_store_sales_forecasting_etl_pipeline_spark import plans

    SF = "/root/testdata/sf0.01"
    rows = {r["suppkey"]: r for r in plans.REGISTRY["forecast_holt_winters"].build(spark, SF).collect()}
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    import datetime as dt

    series: dict[int, dict[tuple, int]] = {}
    for l in li:
        d = l["l_shipdate"].date() if isinstance(l["l_shipdate"], dt.datetime) else l["l_shipdate"]
        iso = d.isocalendar()
        k = (iso[0], iso[1])
        s = series.setdefault(l["l_suppkey"], {})
        s[k] = s.get(k, 0) + int(round(l["l_quantity"]))
    checked = 0
    for sk, weeks in series.items():
        ys = [float(v) for _, v in sorted(weeks.items())]
        if len(ys) < 12:
            assert sk not in rows
            continue
        m0 = (ys[0] + ys[1] + ys[2] + ys[3]) / 4.0
        lev, tr = m0, 0.0
        seas = [ys[0] - m0, ys[1] - m0, ys[2] - m0, ys[3] - m0]
        for x in ys[4:]:
            s0 = seas.pop(0)
            new_lev = (x - s0) * 0.5 + (lev + tr) * 0.5
            new_tr = (new_lev - lev) * 0.5 + tr * 0.5
            seas.append((x - new_lev) * 0.5 + s0 * 0.5)
            lev, tr = new_lev, new_tr
        r = rows[sk]
        assert r["n_weeks"] == len(ys)
        assert abs(r["hw_level"] - round(lev, 6)) < 1e-9
        assert abs(r["hw_trend"] - round(tr, 6)) < 1e-9
        assert abs(r["hw_seasonal_next"] - round(seas[0], 6)) < 1e-9
        assert abs(r["hw_forecast"] - round(lev + tr + seas[0], 6)) < 1e-9
        checked += 1
    assert checked == len(rows)
