"""Invariant tests for batch 44: Huber IRLS replayed as a python loop,
ridge checked against numpy's linear solve (and lambda=0 == OLS), the
inventory fold replayed as a literal week-by-week loop."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _weekly(spark, *aggs):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    monday = F.date_sub(
        F.col("l_shipdate").cast("date"),
        (F.dayofweek(F.col("l_shipdate").cast("date")) + F.lit(5)) % F.lit(7),
    )
    return li.groupBy(monday.alias("ws")).agg(*aggs).collect()


def test_huber_replays_as_python_irls(spark):
    row = plans.REGISTRY["huber_weekly_mean"].build(spark, SF).collect()[0]
    wk = _weekly(
        spark,
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("y"),
    )
    ys = [r["y"] for r in wk]
    n = len(ys)
    m = sum(ys) / n
    scale = math.sqrt((sum(y * y for y in ys) - sum(ys) ** 2 / n) / (n - 1))
    assert row["n_weeks"] == n
    assert abs(row["plain_mean"] - m) < 1e-2
    assert abs(row["scale"] - scale) < 1e-2
    c = 1.345
    for _ in range(5):
        ws = [1.0 if abs(y - m) <= c * scale else c * scale / abs(y - m) for y in ys]
        m = sum(w * y for w, y in zip(ws, ys)) / sum(ws)
    assert abs(row["huber_mean"] - m) < 1e-2
    # the robust location lives within the data range
    assert min(ys) <= row["huber_mean"] <= max(ys)


def test_ridge_lambda0_is_ols_and_matches_numpy(spark):
    rows = {
        r["ridge_lambda"]: r
        for r in plans.REGISTRY["ridge_trend_grid"].build(spark, SF).collect()
    }
    assert set(rows) == {0.0, 4.0, 16.0}
    wk = _weekly(
        spark,
        F.sum(F.round("l_quantity").cast("long")).alias("q"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("y"),
    )
    pts = sorted((r["ws"], r["q"], r["y"]) for r in wk)
    w0 = pts[0][0]
    X = np.array([[(p[0] - w0).days // 7, p[1]] for p in pts], dtype=float)
    y = np.array([p[2] for p in pts], dtype=float)
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    C = Xc.T @ Xc
    r = Xc.T @ yc
    for lam, row in rows.items():
        A = C + lam * (C[0, 0] + C[1, 1]) / 2 * np.eye(2)
        b = np.linalg.solve(A, r)
        assert abs(row["b_week"] - b[0]) < max(1e-3, abs(b[0]) * 1e-5), lam
        assert abs(row["b_qty"] - b[1]) < max(1e-3, abs(b[1]) * 1e-5), lam
        icept = y.mean() - b @ X.mean(axis=0)
        assert abs(row["intercept"] - icept) < max(1e-2, abs(icept) * 1e-5), lam
    # regularization shrinks the coefficient norm monotonically
    norms = [
        math.hypot(rows[l]["b_week"], rows[l]["b_qty"]) for l in (0.0, 4.0, 16.0)
    ]
    assert norms[0] >= norms[1] >= norms[2]


def test_inventory_sim_replays_week_by_week(spark):
    out = {
        r["partkey"]: r
        for r in plans.REGISTRY["inventory_fill_rate_sim"].build(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    monday = F.date_sub(
        F.col("l_shipdate").cast("date"),
        (F.dayofweek(F.col("l_shipdate").cast("date")) + F.lit(5)) % F.lit(7),
    )
    d = (
        li.groupBy(F.col("l_partkey").alias("pk"), monday.alias("ws"))
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("q"))
        .collect()
    )
    per: dict[int, dict] = {}
    for r in d:
        per.setdefault(r["pk"], {})[r["ws"]] = r["q"]
    checked = 0
    for pk, dem in per.items():
        weeks = sorted(dem)
        span = (weeks[-1] - weeks[0]).days // 7 + 1
        if span < 8:
            assert pk not in out
            continue
        total = sum(dem.values())
        qw = math.ceil(total / span)
        series = [
            dem.get(weeks[0] + __import__("datetime").timedelta(days=7 * i), 0)
            for i in range(span)
        ]
        stock, filled, lost, so = 2 * qw, 0, 0, 0
        for x in series:
            stock += qw
            f_ = min(stock, x)
            filled += f_
            lost += x - f_
            if x > stock:
                so += 1
            stock -= f_
        r = out[pk]
        assert r["span_weeks"] == span and r["total_demand"] == total
        assert r["q_weekly"] == qw
        assert r["filled_units"] == filled
        assert r["lost_units"] == lost
        assert r["n_stockout_weeks"] == so
        assert abs(r["fill_rate"] - filled / total) < 1e-5
        assert filled + lost == total  # conservation
        checked += 1
    assert checked > 50
