"""Invariant tests for batch 88: Taylor's law vs a numpy OLS replay,
robust profile vs sorted selection, tail asymmetry vs direct tails,
Chow vs explicit half regressions."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _weekly(spark):
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.date_trunc("week", "o_orderdate").cast("date").alias("w"))
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) as bigint)) DIV 100"
            ).alias("dollars")
        )
        .collect()
    )
    return [r["dollars"] for r in sorted(rows, key=lambda r: r["w"])]


def test_taylor_law_replay(spark):
    row = plans.REGISTRY["part_demand_taylor_law"].build(spark, SF).collect()[0]
    wk = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy(
            "l_partkey", F.date_trunc("week", "l_shipdate").cast("date").alias("w")
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .collect()
    )
    per = defaultdict(list)
    for r in wk:
        per[r["l_partkey"]].append(r["q"])
    xs, ys = [], []
    for qs in per.values():
        n = len(qs)
        if n < 8:
            continue
        m = sum(qs) / n
        var = (n * sum(q * q for q in qs) - sum(qs) ** 2) / (n * (n - 1))
        if var > 0:
            xs.append(math.log(m))
            ys.append(math.log(var))
    k = len(xs)
    slope, intercept = np.polyfit(xs, ys, 1)
    assert row["n_parts"] == k
    assert abs(row["taylor_exponent"] - slope) < 1e-3
    assert abs(row["taylor_intercept"] - intercept) < 1e-3
    # synthetic generator draws qty i.i.d. per line, so the exponent
    # lands well below the b in [1, 2] band real demand shows
    assert 0 < row["taylor_exponent"] < 2.5


def test_robust_profile_replay(spark):
    rows = plans.REGISTRY["segment_robust_profile"].build(spark, SF).collect()
    raw = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_mktsegment",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    per = defaultdict(list)
    for r in raw:
        per[r["c_mktsegment"]].append(r["cents"])
    assert len(rows) == len(per)
    for r in rows:
        vals = sorted(per[r["segment"]])
        n = len(vals)
        q1 = vals[math.ceil(n / 4) - 1]
        q2 = vals[math.ceil(n / 2) - 1]
        q3 = vals[math.ceil(3 * n / 4) - 1]
        assert r["n_orders"] == n
        assert r["q1_cents"] == q1
        assert r["median_cents"] == q2
        assert r["q3_cents"] == q3
        assert abs(r["trimean_cents"] - (q1 + 2 * q2 + q3) / 4.0) < 0.051
        assert abs(r["midhinge_cents"] - (q1 + q3) / 2.0) < 0.051
        assert abs(r["quartile_cv"] - (q3 - q1) / (q3 + q1)) < 1e-5
        assert r["q1_cents"] <= r["median_cents"] <= r["q3_cents"]


def test_tail_asymmetry_replay(spark):
    row = plans.REGISTRY["weekly_change_tail_asymmetry"].build(spark, SF).collect()[0]
    w = _weekly(spark)
    ds = sorted(w[i] - w[i - 1] for i in range(1, len(w)))
    n = len(ds)
    # largest d with cum <= n/20 ; smallest d with (n - cum) < n/20
    lo_set = [d for i, d in enumerate(ds, 1) if 20 * i <= n]
    lo = max(lo_set)
    hi = min(d for i, d in enumerate(ds, 1) if 20 * (n - i) < n)
    left = [d for d in ds if d <= lo]
    right = [d for d in ds if d >= hi]
    es_l = -sum(left) / len(left)
    es_r = sum(right) / len(right)
    assert row["n_changes"] == n
    assert row["n_left_tail"] == len(left)
    assert row["n_right_tail"] == len(right)
    assert abs(row["es_left_dollars"] - es_l) < 0.051
    assert abs(row["es_right_dollars"] - es_r) < 0.051
    assert abs(row["tail_asymmetry"] - es_r / es_l) < 1e-4
    assert row["n_left_tail"] >= n // 20
    assert row["n_right_tail"] >= n // 20


def test_chow_replay(spark):
    row = plans.REGISTRY["weekly_trend_chow_test"].build(spark, SF).collect()[0]
    y = np.array(_weekly(spark), dtype=np.float64)
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)

    def ssr(tt, yy):
        k = len(tt)
        b = ((tt * yy).sum() - tt.sum() * yy.sum() / k) / (
            (tt * tt).sum() - tt.sum() ** 2 / k
        )
        a = (yy.sum() - b * tt.sum()) / k
        r = yy - a - b * tt
        return float((r * r).sum())

    h = n // 2
    ssr_full = ssr(t, y)
    ssr_split = ssr(t[:h], y[:h]) + ssr(t[h:], y[h:])
    f = ((ssr_full - ssr_split) / 2.0) / (ssr_split / (n - 4.0))
    assert row["n_weeks"] == n
    assert abs(row["ssr_full"] - ssr_full) < max(1.0, 1e-6 * ssr_full)
    assert abs(row["ssr_split"] - ssr_split) < max(1.0, 1e-6 * ssr_split)
    assert abs(row["chow_f"] - f) < 1e-3
    assert row["ssr_split"] <= row["ssr_full"] + 1e-6
