"""Invariant tests for batch 81: Mood's median vs a Counter replay,
Friedman vs scipy-free rank replay, Cox-Stuart vs explicit pairing,
Bartels RVN vs direct rank arithmetic."""

from __future__ import annotations

import math
from collections import defaultdict

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


def _avg_ranks_x2(values):
    """Doubled tie-averaged ranks, same identity the kernels use."""
    s = sorted(values)
    first = {}
    cnt = defaultdict(int)
    for i, v in enumerate(s):
        if v not in first:
            first[v] = i + 1
        cnt[v] += 1
    return [2 * first[v] + cnt[v] - 1 for v in values]  # 2*((first + last)/2)


def test_mood_median_replay(spark):
    rows = plans.REGISTRY["priority_value_mood_median"].build(spark, SF).collect()
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    cents = sorted(r["cents"] for r in o)
    n = len(cents)
    m = cents[(n + 1) // 2 - 1]
    per = defaultdict(lambda: [0, 0])  # n_i, a_i
    for r in o:
        per[r["o_orderpriority"]][0] += 1
        per[r["o_orderpriority"]][1] += 1 if r["cents"] > m else 0
    a_tot = sum(v[1] for v in per.values())
    assert len(rows) == len(per)
    chi2 = 0.0
    for r in rows:
        n_i, a_i = per[r["priority"]]
        exp_a = n_i * a_tot / n
        exp_b = n_i * (n - a_tot) / n
        contrib = (a_i - exp_a) ** 2 / exp_a + ((n_i - a_i) - exp_b) ** 2 / exp_b
        assert r["grand_median_cents"] == m
        assert r["n_orders"] == n_i
        assert r["n_above"] == a_i
        assert abs(r["exp_above"] - exp_a) < 1e-4
        assert abs(r["chi2_contrib"] - contrib) < 1e-4
        chi2 += contrib
    assert chi2 >= 0


def test_friedman_replay(spark):
    rows = plans.REGISTRY["weekday_block_friedman"].build(spark, SF).collect()
    daily = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(
            F.date_trunc("week", "o_orderdate").cast("date").alias("wk"),
            (F.weekday(F.col("o_orderdate").cast("date")) + 1).alias("dow"),
        )
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) as bigint)) DIV 100"
            ).alias("dollars")
        )
        .collect()
    )
    blocks = defaultdict(dict)
    for r in daily:
        blocks[r["wk"]][r["dow"]] = r["dollars"]
    full = {wk: d for wk, d in blocks.items() if len(d) == 7}
    n = len(full)
    r2sum = defaultdict(int)
    for d in full.values():
        dows = sorted(d)
        vals = [d[x] for x in dows]
        for dow, r2 in zip(dows, _avg_ranks_x2(vals)):
            r2sum[dow] += r2
    ss = sum(v * v for v in r2sum.values())
    chi2 = 3.0 * ss / (n * 7.0 * 8.0) - 3.0 * n * 8.0
    assert len(rows) == 7
    for r in rows:
        assert r["n_blocks"] == n
        assert r["rank_sum_x2"] == r2sum[r["weekday_iso"]]
        assert abs(r["mean_rank"] - r2sum[r["weekday_iso"]] / (2.0 * n)) < 1e-5
        assert abs(r["friedman_chi2"] - chi2) < 1e-3
    # mean ranks average to (k+1)/2 = 4
    assert abs(sum(r["mean_rank"] for r in rows) / 7 - 4.0) < 1e-6


def test_cox_stuart_replay(spark):
    row = plans.REGISTRY["weekly_revenue_cox_stuart"].build(spark, SF).collect()[0]
    d = _weekly(spark)
    n = len(d)
    c = (n + 1) // 2
    pairs = [(d[i], d[i + c]) for i in range(n // 2)]
    plus = sum(1 for x1, x2 in pairs if x2 > x1)
    minus = sum(1 for x1, x2 in pairs if x2 < x1)
    m = plus + minus
    z = (plus - m / 2.0) / math.sqrt(m / 4.0)
    assert row["n_weeks"] == n
    assert row["n_pairs"] == m
    assert row["n_plus"] == plus
    assert row["n_minus"] == minus
    assert abs(row["z_stat"] - z) < 1e-5


def test_bartels_replay(spark):
    row = plans.REGISTRY["weekly_revenue_bartels_rank"].build(spark, SF).collect()[0]
    d = _weekly(spark)
    n = len(d)
    r2 = _avg_ranks_x2(d)
    num4 = sum((r2[i] - r2[i + 1]) ** 2 for i in range(n - 1))
    den4 = sum((x - (n + 1)) ** 2 for x in r2)
    rvn = num4 / den4
    var = 4.0 * (n - 2) * (5.0 * n * n - 2.0 * n - 9.0) / (
        5.0 * n * (n + 1.0) * (n - 1.0) * (n - 1.0)
    )
    z = (rvn - 2.0) / math.sqrt(var)
    assert row["n_weeks"] == n
    assert abs(row["rvn"] - rvn) < 1e-5
    assert abs(row["z_stat"] - z) < 1e-4
    assert 0 < row["rvn"] < 4
