"""Invariant tests for batch 64: Mann-Kendall vs a python pair fold,
Kruskal-Wallis vs scipy-free rank replay, Gumbel moments vs statistics
module, and higher moments vs exact python power sums."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _weekly_dollars(spark):
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.date_trunc("week", "o_orderdate").cast("date").alias("w"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("w")
        .agg(F.expr("sum(cents) DIV 100").alias("dollars"))
        .collect()
    )
    return sorted((r["w"], r["dollars"]) for r in rows)


def test_mann_kendall_replay(spark):
    row = plans.REGISTRY["weekly_revenue_mann_kendall"].build(spark, SF).collect()[0]
    xs = [d for _, d in _weekly_dollars(spark)]
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(xs)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    cc = 1 if s > 0 else (-1 if s < 0 else 0)
    assert row["n_weeks"] == n and row["s_stat"] == s
    assert int(row["tie_term"]) == tie_term
    assert abs(row["mk_tau"] - s / (n * (n - 1) / 2)) < 1e-6
    assert abs(row["z_stat"] - (s - cc) / math.sqrt(var_s)) < 1e-3
    assert -1 <= row["mk_tau"] <= 1


def test_kruskal_wallis_replay(spark):
    rows = plans.REGISTRY["priority_price_kruskal_wallis"].build(spark, SF).collect()
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.col("o_orderpriority").alias("p"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    vals = sorted(r["c"] for r in o)
    n = len(vals)
    # midrank per value (doubled): 2*cum_before + t + 1
    from collections import Counter

    cnt = Counter(vals)
    r2 = {}
    cum = 0
    for v in sorted(cnt):
        r2[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    groups: dict = {}
    for r in o:
        groups.setdefault(r["p"], []).append(r["c"])
    s_r2 = 0.0
    for row in rows:
        g = groups[row["prio"]]
        r2_sum = sum(r2[v] for v in g)
        assert row["n_j"] == len(g)
        assert int(row["r2_sum"]) == r2_sum
        assert abs(row["mean_midrank"] - r2_sum / (2 * len(g))) < 0.02
        s_r2 += r2_sum * r2_sum / len(g)
    h = 3.0 / (n * (n + 1)) * s_r2 - 3.0 * (n + 1)
    tie_sum = sum(t**3 - t for t in cnt.values())
    h_adj = h / (1.0 - tie_sum / (n**3 - n))
    assert abs(rows[0]["h_raw"] - h) < 1e-2
    assert abs(rows[0]["h_adj"] - h_adj) < 1e-2
    assert rows[0]["h_adj"] >= rows[0]["h_raw"] - 1e-9  # ties only inflate


def test_gumbel_fit_replay(spark):
    row = plans.REGISTRY["monthly_max_gumbel_fit"].build(spark, SF).collect()[0]
    daily = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.col("o_orderdate").alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.expr("sum(cents) DIV 100").alias("dollars"))
        .collect()
    )
    blocks: dict = {}
    for r in daily:
        k = (r["d"].year, r["d"].month)
        blocks[k] = max(blocks.get(k, 0), r["dollars"])
    xs = list(blocks.values())
    n = len(xs)
    mean = sum(xs) / n
    sd = math.sqrt(sum((x - mean) ** 2 for x in xs) / (n - 1))
    beta = sd * math.sqrt(6.0) / math.pi
    mu = mean - beta * 0.5772156649015329
    rl = mu - beta * math.log(math.log(12.0 / 11.0))
    assert row["n_blocks"] == n
    assert abs(row["mean_max"] - mean) < 0.02
    assert abs(row["sd_max"] - sd) < 0.5
    assert abs(row["beta"] - beta) < 0.5
    assert abs(row["mu"] - mu) < 1.0
    assert abs(row["return_level_12"] - rl) < 1.5
    assert row["return_level_12"] > row["mu"]  # 12-block level above mode


def test_order_value_moments_replay(spark):
    rows = plans.REGISTRY["order_value_moments"].build(spark, SF).collect()
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.col("o_orderpriority").alias("p"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT) DIV 100").alias("v"),
        )
        .collect()
    )
    groups: dict = {}
    for r in o:
        groups.setdefault(r["p"], []).append(r["v"])
    for row in rows:
        g = groups[row["prio"]]
        n = len(g)
        mean = sum(g) / n
        m2 = sum((x - mean) ** 2 for x in g) / n
        m3 = sum((x - mean) ** 3 for x in g) / n
        m4 = sum((x - mean) ** 4 for x in g) / n
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3.0
        jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
        assert row["n"] == n
        assert abs(row["mean_dollars"] - mean) < 0.02
        assert abs(row["skewness"] - g1) < 1e-4
        assert abs(row["excess_kurtosis"] - g2) < 1e-3
        assert abs(row["jarque_bera"] - jb) < max(0.05, abs(jb) * 1e-3)
