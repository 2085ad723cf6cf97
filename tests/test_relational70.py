"""Invariant tests for batch 70: EWMA vs a pure-Python recursion,
Jonckheere vs a brute-force pairwise U sweep, trimmed/winsorized means
vs a sorted-list replay, STL strength vs a direct decomposition."""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_ewma_replay(spark):
    rows = sorted(
        plans.REGISTRY["daily_revenue_ewma_chart"].build(spark, SF).collect(),
        key=lambda r: r["day"],
    )
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.col("o_orderdate").cast("date").alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.expr("sum(cents) DIV 100").alias("v"))
        .collect()
    )
    daily = sorted((r["d"], r["v"]) for r in o)
    vs = [v for _, v in daily]
    n = len(vs)
    mu = sum(vs) / n
    sigma = math.sqrt(sum(v * v for v in vs) / n - mu * mu)
    width = 3.0 * sigma * math.sqrt(0.2 / 1.8)
    assert len(rows) == n
    for i, r in enumerate(rows):
        assert r["day"] == daily[i][0]
        assert r["dollars"] == vs[i]
        # truncated 60-deep fold, oldest element as init
        lo = max(0, i - 59)
        z = float(vs[lo])
        for v in vs[lo + 1 : i + 1]:
            z = 0.2 * v + 0.8 * z
        assert abs(r["ewma"] - z) < 1e-3
        assert abs(r["ucl"] - (mu + width)) < 1e-3
        assert abs(r["lcl"] - (mu - width)) < 1e-3
        assert r["out_of_control"] == (1 if (z > mu + width or z < mu - width) else 0)


def test_jonckheere_replay(spark):
    row = plans.REGISTRY["priority_price_jonckheere"].build(spark, SF).collect()[0]
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    groups = defaultdict(list)
    for r in o:
        groups[r["o_orderpriority"]].append(r["cents"])
    # brute-force 2J via sorted merge per pair (counting is O(n log n))
    import bisect

    j2 = 0
    for gi in range(5):
        a = sorted(groups[prios[gi]])
        for hi in range(gi + 1, 5):
            for x in groups[prios[hi]]:
                lt = bisect.bisect_left(a, x)
                eq = bisect.bisect_right(a, x) - lt
                j2 += 2 * lt + eq
    ns = [len(groups[p]) for p in prios]
    n = sum(ns)
    e4 = n * n - sum(g * g for g in ns)
    var = (n * n * (2 * n + 3) - sum(g * g * (2 * g + 3) for g in ns)) / 72.0
    z = (2.0 * j2 - e4) / (2.0 * math.sqrt(var))
    assert row["n_orders"] == n
    assert int(row["j2"]) == j2
    assert int(row["e4"]) == e4
    assert abs(row["jt_z"] - z) < 1e-3


def test_trimmed_stats_replay(spark):
    row = plans.REGISTRY["order_value_trimmed_stats"].build(spark, SF).collect()[0]
    cents = sorted(
        r["c"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .collect()
    )
    n = len(cents)
    k = n // 20
    trimmed = cents[k : n - k]
    winsor = [cents[k]] * k + trimmed + [cents[n - k - 1]] * k
    assert row["n_orders"] == n
    assert row["k_trimmed"] == k
    assert row["lo_cents"] == cents[k]
    assert row["hi_cents"] == cents[n - k - 1]
    assert abs(row["mean_cents"] - sum(cents) / n) < 1e-2
    assert abs(row["trimmed_mean_cents"] - sum(trimmed) / len(trimmed)) < 1e-2
    assert abs(row["winsorized_mean_cents"] - sum(winsor) / n) < 1e-2
    # robustness ordering sanity: trimmed/winsorized lie within data range
    assert cents[0] <= row["trimmed_mean_cents"] <= cents[-1]


def test_stl_strength_replay(spark):
    row = plans.REGISTRY["weekly_stl_strength"].build(spark, SF).collect()[0]
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.date_trunc("week", "o_orderdate").cast("date").alias("w"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("w")
        .agg(F.expr("sum(cents) DIV 100").alias("y"))
        .collect()
    )
    weekly = sorted((r["w"], r["y"]) for r in o)
    ys = [y for _, y in weekly]
    n = len(ys)
    det = {}
    for i in range(26, n - 26):
        trend = sum(ys[i - 26 : i + 27]) / 53.0
        det[i] = ys[i] - trend
    by_woy = defaultdict(list)
    for i, v in det.items():
        woy = weekly[i][0].isocalendar()[1]
        by_woy[woy].append(v)
    sea = {w: sum(v) / len(v) for w, v in by_woy.items()}
    rem = [
        det[i] - sea[weekly[i][0].isocalendar()[1]] for i in sorted(det)
    ]
    dvals = [det[i] for i in sorted(det)]
    m = len(dvals)

    def pvar(xs):
        mu = sum(xs) / len(xs)
        return sum((x - mu) ** 2 for x in xs) / len(xs)

    fs = max(0.0, 1.0 - pvar(rem) / pvar(dvals))
    assert row["n_weeks_used"] == m
    assert abs(row["f_seasonal"] - fs) < 1e-3
    assert 0.0 <= row["f_seasonal"] <= 1.0
    peak = min(sea, key=lambda w: (-sea[w], w))
    assert row["peak_week_of_year"] == peak
