"""Invariant tests for batch 39 (rank statistics): first-principles
Python recomputes independent of the oracle SQL — midranks built with
a literal sort, pair counts with a literal double loop."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _midranks(values):
    """value -> midrank (average of 1-based positions among ties)."""
    s = sorted(values)
    first = {}
    for i, v in enumerate(s):
        first.setdefault(v, i)
    counts = {}
    for v in s:
        counts[v] = counts.get(v, 0) + 1
    return {v: first[v] + (counts[v] + 1) / 2 for v in counts}


def test_rank_sum_replays_from_raw_delays(spark):
    row = plans.REGISTRY["ship_delay_rank_sum"].build(spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    d = (
        li.filter(F.col("l_returnflag").isin("R", "N"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.datediff("l_shipdate", "o_orderdate").alias("delay"), "l_returnflag"
        )
        .collect()
    )
    rs = [r["delay"] for r in d if r["l_returnflag"] == "R"]
    ns = [r["delay"] for r in d if r["l_returnflag"] == "N"]
    mr = _midranks(rs + ns)
    n_r, n_n = len(rs), len(ns)
    u_r = sum(mr[v] for v in rs) - n_r * (n_r + 1) / 2
    assert row["n_r"] == n_r and row["n_n"] == n_n
    assert int(row["u2_r"]) == round(2 * u_r)
    # tie term: sum over distinct values of t^3 - t
    counts = {}
    for v in rs + ns:
        counts[v] = counts.get(v, 0) + 1
    tie = sum(t**3 - t for t in counts.values())
    assert int(row["tie_sum"]) == tie
    n = n_r + n_n
    var = n_r * n_n / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u_r - n_r * n_n / 2) / math.sqrt(var)
    assert abs(row["z_approx"] - z) < 5e-4


def test_spearman_matches_scipy_free_recompute(spark):
    row = plans.REGISTRY["acctbal_spend_spearman"].build(spark, SF).collect()[0]
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    xy = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("y"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.round(F.col("c_acctbal") * 100).cast("long").alias("x"), "y")
        .collect()
    )
    xs = [r["x"] for r in xy]
    ys = [r["y"] for r in xy]
    mx, my = _midranks(xs), _midranks(ys)
    rx = [mx[v] for v in xs]
    ry = [my[v] for v in ys]
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    rho = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert row["n"] == n
    assert abs(row["spearman_rho"] - rho) < 5e-6


def test_kendall_counts_replay_with_double_loop(spark):
    row = plans.REGISTRY["weekly_qty_revenue_kendall"].build(spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    monday = F.date_sub(
        F.col("l_shipdate").cast("date"),
        (F.dayofweek(F.col("l_shipdate").cast("date")) + F.lit(5)) % F.lit(7),
    )
    w = (
        li.groupBy(monday.alias("ws"))
        .agg(
            F.sum(F.round("l_quantity").cast("long")).alias("q"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("r"),
        )
        .collect()
    )
    pts = sorted((r["ws"], r["q"], r["r"]) for r in w)
    C = D = tx = ty = txy = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dq = pts[i][1] - pts[j][1]
            dr = pts[i][2] - pts[j][2]
            if dq == 0 and dr == 0:
                txy += 1
            elif dq == 0:
                tx += 1
            elif dr == 0:
                ty += 1
            elif dq * dr > 0:
                C += 1
            else:
                D += 1
    n_pairs = len(pts) * (len(pts) - 1) // 2
    assert row["n_pairs"] == n_pairs
    assert (row["concordant"], row["discordant"]) == (C, D)
    assert (row["tie_x"], row["tie_y"], row["tie_xy"]) == (tx, ty, txy)
    tau = (C - D) / math.sqrt((n_pairs - tx - txy) * (n_pairs - ty - txy))
    assert abs(row["tau_b"] - tau) < 5e-6
    # Monday anchor really is a Monday
    assert all(p[0].weekday() == 0 for p in pts)


def test_rank_statistics_bounds(spark):
    """tau and rho live in [-1, 1]; U in [0, n_r*n_n]."""
    rs = plans.REGISTRY["ship_delay_rank_sum"].build(spark, SF).collect()[0]
    assert 0 <= int(rs["u2_r"]) <= 2 * rs["n_r"] * rs["n_n"]
    sp = plans.REGISTRY["acctbal_spend_spearman"].build(spark, SF).collect()[0]
    assert -1.0 <= sp["spearman_rho"] <= 1.0
    kd = plans.REGISTRY["weekly_qty_revenue_kendall"].build(spark, SF).collect()[0]
    assert -1.0 <= kd["tau_b"] <= 1.0
