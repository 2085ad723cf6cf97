"""Invariant tests for batch 53: PSI recomputed from a python binning
replay, Brown-Forsythe F from raw deviations, Welch t/df from scipy-
style closed forms, and the trend z against a python sufficient-stat
fold plus its scale-invariance law (score shifts don't change z)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_psi_replay(spark):
    rows = sorted(
        plans.REGISTRY["price_psi_drift"].build(spark, SF).collect(),
        key=lambda r: r["bin"],
    )
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
            "o_orderkey",
            (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")).alias(
                "is_a"
            ),
        )
        .collect()
    )
    a = sorted((r["c"], r["o_orderkey"]) for r in o if r["is_a"])
    n = len(a)
    edges = [a[(k * n + 9) // 10 - 1][0] for k in range(1, 10)]
    cells = {b: [0, 0] for b in range(10)}
    for r in o:
        b = sum(1 for e in edges if r["c"] > e)
        cells[b][0 if r["is_a"] else 1] += 1
    tot_a = sum(v[0] for v in cells.values())
    tot_b = sum(v[1] for v in cells.values())
    psi = 0.0
    for b, (na, nb) in cells.items():
        pa = (na + 0.5) / (tot_a + 5.0)
        pb = (nb + 0.5) / (tot_b + 5.0)
        psi += (pb - pa) * math.log(pb / pa)
    got = {r["bin"]: r for r in rows}
    for b, (na, nb) in cells.items():
        assert got[b]["n_a"] == na and got[b]["n_b"] == nb
    assert abs(rows[0]["psi_total"] - psi) < 1e-5
    # reference deciles put ~10% of period a in each bin
    for r in rows:
        assert abs(r["n_a"] - tot_a / 10) <= tot_a / 10 * 0.2 + 2


def test_brown_forsythe_from_raw_deviations(spark):
    row = plans.REGISTRY["brown_forsythe_variance_test"].build(spark, SF).collect()[0]
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    groups: dict = {}
    for r in li:
        groups.setdefault(r["l_returnflag"], []).append(r["c"])
    zs: dict = {}
    for g, vals in groups.items():
        s = sorted(vals)
        m = s[(len(s) + 1) // 2 - 1]
        zs[g] = [abs(v - m) for v in vals]
    k = len(zs)
    n_tot = sum(len(v) for v in zs.values())
    gm = sum(sum(v) for v in zs.values()) / n_tot
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in zs.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in zs.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n_tot - k))
    assert row["k_groups"] == k and row["n_tot"] == n_tot
    assert row["df1"] == k - 1 and row["df2"] == n_tot - k
    assert abs(row["f_bf"] - f) / f < 1e-6


def test_welch_ttest_closed_form(spark):
    row = plans.REGISTRY["welch_price_ttest"].build(spark, SF).collect()[0]
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_returnflag").isin("R", "N"))
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    r = [x["c"] for x in li if x["l_returnflag"] == "R"]
    nn = [x["c"] for x in li if x["l_returnflag"] == "N"]
    import statistics

    m1, m2 = statistics.mean(r), statistics.mean(nn)
    v1 = statistics.variance(r) / len(r)
    v2 = statistics.variance(nn) / len(nn)
    t = (m1 - m2) / math.sqrt(v1 + v2)
    df = (v1 + v2) ** 2 / (v1**2 / (len(r) - 1) + v2**2 / (len(nn) - 1))
    assert row["n1"] == len(r) and row["n2"] == len(nn)
    assert abs(row["t_welch"] - t) < 1e-4
    assert abs(row["df_welch"] - df) / df < 1e-6
    assert abs(row["mean_diff_dollars"] - (m1 - m2) / 100) < 1e-3


def test_trend_test_sufficient_stats(spark):
    row = plans.REGISTRY["priority_return_trend_test"].build(spark, SF).collect()[0]
    o = spark.read.parquet(f"{SF}/orders.parquet")
    ret = {
        r["l_orderkey"]
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
        .collect()
    }
    labs = [
        (int(r["o_orderpriority"][0]), 1 if r["o_orderkey"] in ret else 0)
        for r in o.select("o_orderkey", "o_orderpriority").collect()
    ]
    n = len(labs)
    r_tot = sum(p for _, p in labs)
    sr = sum(s * p for s, p in labs)
    sn = sum(s for s, _ in labs)
    sn2 = sum(s * s for s, _ in labs)
    z = (
        (n * sr - r_tot * sn)
        * math.sqrt(n)
        / math.sqrt(r_tot * (n - r_tot) * (n * sn2 - sn * sn))
    )
    assert row["n_orders"] == n and row["n_pos"] == r_tot
    assert abs(row["z_trend"] - z) < 1e-6
    assert abs(row["chi2_trend"] - z * z) < 1e-5
