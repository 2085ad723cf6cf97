"""Invariant tests for batch 74: Bass vs a numpy-free normal-equation
replay, Hellinger vs direct histogram math, lognormal vs log-moment
replay, Pareto crossing vs a sorted scan."""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_bass_replay(spark):
    row = plans.REGISTRY["bass_diffusion_fit"].build(spark, SF).collect()[0]
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.min(F.date_trunc("week", "o_orderdate").cast("date")).alias("w0"))
        .groupBy("w0")
        .agg(F.count("*").alias("n_new"))
        .collect()
    )
    weekly = sorted((r["w0"], r["n_new"]) for r in o)
    pts = []
    cum = 0
    for _, n_new in weekly:
        pts.append((cum, n_new))
        cum += n_new
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sxx = sum(x * x for x, _ in pts)
    sxxx = sum(x**3 for x, _ in pts)
    sxxxx = sum(x**4 for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxxy = sum(x * x * y for x, y in pts)

    def det3(m):
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    M = [[n, sx, sxx], [sx, sxx, sxxx], [sxx, sxxx, sxxxx]]
    rhs = [sy, sxy, sxxy]
    d = det3(M)
    a = det3([[rhs[0], sx, sxx], [rhs[1], sxx, sxxx], [rhs[2], sxxx, sxxxx]]) / d
    b = det3([[n, rhs[0], sxx], [sx, rhs[1], sxxx], [sxx, rhs[2], sxxxx]]) / d
    cc = det3([[n, sx, rhs[0]], [sx, sxx, rhs[1]], [sxx, sxxx, rhs[2]]]) / d
    assert row["n_weeks"] == n
    assert abs(row["bass_a"] - a) < max(1e-4, abs(a) * 1e-4)
    assert abs(row["bass_b"] - b) < max(1e-4, abs(b) * 1e-4)
    assert abs(row["bass_c"] - cc) < max(1e-6, abs(cc) * 1e-3)
    disc = b * b - 4 * a * cc
    if cc < 0 and disc >= 0:
        m = (-b - math.sqrt(disc)) / (2 * cc)
        assert abs(row["bass_m"] - m) < max(0.05, m * 1e-3)
        assert abs(row["bass_p"] - a / m) < 1e-4
        assert abs(row["bass_q"] - (a / m + b)) < 1e-4
        # m should be at least the customers already adopted
        assert row["bass_m"] > 0
    else:
        assert row["bass_m"] is None


def test_hellinger_replay(spark):
    row = plans.REGISTRY["segment_price_hellinger"].build(spark, SF).collect()[0]
    x = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
        .select(
            "c_mktsegment",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    a = sorted(r["cents"] for r in x if r["c_mktsegment"] == "AUTOMOBILE")
    b = sorted(r["cents"] for r in x if r["c_mktsegment"] == "HOUSEHOLD")
    allv = sorted(a + b)
    n = len(allv)
    edges = [allv[(q * n + 9) // 10 - 1] for q in range(1, 10)]

    def bucket(v):
        return sum(1 for e in edges if e < v)

    ha = defaultdict(int)
    hb = defaultdict(int)
    for v in a:
        ha[bucket(v)] += 1
    for v in b:
        hb[bucket(v)] += 1
    buckets = set(ha) | set(hb)
    bc = sum(
        math.sqrt((ha.get(k, 0) / len(a)) * (hb.get(k, 0) / len(b)))
        for k in buckets
    )
    hel = math.sqrt(1.0 - min(1.0, bc))
    assert row["n_automobile"] == len(a)
    assert row["n_household"] == len(b)
    assert row["n_buckets"] == len(buckets)
    assert abs(row["bhattacharyya"] - bc) < 1e-5
    assert abs(row["hellinger"] - hel) < 1e-5
    assert 0.0 <= row["hellinger"] <= 1.0


def test_lognormal_replay(spark):
    row = plans.REGISTRY["order_value_lognormal_fit"].build(spark, SF).collect()[0]
    cents = sorted(
        r["c"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_totalprice") > 0)
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .collect()
    )
    n = len(cents)
    logs = [math.log(v) for v in cents]
    mu = sum(logs) / n
    s2 = sum((x - mu) ** 2 for x in logs) / n
    mean = sum(cents) / n
    med = cents[(n + 1) // 2 - 1]
    assert row["n_orders"] == n
    assert abs(row["mu_log"] - mu) < 1e-4
    assert abs(row["sigma_log"] - math.sqrt(s2)) < 1e-4
    assert abs(row["fitted_mean_ratio"] - math.exp(mu + s2 / 2) / mean) < 1e-3
    assert abs(row["fitted_median_ratio"] - math.exp(mu) / med) < 1e-3


def test_pareto_crossing_replay(spark):
    row = plans.REGISTRY["revenue_pareto_crossing"].build(spark, SF).collect()[0]
    cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
        .collect()
    )
    vals = sorted((r["cents"] for r in cust), reverse=True)
    n = len(vals)
    tot = sum(vals)
    acc = 0
    k80 = None
    for i, v in enumerate(vals, 1):
        acc += v
        if 5 * acc >= 4 * tot:
            k80 = i
            break
    kt = (n + 9) // 10
    s_top = sum(vals[:kt])
    assert row["n_customers"] == n
    assert row["k80_customers"] == k80
    assert abs(row["k80_share_of_customers"] - k80 / n) < 1e-5
    assert row["top10pct_customers"] == kt
    assert abs(row["top10pct_revenue_share"] - s_top / tot) < 1e-5
    assert row["k80_share_of_customers"] < 1.0
