"""Invariant tests for batch 67: NB fit vs exact moment replay, kappa
vs contingency replay, quantile map vs sorted-list selection, Pettitt
vs a brute-force U sweep."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_nbinom_replay(spark):
    row = plans.REGISTRY["order_count_nbinom_fit"].build(spark, SF).collect()[0]
    custs = {
        r["c_custkey"]
        for r in spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_custkey")
        .collect()
    }
    per: Counter = Counter()
    for r in (
        spark.read.parquet(f"{SF}/orders.parquet").select("o_custkey").collect()
    ):
        per[r["o_custkey"]] += 1
    ks = [per.get(c, 0) for c in custs]
    n = len(ks)
    m = sum(ks) / n
    v = sum((k - m) ** 2 for k in ks) / (n - 1)
    assert row["n_customers"] == n
    assert row["total_orders"] == sum(ks)
    assert row["n_zero"] == sum(1 for k in ks if k == 0)
    assert abs(row["mean_orders"] - m) < 1e-5
    assert abs(row["var_orders"] - v) < 1e-4
    assert abs(row["dispersion_index"] - v / m) < 1e-4
    if v > m:
        assert abs(row["nb_r"] - m * m / (v - m)) < 1e-3
        assert abs(row["nb_p"] - m / v) < 1e-5
        assert 0 < row["nb_p"] < 1
    else:
        assert row["nb_r"] is None and row["nb_p"] is None


def test_kappa_replay(spark):
    row = plans.REGISTRY["return_discount_kappa"].build(spark, SF).collect()[0]
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", "l_discount")
        .collect()
    )
    n11 = n10 = n01 = n00 = 0
    for r in li:
        a = r["l_returnflag"] == "R"
        b = round(r["l_discount"] * 100) >= 5
        if a and b:
            n11 += 1
        elif a:
            n10 += 1
        elif b:
            n01 += 1
        else:
            n00 += 1
    n = len(li)
    assert (row["n11"], row["n10"], row["n01"], row["n00"]) == (n11, n10, n01, n00)
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert abs(row["p_observed"] - po) < 1e-6
    assert abs(row["p_expected"] - pe) < 1e-6
    assert abs(row["kappa"] - kappa) < 1e-5
    assert -1 <= row["kappa"] <= 1


def test_quantile_map_replay(spark):
    rows = plans.REGISTRY["nation_balance_quantile_map"].build(spark, SF).collect()
    c = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select(
            F.col("c_nationkey").alias("nation"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    per: dict = defaultdict(list)
    allv = []
    for r in c:
        per[r["nation"]].append(r["cents"])
        allv.append(r["cents"])
    allv.sort()

    def decile(sorted_vals, q):
        n = len(sorted_vals)
        rank = (q * n + 9) // 10  # ceil(q*n/10)
        return sorted_vals[rank - 1]

    assert len(rows) == len(per) * 9
    for r in rows:
        vs = sorted(per[r["nation"]])
        assert r["nation_cents"] == decile(vs, r["decile"])
        assert r["pooled_cents"] == decile(allv, r["decile"])
        assert r["shift_cents"] == r["nation_cents"] - r["pooled_cents"]
    # deciles are monotone within a nation
    by_nation = defaultdict(list)
    for r in rows:
        by_nation[r["nation"]].append((r["decile"], r["nation_cents"]))
    for pts in by_nation.values():
        vals = [v for _, v in sorted(pts)]
        assert vals == sorted(vals)


def test_pettitt_replay(spark):
    row = plans.REGISTRY["weekly_revenue_pettitt"].build(spark, SF).collect()[0]
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
    xs = [y for _, y in weekly]
    n = len(xs)
    # brute-force U_t = sum_{i<=t} sum_{j>t} sign(x_i - x_j)
    best_k, best_u = None, -1
    for t in range(1, n):
        u = sum(
            (xs[i] > xs[j]) - (xs[i] < xs[j])
            for i in range(t)
            for j in range(t, n)
        )
        if abs(u) > best_u:
            best_u, best_k = abs(u), t
    assert row["n_weeks"] == n
    assert row["u_abs"] == best_u
    assert row["change_week"] == weekly[best_k - 1][0]
    p = 2.0 * math.exp(-6.0 * best_u * best_u / (n**3 + n**2))
    assert abs(row["approx_p"] - p) < 1e-5
