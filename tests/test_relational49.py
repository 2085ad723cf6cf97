"""Invariant tests for batch 49: EOQ closed form recomputed, newsvendor
fractiles checked as exact order statistics, the changepoint argmin
verified against a brute-force python segmentation, and ABC x XYZ
checked for partition laws and boundary consistency."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_eoq_closed_form(spark):
    rows = plans.REGISTRY["brand_eoq"].build(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        d = r["demand_centi"] / 100
        h = 0.2 * r["avg_unit_price"]
        expect = math.sqrt(2 * d * 100.0 / h)
        # avg_unit_price is rounded to 4dp, so allow proportional slack
        assert abs(r["eoq_units"] - expect) / expect < 1e-3
        assert r["eoq_units"] > 0


def test_newsvendor_fractiles_are_order_statistics(spark):
    rows = plans.REGISTRY["brand_newsvendor_stock"].build(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = spark.read.parquet(f"{SF}/part.parquet")
    wd = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("week", "l_shipdate").cast("date").alias("w"),
        )
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("d"))
        .collect()
    )
    by_brand: dict = {}
    for r in wd:
        by_brand.setdefault(r["brand"], []).append(r["d"])
    for r in rows:
        ds = sorted(by_brand[r["brand"]])
        n = len(ds)
        assert r["n_weeks"] == n
        assert r["stock_p50_centi"] == ds[(n + 1) // 2 - 1]
        assert r["stock_p90_centi"] == ds[(9 * n + 9) // 10 - 1]
        assert r["stock_p90_centi"] >= r["stock_p50_centi"]


def test_changepoint_matches_bruteforce(spark):
    row = plans.REGISTRY["weekly_revenue_changepoint"].build(spark, SF).collect()[0]
    weekly = sorted(
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.date_trunc("week", "o_orderdate").cast("date").alias("w"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"))
        .collect(),
        key=lambda r: r["w"],
    )
    xs = [r["c"] for r in weekly]
    n = len(xs)

    def sse(seg):
        m = sum(seg) / len(seg)
        return sum((v - m) ** 2 for v in seg)

    full = sse(xs)
    best_k, best_cost = None, None
    for k in range(1, n):
        cost = sse(xs[:k]) + sse(xs[k:])
        if best_cost is None or cost < best_cost - 1e-6:
            best_k, best_cost = k, cost
    assert row["n_weeks"] == n
    assert row["split_week"] == weekly[best_k - 1]["w"]
    assert abs(row["sse_full"] - full) / full < 1e-9
    assert abs(row["sse_best"] - best_cost) / max(best_cost, 1.0) < 1e-9
    assert abs(row["var_explained"] - (1 - best_cost / full)) < 1e-6
    assert row["sse_best"] <= row["sse_full"] + 1e-9


def test_abc_xyz_partition_laws(spark):
    rows = plans.REGISTRY["abc_xyz_matrix"].build(spark, SF).collect()
    n_parts_sold = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r["n_parts"] for r in rows) == n_parts_sold
    classes = {(r["abc_class"], r["xyz_class"]) for r in rows}
    assert classes <= {(a, x) for a in "ABC" for x in "XYZ"}
    # A-class revenue dominates C-class revenue (definitional)
    rev = {}
    for r in rows:
        rev[r["abc_class"]] = rev.get(r["abc_class"], 0) + r["class_revenue"]
    if "A" in rev and "C" in rev:
        assert rev["A"] > rev["C"]
