"""Invariant tests for batch 60: weighted median vs a python weighted
selection, the z-test vs a closed-form replay, the Q-Q correlation vs
a sorted-pair recompute, and seasonality entropy bounds + replay."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_weighted_median_selection(spark):
    rows = plans.REGISTRY["brand_weighted_median_price"].build(spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/part.parquet"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_brand",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
            F.round(F.col("l_quantity") * 100).cast("long").alias("w"),
        )
        .collect()
    )
    by_brand: dict = {}
    for r in li:
        by_brand.setdefault(r["p_brand"], []).append((r["c"], r["w"]))
    for r in rows:
        vals = sorted(by_brand[r["brand"]])
        assert r["n_lines"] == len(vals)
        # plain lower median at the VALUE grain: first value whose
        # cumulative count reaches (n+1+1)//2 ... i.e. 2*cumc >= n+1
        per_val: dict = {}
        for c, w in vals:
            cc, ww = per_val.get(c, (0, 0))
            per_val[c] = (cc + 1, ww + w)
        n = len(vals)
        totw = sum(w for _, w in vals)
        cumc = cumw = 0
        med = wmed = None
        for c in sorted(per_val):
            cc, ww = per_val[c]
            cumc += cc
            cumw += ww
            if med is None and 2 * cumc >= n + 1:
                med = c
            if wmed is None and 2 * cumw >= totw:
                wmed = c
        assert r["median_cents"] == med
        assert r["weighted_median_cents"] == wmed


def test_ztest_closed_form(spark):
    row = plans.REGISTRY["segment_return_ztest"].build(spark, SF).collect()[0]
    p1 = row["x1"] / row["n1"]
    p2 = row["x2"] / row["n2"]
    pp = (row["x1"] + row["x2"]) / (row["n1"] + row["n2"])
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / row["n1"] + 1 / row["n2"]))
    assert abs(row["rate_diff"] - (p1 - p2)) < 1e-6
    assert abs(row["z_pooled"] - z) < 1e-5
    # both segments are substantial samples
    assert row["n1"] > 100 and row["n2"] > 100


def test_qq_correlation_replay(spark):
    row = plans.REGISTRY["order_gap_exponential_qq"].build(spark, SF).collect()[0]
    o = sorted(
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey", F.col("o_orderdate").cast("date").alias("d"), "o_orderkey")
        .collect(),
        key=lambda r: (r["o_custkey"], r["d"], r["o_orderkey"]),
    )
    gaps = []
    prev = None
    for r in o:
        if prev is not None and prev["o_custkey"] == r["o_custkey"]:
            gaps.append((r["d"] - prev["d"]).days)
        prev = r
    gaps.sort()
    n = len(gaps)
    qs = [-math.log(1 - (i + 1) / (n + 1)) for i in range(n)]
    sx, sy = sum(gaps), sum(qs)
    sxy = sum(g * q for g, q in zip(gaps, qs))
    sxx = sum(g * g for g in gaps)
    syy = sum(q * q for q in qs)
    r_ = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert row["n_gaps"] == n
    assert abs(row["mean_gap_days"] - sx / n) < 1e-3
    assert abs(row["qq_correlation"] - r_) < 1e-5
    assert 0 < row["qq_correlation"] <= 1


def test_seasonality_entropy_replay(spark):
    rows = plans.REGISTRY["customer_seasonality_entropy"].build(spark, SF).collect()
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey", F.month("o_orderdate").alias("m"))
        .collect()
    )
    per: dict = {}
    for r in o:
        per.setdefault(r["o_custkey"], {}).setdefault(r["m"], 0)
        per[r["o_custkey"]][r["m"]] += 1
    got = {r["o_custkey"]: r for r in rows}
    assert set(got) == {k for k, v in per.items() if sum(v.values()) >= 5}
    for k in list(got)[:500]:
        cells = per[k]
        n = sum(cells.values())
        h = math.log(n) - sum(c * math.log(c) for c in cells.values()) / n
        r = got[k]
        assert r["n_orders"] == n and r["n_months"] == len(cells)
        assert abs(r["month_entropy"] - h) < 1e-3
        assert abs(r["seasonality_score"] - h / math.log(12)) < 1e-3
        assert -1e-9 <= r["month_entropy"] <= math.log(12) + 1e-9
