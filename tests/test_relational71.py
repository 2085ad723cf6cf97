"""Invariant tests for batch 71: Haar energy vs a pure-Python dyadic
transform, Neyman allocation vs direct apportionment, streaks/records
vs a linear scan, Kendall's W vs a midrank replay."""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _weekly(spark, col="o_orderdate"):
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.date_trunc("week", col).cast("date").alias("w"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("w")
        .agg(F.expr("sum(cents) DIV 100").alias("y"))
        .collect()
    )
    return sorted((r["w"], r["y"]) for r in rows)


def test_haar_replay(spark):
    rows = plans.REGISTRY["weekly_revenue_haar_energy"].build(spark, SF).collect()
    ys = [y for _, y in _weekly(spark)][:256]
    assert len(ys) == 256
    expect = {}
    total = 0
    for lvl in range(1, 9):
        size = 1 << lvl
        half = size // 2
        energy = 0
        n_coeffs = 0
        for b in range(256 // size):
            blk = ys[b * size : (b + 1) * size]
            d = sum(blk[:half]) - sum(blk[half:])
            energy += d * d
            n_coeffs += 1
        expect[lvl] = (size, n_coeffs, energy)
        total += energy
    assert len(rows) == 8
    for r in rows:
        size, n_coeffs, energy = expect[r["level"]]
        assert r["scale_weeks"] == size
        assert r["n_coeffs"] == n_coeffs
        assert int(r["energy"]) == energy
        assert abs(r["energy_share"] - energy / total) < 1e-5
    assert abs(sum(r["energy_share"] for r in rows) - 1.0) < 1e-4


def test_neyman_replay(spark):
    rows = plans.REGISTRY["nation_neyman_allocation"].build(spark, SF).collect()
    c = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select(
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("v"),
        )
        .collect()
    )
    per = defaultdict(list)
    for r in c:
        per[r["c_nationkey"]].append(r["v"])
    wh = {}
    for nat, vs in per.items():
        n = len(vs)
        mu = sum(vs) / n
        sigma = math.sqrt(sum(v * v for v in vs) / n - mu * mu)
        wh[nat] = n * sigma
    tot = sum(wh.values())
    alloc = {nat: 1000 * w / tot for nat, w in wh.items()}
    base = {nat: math.floor(a) for nat, a in alloc.items()}
    leftover = 1000 - sum(base.values())
    order = sorted(alloc, key=lambda nat: (-(alloc[nat] - base[nat]), nat))
    final = dict(base)
    for nat in order[:leftover]:
        final[nat] += 1
    assert len(rows) == len(per)
    for r in rows:
        nat = r["nation"]
        assert r["n_customers"] == len(per[nat])
        assert abs(r["sigma_cents"] - wh[nat] / len(per[nat])) < 1e-2
        assert abs(r["alloc_exact"] - alloc[nat]) < 1e-4
        assert r["alloc_n"] == final[nat]
    assert sum(r["alloc_n"] for r in rows) == 1000


def test_streaks_replay(spark):
    row = plans.REGISTRY["weekly_revenue_streaks"].build(spark, SF).collect()[0]
    ys = [y for _, y in _weekly(spark)]
    n = len(ys)
    lu = ld = cu = cd = 0
    hi = lo = ys[0]
    nh = nl = 0
    for i in range(1, n):
        if ys[i] > ys[i - 1]:
            cu += 1
            cd = 0
        elif ys[i] < ys[i - 1]:
            cd += 1
            cu = 0
        else:
            cu = cd = 0
        lu = max(lu, cu)
        ld = max(ld, cd)
        if ys[i] > hi:
            nh += 1
            hi = ys[i]
        if ys[i] < lo:
            nl += 1
            lo = ys[i]
    assert row["n_weeks"] == n
    assert row["longest_up_streak"] == lu
    assert row["longest_down_streak"] == ld
    assert row["n_record_highs"] == nh
    assert row["n_record_lows"] == nl


def test_kendall_w_replay(spark):
    row = plans.REGISTRY["weekly_brand_kendall_w"].build(spark, SF).collect()[0]
    wk = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("week", "l_shipdate").cast("date").alias("week"),
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            ).alias("cents")
        )
        .collect()
    )
    brands = sorted({r["brand"] for r in wk})
    k = len(brands)
    by_week = defaultdict(dict)
    for r in wk:
        by_week[r["week"]][r["brand"]] = r["cents"]
    full = [w for w, d in by_week.items() if len(d) == k]
    m = len(full)
    r_sum = defaultdict(float)
    st = 0
    for w in full:
        vals = by_week[w]
        svals = sorted(vals.values())
        for b, v in vals.items():
            lt = sum(1 for x in svals if x < v)
            t = sum(1 for x in svals if x == v)
            r_sum[b] += lt + (t + 1) / 2.0
        groups = defaultdict(int)
        for v in svals:
            groups[v] += 1
        st += sum(t**3 - t for t in groups.values())
    s_r2 = sum((2 * r_sum[b]) ** 2 for b in brands)
    num = 3.0 * s_r2 - 3.0 * m * m * k * (k + 1) ** 2
    den = m * m * k * (k * k - 1) - m * st
    w_stat = num / den
    assert row["n_weeks"] == m
    assert row["n_brands"] == k
    assert abs(row["kendall_w"] - w_stat) < 1e-4
    assert 0.0 <= row["kendall_w"] <= 1.0
    assert abs(row["chi2_approx"] - m * (k - 1) * w_stat) < 1e-2
