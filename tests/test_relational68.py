"""Invariant tests for batch 68: Kaplan-Meier vs a pure-Python life
-table replay, McNemar vs contingency replay, BH-FDR vs a sorted
p-value sweep, elasticity vs per-brand numpy-free OLS replay."""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_kaplan_meier_replay(spark):
    rows = sorted(
        plans.REGISTRY["repeat_purchase_kaplan_meier"].build(spark, SF).collect(),
        key=lambda r: r["week"],
    )
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("d"),
            "o_orderkey",
        )
        .collect()
    )
    per = defaultdict(list)
    dmax = max(r["d"] for r in o)
    for r in o:
        per[r["o_custkey"]].append((r["d"], r["o_orderkey"]))
    subj = []
    for _, ds in per.items():
        ds.sort()
        if len(ds) >= 2:
            subj.append(((ds[1][0] - ds[0][0]).days // 7, 1))
        else:
            subj.append(((dmax - ds[0][0]).days // 7, 0))
    life = defaultdict(lambda: [0, 0])
    for t, ev in subj:
        life[t][ev] += 1  # [censored, events] -> index by ev
    n_total = len(subj)
    cum = 0
    surv = 1.0
    dead = False
    expect = {}
    for t in sorted(life):
        c, d = life[t][0], life[t][1]
        n = n_total - cum
        if d >= n:
            dead = True
        elif d > 0:
            surv *= 1.0 - d / n
        expect[t] = (n, d, c, 0.0 if dead else surv)
        cum += d + c
    assert [r["week"] for r in rows] == sorted(expect)
    for r in rows:
        n, d, c, s = expect[r["week"]]
        assert (r["n_risk"], r["n_event"], r["n_censored"]) == (n, d, c)
        assert abs(r["km_survival"] - s) < 1e-5
    # survival is monotone non-increasing and within [0, 1]
    kms = [r["km_survival"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in kms)
    assert all(a >= b - 1e-12 for a, b in zip(kms, kms[1:]))
    # hazard is monotone non-decreasing
    haz = [r["na_cum_hazard"] for r in rows]
    assert all(b >= a - 1e-12 for a, b in zip(haz, haz[1:]))


def test_mcnemar_replay(spark):
    row = plans.REGISTRY["return_discount_mcnemar"].build(spark, SF).collect()[0]
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", "l_discount")
        .collect()
    )
    n10 = n01 = 0
    for r in li:
        a = r["l_returnflag"] == "R"
        b = round(r["l_discount"] * 100) >= 5
        if a and not b:
            n10 += 1
        elif b and not a:
            n01 += 1
    assert (row["n10"], row["n01"]) == (n10, n01)
    assert row["n_discordant"] == n10 + n01
    chi2 = (n10 - n01) ** 2 / (n10 + n01)
    cc = (abs(n10 - n01) - 1) ** 2 / (n10 + n01)
    assert abs(row["mcnemar_chi2"] - chi2) < 1e-5
    assert abs(row["mcnemar_chi2_cc"] - cc) < 1e-5
    assert row["significant_05"] == (1 if cc > 3.841459 else 0)


def _erfc(x: float) -> float:
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * math.exp(-x * x)


def test_brand_return_fdr_replay(spark):
    rows = plans.REGISTRY["brand_return_fdr"].build(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_partkey", "l_returnflag"
    )
    p = spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_brand")
    brand_of = {r["p_partkey"]: r["p_brand"] for r in p.collect()}
    n = defaultdict(int)
    k = defaultdict(int)
    for r in li.collect():
        b = brand_of[r["l_partkey"]]
        n[b] += 1
        if r["l_returnflag"] == "R":
            k[b] += 1
    nn, kk, m = sum(n.values()), sum(k.values()), len(n)
    p0 = kk / nn
    pv = {}
    for b in n:
        z = (k[b] / n[b] - p0) / math.sqrt(p0 * (1 - p0) / n[b])
        pv[b] = (_erfc(abs(z) / math.sqrt(2.0)), z)
    ordered = sorted(pv, key=lambda b: (pv[b][0], b))
    kmax = max(
        (i + 1 for i, b in enumerate(ordered) if pv[b][0] <= 0.05 * (i + 1) / m),
        default=0,
    )
    assert len(rows) == m
    for r in rows:
        b = r["brand"]
        assert (r["n_lines"], r["n_returns"]) == (n[b], k[b])
        assert abs(r["z_score"] - pv[b][1]) < 1e-3
        assert abs(r["p_two_sided"] - pv[b][0]) < 1e-6
        assert r["bh_rank"] == ordered.index(b) + 1
        assert r["rejected"] == (1 if r["bh_rank"] <= kmax else 0)
    # erfc approximation sanity against math.erfc
    for x in (0.1, 0.7, 1.3, 2.4, 3.6):
        assert abs(_erfc(x) - math.erfc(x)) < 1.6e-7


def test_brand_price_elasticity_replay(spark):
    rows = plans.REGISTRY["brand_price_elasticity"].build(spark, SF).collect()
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
            F.sum(F.round("l_quantity").cast("long")).alias("qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
        )
        .collect()
    )
    per = defaultdict(list)
    for r in wk:
        if r["qty"] > 0 and r["cents"] > 0:
            per[r["brand"]].append(
                (math.log(r["cents"] / (100.0 * r["qty"])), math.log(r["qty"]))
            )
    assert len(rows) == len(per)
    for r in rows:
        pts = per[r["brand"]]
        nw = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        slope = (nw * sxy - sx * sy) / (nw * sxx - sx * sx)
        r2 = (nw * sxy - sx * sy) ** 2 / ((nw * sxx - sx * sx) * (nw * syy - sy * sy))
        assert r["n_weeks"] == nw
        assert abs(r["elasticity"] - slope) < 1e-3
        assert abs(r["fit_r2"] - r2) < 1e-4
        assert 0.0 <= r["fit_r2"] <= 1.0
