"""Invariant tests for batch 72: log-rank vs a pure-Python life-table
replay, CUSUM vs the recursive definition, HHI/CR4 vs direct shares,
Yule's K vs a Counter replay."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_logrank_replay(spark):
    row = plans.REGISTRY["repeat_purchase_logrank"].build(spark, SF).collect()[0]
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("d"),
            "o_orderkey",
        )
        .collect()
    )
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
        .collect()
    }
    per = defaultdict(list)
    dmax = max(r["d"] for r in o)
    for r in o:
        per[r["o_custkey"]].append((r["d"], r["o_orderkey"]))
    subj = []
    for cust, ds in per.items():
        ds.sort()
        g = 1 if seg[cust] == "BUILDING" else 0
        if len(ds) >= 2:
            subj.append((g, (ds[1][0] - ds[0][0]).days // 7, 1))
        else:
            subj.append((g, (dmax - ds[0][0]).days // 7, 0))
    life = defaultdict(lambda: [0, 0, 0, 0])  # d1 c1 d0 c0
    for g, t, ev in subj:
        idx = (0 if ev else 1) + (0 if g else 2)
        life[t][idx] += 1
    n1 = sum(1 for g, _, _ in subj if g == 1)
    n0 = len(subj) - n1
    o1 = e1 = v = 0.0
    tot_d1 = tot_d0 = 0
    for t in sorted(life):
        d1, c1, d0, c0 = life[t]
        if d1 + d0 > 0:
            nt = n1 + n0
            dt = d1 + d0
            o1 += d1
            e1 += dt * n1 / nt
            if nt > 1:
                v += dt * n1 * n0 * (nt - dt) / (nt**2 * (nt - 1))
            tot_d1 += d1
            tot_d0 += d0
        n1 -= d1 + c1
        n0 -= d0 + c0
    z = (o1 - e1) / math.sqrt(v)
    assert row["events_building"] == tot_d1
    assert row["events_other"] == tot_d0
    assert abs(row["expected_building"] - e1) < 1e-2
    assert abs(row["logrank_z"] - z) < 1e-3
    assert abs(row["logrank_chi2"] - z * z) < 1e-2


def test_cusum_replay(spark):
    rows = sorted(
        plans.REGISTRY["daily_revenue_cusum"].build(spark, SF).collect(),
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
    k = 0.5 * sigma
    h = 4.0 * sigma
    sp = sm = 0.0
    assert len(rows) == n
    for i, r in enumerate(rows):
        sp = max(0.0, sp + vs[i] - mu - k)
        sm = max(0.0, sm + mu - k - vs[i])
        assert r["day"] == daily[i][0]
        assert r["dollars"] == vs[i]
        assert abs(r["s_plus"] - sp) < 1e-2
        assert abs(r["s_minus"] - sm) < 1e-2
        assert r["alarm_hi"] == (1 if sp > h else 0)
        assert r["alarm_lo"] == (1 if sm > h else 0)
        assert r["s_plus"] >= 0 and r["s_minus"] >= 0


def test_concentration_replay(spark):
    rows = plans.REGISTRY["nation_supplier_concentration"].build(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    nat = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in spark.read.parquet(f"{SF}/supplier.parquet")
        .select("s_suppkey", "s_nationkey")
        .collect()
    }
    per = defaultdict(lambda: defaultdict(int))
    for r in li.collect():
        per[nat[r["l_suppkey"]]][r["l_suppkey"]] += round(
            r["l_extendedprice"] * (1 - r["l_discount"]) * 100
        )
    assert len(rows) == len(per)
    for r in rows:
        shares = sorted(per[r["nation"]].values(), reverse=True)
        tot = sum(shares)
        hhi = 10000.0 * sum((c / tot) ** 2 for c in shares)
        cr4 = sum(shares[:4]) / tot
        assert r["n_suppliers"] == len(shares)
        assert abs(r["hhi"] - hhi) < 0.5
        assert abs(r["cr4"] - cr4) < 1e-4
        assert 0 < r["cr4"] <= 1.0
        assert r["hhi"] <= 10000.0


def test_yule_k_replay(spark):
    row = plans.REGISTRY["corpus_yule_k"].build(spark, SF).collect()[0]
    texts = (
        spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    )
    cnt: Counter = Counter()
    for r in texts:
        cnt.update(t for t in r["text"].strip().split() if t)
    n = sum(cnt.values())
    vocab = len(cnt)
    v1 = sum(1 for f in cnt.values() if f == 1)
    smm = sum(f * f for f in cnt.values())
    k = 10000.0 * (smm - n) / (n * n)
    assert row["n_tokens"] == n
    assert row["vocab"] == vocab
    assert row["hapax_count"] == v1
    assert abs(row["yule_k"] - k) < 1e-2
    assert abs(row["hapax_share"] - v1 / vocab) < 1e-5
