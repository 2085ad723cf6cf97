"""Invariant tests for batch 83: Wilcoxon signed-rank vs rank replay,
Atkinson vs direct geo/arith means, Kish vs direct sums, Good-Turing
vs a Counter spectrum."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import timedelta

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_wilcoxon_signed_rank_replay(spark):
    row = (
        plans.REGISTRY["weekly_yoy_wilcoxon_signed_rank"].build(spark, SF).collect()[0]
    )
    rows_w = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.date_trunc("week", "o_orderdate").cast("date").alias("w"))
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) as bigint)) DIV 100"
            ).alias("dollars")
        )
        .collect()
    )
    by_week = {r["w"]: r["dollars"] for r in rows_w}
    diffs = []
    for w, v in by_week.items():
        nxt = by_week.get(w + timedelta(days=364))
        if nxt is not None and nxt != v:
            diffs.append(nxt - v)
    m = len(diffs)
    s = sorted(abs(d) for d in diffs)
    first = {}
    cnt = defaultdict(int)
    for i, v in enumerate(s):
        if v not in first:
            first[v] = i + 1
        cnt[v] += 1
    w2 = sum(2 * first[abs(d)] + cnt[abs(d)] - 1 for d in diffs if d > 0)
    exp = m * (m + 1) / 4.0
    z = (w2 / 2.0 - exp) / math.sqrt(m * (m + 1) * (2.0 * m + 1) / 24.0)
    assert row["n_pairs"] == m
    assert row["n_up"] == sum(1 for d in diffs if d > 0)
    assert row["w_plus_x2"] == w2
    assert abs(row["expected_w"] - exp) < 1e-5
    assert abs(row["z_stat"] - z) < 1e-4


def test_atkinson_replay(spark):
    row = plans.REGISTRY["customer_spend_atkinson"].build(spark, SF).collect()[0]
    cents = [
        r["cents"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            F.expr("cast(sum(cast(round(o_totalprice * 100) as bigint)) as long)").alias(
                "cents"
            )
        )
        .collect()
    ]
    n = len(cents)
    geo = math.exp(sum(math.log(c) for c in cents) / n)
    arith = sum(cents) / n
    a1 = 1.0 - geo / arith
    assert row["n_customers"] == n
    assert row["total_cents"] == sum(cents)
    assert abs(row["atkinson_e1"] - a1) < 1e-5
    assert 0 <= row["atkinson_e1"] < 1


def test_kish_replay(spark):
    rows = plans.REGISTRY["nation_order_kish_neff"].build(spark, SF).collect()
    raw = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_nationkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            spark.read.parquet(f"{SF}/nation.parquet").select(
                "n_nationkey", "n_name"
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name", F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
        )
        .collect()
    )
    per = defaultdict(list)
    for r in raw:
        per[r["n_name"]].append(r["c"])
    assert len(rows) == len(per)
    for r in rows:
        ws = per[r["nation"]]
        sw = sum(ws)
        sw2 = sum(w * w for w in ws)
        neff = sw * sw / sw2
        assert r["n_orders"] == len(ws)
        assert r["sum_cents"] == sw
        assert int(r["sum_sq_cents"]) == sw2
        assert abs(r["kish_neff"] - neff) < max(1e-2, neff * 1e-6)
        assert abs(r["weight_efficiency"] - neff / len(ws)) < 1e-5
        assert 0 < r["weight_efficiency"] <= 1


def test_good_turing_replay(spark):
    rows = plans.REGISTRY["bigram_good_turing_estimates"].build(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    freq: Counter = Counter()
    for d in docs:
        toks = [t for t in d["text"].strip().split() if t]
        for w1, w2 in zip(toks, toks[1:]):
            freq[(w1, w2)] += 1
    spec = Counter(freq.values())
    n = sum(freq.values())
    by_r = {r["r"]: r for r in rows}
    assert set(by_r) == {r for r in spec if r <= 5}
    for r_val, row in by_r.items():
        vr = spec[r_val]
        vnext = spec.get(r_val + 1, 0)
        assert row["n_types"] == vr
        assert row["observed_tokens"] == r_val * vr
        assert abs(row["raw_mass"] - r_val * vr / n) < 1e-6
        assert abs(row["r_star"] - (r_val + 1.0) * vnext / vr) < 1e-5
        assert abs(row["gt_mass"] - (r_val + 1.0) * vnext / n) < 1e-6
    # Good-Turing discounts singletons: r*(1) < 1 for any Zipfian corpus
    assert by_r[1]["r_star"] < 1.5
