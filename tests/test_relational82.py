"""Invariant tests for batch 82: distance correlation vs a direct
double-centered replay, pinball vs explicit split+loss, Ansari-Bradley
vs folded-rank replay, shift function vs sorted-percentile selection."""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _weekly_xy(spark):
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.date_trunc("week", "o_orderdate").cast("date").alias("w"))
        .agg(
            F.count("*").alias("x"),
            F.expr(
                "sum(cast(round(o_totalprice * 100) as bigint)) DIV 100"
            ).alias("y"),
        )
        .collect()
    )
    rows = sorted(rows, key=lambda r: r["w"])
    return [r["x"] for r in rows], [r["y"] for r in rows]


def _seg_cents(spark):
    rows = (
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
    per = defaultdict(list)
    for r in rows:
        per[r["c_mktsegment"]].append(r["cents"])
    return per


def test_dcorr_replay(spark):
    row = plans.REGISTRY["weekly_traffic_revenue_dcorr"].build(spark, SF).collect()[0]
    xs, ys = _weekly_xy(spark)
    n = len(xs)
    a = [[abs(xs[i] - xs[j]) for j in range(n)] for i in range(n)]
    b = [[abs(ys[i] - ys[j]) for j in range(n)] for i in range(n)]

    def dstat(u, v):
        t1 = sum(u[i][j] * v[i][j] for i in range(n) for j in range(n))
        ru = [sum(r) for r in u]
        rv = [sum(r) for r in v]
        t2 = sum(ru[i] * rv[i] for i in range(n))
        return t1 / n**2 - 2.0 * t2 / n**3 + sum(ru) * sum(rv) / n**4

    dcov2 = dstat(a, b)
    dvx = dstat(a, a)
    dvy = dstat(b, b)
    dcor = math.sqrt(max(dcov2, 0.0) / math.sqrt(dvx * dvy))
    assert row["n_weeks"] == n
    assert int(row["sum_dist_x"]) == sum(sum(r) for r in a)
    assert int(row["sum_dist_y"]) == sum(sum(r) for r in b)
    assert abs(row["dcov2"] - dcov2) < max(1e-4, abs(dcov2) * 1e-6)
    assert abs(row["dcor"] - dcor) < 1e-5
    assert 0 <= row["dcor"] <= 1
    # traffic and revenue are strongly dependent
    assert row["dcor"] > 0.3


def test_pinball_replay(spark):
    rows = plans.REGISTRY["weekly_quantile_pinball_eval"].build(spark, SF).collect()
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
    d = [r["dollars"] for r in sorted(rows_w, key=lambda r: r["w"])]
    n = len(d)
    train = [d[i] for i in range(n) if 4 * (i + 1) <= 3 * n]
    test = [d[i] for i in range(n) if 4 * (i + 1) > 3 * n]
    st = sorted(train)
    m = len(st)
    assert len(rows) == 3
    for r in rows:
        tau10 = int(round(r["tau"] * 10))
        q = st[math.ceil(tau10 * m / 10) - 1]
        loss = sum(
            tau10 * (y - q) if y >= q else (10 - tau10) * (q - y) for y in test
        )
        assert r["n_train"] == m
        assert r["n_test"] == len(test)
        assert r["q_dollars"] == q
        assert r["pinball_x10_dollars"] == loss
        assert abs(r["mean_pinball"] - loss / (10.0 * len(test))) < 1e-3


def test_ansari_bradley_replay(spark):
    row = plans.REGISTRY["segment_value_ansari_bradley"].build(spark, SF).collect()[0]
    per = _seg_cents(spark)
    pooled = sorted(
        [(v, "A") for v in per["AUTOMOBILE"]] + [(v, "H") for v in per["HOUSEHOLD"]]
    )
    nn = len(pooled)
    first = {}
    cnt = defaultdict(int)
    for i, (v, _) in enumerate(pooled):
        if v not in first:
            first[v] = i + 1
        cnt[v] += 1
    w2 = 0
    for v, tag in pooled:
        r2 = 2 * first[v] + cnt[v] - 1
        s2 = (nn + 1) - abs(r2 - (nn + 1))
        if tag == "A":
            w2 += s2
    m = len(per["AUTOMOBILE"])
    if nn % 2 == 0:
        exp = m * (nn + 2) / 4.0
        var = m * (nn - m) * (nn + 2) * (nn - 2) / (48.0 * (nn - 1))
    else:
        exp = m * (nn + 1) ** 2 / (4.0 * nn)
        var = m * (nn - m) * (nn + 1) * (3.0 + nn * float(nn)) / (48.0 * nn * nn)
    z = (w2 / 2.0 - exp) / math.sqrt(var)
    assert row["n_total"] == nn
    assert row["n_auto"] == m
    assert row["ab_score_x2"] == w2
    assert abs(row["expected_x1"] - exp) < 1e-3
    assert abs(row["z_stat"] - z) < 1e-4


def test_shift_function_replay(spark):
    rows = plans.REGISTRY["segment_value_shift_function"].build(spark, SF).collect()
    per = _seg_cents(spark)
    sa = sorted(per["AUTOMOBILE"])
    sh = sorted(per["HOUSEHOLD"])
    assert len(rows) == 9
    for r in sorted(rows, key=lambda r: r["decile"]):
        k = r["decile"]
        qa = sa[math.ceil(k * len(sa) / 10) - 1]
        qh = sh[math.ceil(k * len(sh) / 10) - 1]
        assert r["n_auto"] == len(sa)
        assert r["n_house"] == len(sh)
        assert r["q_auto_cents"] == qa
        assert r["q_house_cents"] == qh
        assert r["shift_cents"] == qh - qa
    # quantile ladders must be nondecreasing
    qs = [r["q_auto_cents"] for r in sorted(rows, key=lambda r: r["decile"])]
    assert qs == sorted(qs)
