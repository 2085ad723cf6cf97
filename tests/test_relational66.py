"""Invariant tests for batch 66: HITS vs a python power-iteration
replay, CCF vs pairwise Pearson, rolling corr vs windowed replay, and
Durbin-Watson vs a numpy-free OLS residual fold."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_hits_replay(spark):
    rows = plans.REGISTRY["supplier_part_hits"].build(spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .collect()
    )
    edges = {(r["l_suppkey"], r["l_partkey"]) for r in li}
    deg: Counter = Counter(p for _, p in edges)
    hub: Counter = Counter()
    for s, p in edges:
        hub[s] += deg[p]
    auth: Counter = Counter()
    for s, p in edges:
        auth[p] += hub[s]
    total = sum(auth.values())
    top = sorted(auth.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(rows) == 20
    for r, (p, a2) in zip(sorted(rows, key=lambda r: r["rnk"]), top):
        assert r["partkey"] == p
        assert int(r["authority2"]) == a2
        assert r["n_suppliers"] == deg[p]
        assert abs(r["auth_share"] - a2 / total) < 1e-8


def test_ccf_replay(spark):
    rows = plans.REGISTRY["click_purchase_hourly_ccf"].build(spark, SF).collect()
    assert len(rows) == 13
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            F.date_trunc("hour", "ts").alias("hr"),
            "event_type",
        )
        .collect()
    )
    c: Counter = Counter()
    p: Counter = Counter()
    all_hours = set()
    for r in ev:
        all_hours.add(r["hr"])  # frame has a row per hour with ANY event
        if r["event_type"] == "click":
            c[r["hr"]] += 1
        elif r["event_type"] == "purchase":
            p[r["hr"]] += 1
    hours = sorted(all_hours)
    import datetime as dt

    for row in rows:
        k = row["lag"]
        xs, ys = [], []
        for h in hours:
            h2 = h + dt.timedelta(hours=k)
            if h2 in all_hours:
                xs.append(c.get(h, 0))
                ys.append(p.get(h2, 0))
        n = len(xs)
        assert row["n_pairs"] == n
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        r_num = n * sxy - sx * sy
        r_den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        assert abs(row["ccf"] - r_num / r_den) < 1e-5
        assert -1 <= row["ccf"] <= 1


def test_rolling_corr_replay(spark):
    rows = plans.REGISTRY["rolling_qty_revenue_corr"].build(spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.date_trunc("week", "l_shipdate").cast("date").alias("w"),
            F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
            .alias("rc"),
        )
        .groupBy("w")
        .agg(F.sum("qc").alias("q"), F.sum("rc").alias("r"))
        .collect()
    )
    weekly = sorted((r["w"], r["q"], r["r"]) for r in li)
    assert len(rows) == max(0, len(weekly) - 11)
    got = {r["week_start"]: r["rolling_corr"] for r in rows}
    for i in range(11, len(weekly)):
        win = weekly[i - 11 : i + 1]
        xs = [q for _, q, _ in win]
        ys = [r for _, _, r in win]
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        corr = (12 * sxy - sx * sy) / math.sqrt(
            (12 * sxx - sx * sx) * (12 * syy - sy * sy)
        )
        assert abs(got[weekly[i][0]] - corr) < 1e-5


def test_durbin_watson_replay(spark):
    row = plans.REGISTRY["weekly_trend_durbin_watson"].build(spark, SF).collect()[0]
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
    w0 = weekly[0][0]
    pts = [((w - w0).days // 7, y) for w, y in weekly]
    n = len(pts)
    st = sum(t for t, _ in pts)
    sy = sum(y for _, y in pts)
    sty = sum(t * y for t, y in pts)
    stt = sum(t * t for t, _ in pts)
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = (sy - b * st) / n
    es = [y - a - b * t for t, y in pts]
    dw = sum((es[i] - es[i - 1]) ** 2 for i in range(1, n)) / sum(
        e * e for e in es
    )
    assert row["n_weeks"] == n
    assert abs(row["ols_slope"] - b) < max(1e-3, abs(b) * 1e-3)
    assert abs(row["durbin_watson"] - dw) < 1e-3
    assert 0 < row["durbin_watson"] < 4  # DW range
