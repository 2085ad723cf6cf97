"""Invariant tests for batch 75: Granger vs a nested-OLS replay,
concurrency vs a sweep replay, dispersion vs per-part stats, month-end
lift vs a two-cell replay."""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans
from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import events

SF = "/root/testdata/sf0.01"


def test_granger_replay(spark):
    row = plans.REGISTRY["click_purchase_granger"].build(spark, SF).collect()[0]
    ev = (
        events(spark, SF)
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
        )
        .collect()
    )
    daily = sorted((r["day"], r["x"], r["y"]) for r in ev)
    pts = [
        (daily[i][2], daily[i - 1][2], daily[i - 1][1])
        for i in range(1, len(daily))
    ]  # (y, yl, xl)
    n = len(pts)
    import numpy as np

    X3 = np.array([[1.0, yl, xl] for _, yl, xl in pts])
    X2 = np.array([[1.0, yl] for _, yl, _ in pts])
    Y = np.array([float(y) for y, _, _ in pts])
    b3, *_ = np.linalg.lstsq(X3, Y, rcond=None)
    b2, *_ = np.linalg.lstsq(X2, Y, rcond=None)
    rss_u = float(((Y - X3 @ b3) ** 2).sum())
    rss_r = float(((Y - X2 @ b2) ** 2).sum())
    f_stat = (rss_r - rss_u) / (rss_u / (n - 3))
    assert row["n_days"] == n
    assert abs(row["click_coef"] - b3[2]) < max(1e-4, abs(b3[2]) * 1e-3)
    assert abs(row["rss_unrestricted"] - rss_u) < max(0.5, rss_u * 1e-6)
    assert abs(row["rss_restricted"] - rss_r) < max(0.5, rss_r * 1e-6)
    assert abs(row["granger_f"] - f_stat) < max(1e-3, f_stat * 1e-3)
    assert row["granger_f"] >= 0 or row["granger_f"] is None


def test_concurrency_replay(spark):
    row = plans.REGISTRY["session_concurrency_profile"].build(spark, SF).collect()[0]
    ev = (
        events(spark, SF).select("user_id", "ts").collect()
    )
    per = defaultdict(list)
    for r in ev:
        per[r["user_id"]].append(r["ts"])
    sessions = []
    for _, tss in per.items():
        tss.sort()
        t0 = prev = tss[0]
        for t in tss[1:]:
            if (t - prev).total_seconds() > 300:
                sessions.append((t0, prev))
                t0 = t
            prev = t
        sessions.append((t0, prev))
    sweep = sorted(
        [(t0, 1) for t0, _ in sessions] + [(t1, -1) for _, t1 in sessions],
        key=lambda p: (p[0], p[1]),
    )
    conc = mx = 0
    peak = None
    for t, d in sweep:
        conc += d
        if conc > mx:
            mx = conc
            peak = t
    tot = sum((t1 - t0).total_seconds() for t0, t1 in sessions)
    span = (
        max(t1 for _, t1 in sessions) - min(t0 for t0, _ in sessions)
    ).total_seconds()
    assert row["n_sessions"] == len(sessions)
    assert row["max_conc"] == mx
    assert row["peak_ts"] == peak
    assert abs(row["avg_concurrency"] - tot / span) < 1e-3
    assert abs(row["span_hours"] - span / 3600.0) < 1e-3
    assert row["max_conc"] >= math.ceil(row["avg_concurrency"])


def test_price_dispersion_replay(spark):
    rows = plans.REGISTRY["part_price_dispersion_audit"].build(spark, SF).collect()
    pn = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") > 0)
        .join(
            spark.read.parquet(f"{SF}/supplier.parquet").select(
                "s_suppkey", "s_nationkey"
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("l_partkey").alias("part"), F.col("s_nationkey").alias("nation")
        )
        .agg(
            F.sum(
                F.round(F.lit(100.0) * F.col("l_extendedprice") / F.col("l_quantity"))
                .cast("long")
            ).alias("sc"),
            F.count("*").alias("c"),
        )
        .collect()
    )
    per = defaultdict(list)
    for r in pn:
        per[r["part"]].append(r["sc"] / r["c"])
    stats = {}
    for part, means in per.items():
        k = len(means)
        if k < 3:
            continue
        mom = sum(means) / k
        cv = math.sqrt(sum((m - mom) ** 2 for m in means) / k) / mom
        spread = (max(means) - min(means)) / min(means)
        stats[part] = (k, mom, cv, spread)
    ranked = sorted(stats.items(), key=lambda kv: (-kv[1][2], kv[0]))[:20]
    assert len(rows) == min(20, len(stats))
    by_rank = {r["rnk"]: r for r in rows}
    for i, (part, (k, mom, cv, spread)) in enumerate(ranked, 1):
        r = by_rank[i]
        assert r["part"] == part
        assert r["n_nations"] == k
        assert abs(r["mean_unit_cents"] - mom) < 0.5
        assert abs(r["cross_nation_cv"] - cv) < 1e-4
        assert abs(r["max_min_spread"] - spread) < 1e-4


def test_month_end_lift_replay(spark):
    import calendar

    row = plans.REGISTRY["month_end_lift"].build(spark, SF).collect()[0]
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
    end, oth = [], []
    for r in o:
        d = r["d"]
        last = calendar.monthrange(d.year, d.month)[1]
        (end if d.day >= last - 2 else oth).append(r["v"])

    def mean(xs):
        return sum(xs) / len(xs)

    def var(xs):
        m = mean(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    t = (mean(end) - mean(oth)) / math.sqrt(
        var(end) / len(end) + var(oth) / len(oth)
    )
    assert row["n_end_days"] == len(end)
    assert row["n_other_days"] == len(oth)
    assert abs(row["end_mean_dollars"] - mean(end)) < 0.5
    assert abs(row["other_mean_dollars"] - mean(oth)) < 0.5
    assert abs(row["lift"] - mean(end) / mean(oth)) < 1e-3
    assert abs(row["welch_t"] - t) < 1e-3
