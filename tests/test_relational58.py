"""Invariant tests for batch 58: isotonic fit vs a sequential PAVA
replay, effect sizes vs quadratic python folds, periodogram shares vs
a direct DFT, and the calendar audit vs python date arithmetic."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _weekly(spark):
    return sorted(
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.date_trunc("week", "o_orderdate").cast("date").alias("w"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"))
        .collect(),
        key=lambda r: r["w"],
    )


def _pava(ys):
    """Sequential pool-adjacent-violators — the loop the minimax form
    replaces."""
    blocks = [[y, 1] for y in ys]  # [sum, count]
    out = []
    for b in blocks:
        out.append(b[:])
        while len(out) > 1 and out[-2][0] / out[-2][1] > out[-1][0] / out[-1][1]:
            s2, c2 = out.pop()
            out[-1][0] += s2
            out[-1][1] += c2
    fit = []
    for s, c in out:
        fit.extend([s / c] * c)
    return fit


def test_isotonic_equals_pava(spark):
    rows = sorted(
        plans.REGISTRY["weekly_isotonic_trend"].build(spark, SF).collect(),
        key=lambda r: r["week_start"],
    )
    weekly = _weekly(spark)
    assert [r["week_start"] for r in rows] == [r["w"] for r in weekly]
    fit = _pava([r["c"] for r in weekly])
    for r, f in zip(rows, fit):
        assert abs(r["isotonic_fit_cents"] - f) < 0.01
    # monotone non-decreasing
    fits = [r["isotonic_fit_cents"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(fits, fits[1:]))
    # fit preserves the total mass (least-squares projection property)
    assert abs(sum(fits) - sum(r["c"] for r in weekly)) < 1.0


def test_effect_sizes_quadratic_replay(spark):
    row = plans.REGISTRY["price_effect_sizes"].build(spark, SF).collect()[0]
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_returnflag").isin("R", "N"))
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    xs = [r["c"] for r in li if r["l_returnflag"] == "R"]
    ys = [r["c"] for r in li if r["l_returnflag"] == "N"]
    import statistics

    sp = math.sqrt(
        (
            sum((x - statistics.mean(xs)) ** 2 for x in xs)
            + sum((y - statistics.mean(ys)) ** 2 for y in ys)
        )
        / (len(xs) + len(ys) - 2)
    )
    d = (statistics.mean(xs) - statistics.mean(ys)) / sp
    assert abs(row["cohens_d"] - d) < 1e-5
    # Cliff's delta via sorted-merge counting (O(n log n), exact)
    ys_sorted = sorted(ys)
    import bisect

    gt = sum(bisect.bisect_left(ys_sorted, x) for x in xs)
    lt = sum(len(ys_sorted) - bisect.bisect_right(ys_sorted, x) for x in xs)
    delta = (gt - lt) / (len(xs) * len(ys))
    assert abs(row["cliffs_delta"] - delta) < 1e-6
    assert -1 <= row["cliffs_delta"] <= 1


def test_periodogram_dft_replay(spark):
    rows = sorted(
        plans.REGISTRY["weekly_revenue_periodogram"].build(spark, SF).collect(),
        key=lambda r: r["harmonic"],
    )
    weekly = _weekly(spark)
    ys = [r["c"] for r in weekly]
    n = len(ys)
    mu = sum(ys) / n
    powers = []
    for k in range(1, 9):
        c = sum((y - mu) * math.cos(2 * math.pi * k * t / n) for t, y in enumerate(ys))
        s = sum((y - mu) * math.sin(2 * math.pi * k * t / n) for t, y in enumerate(ys))
        powers.append(c * c + s * s)
    tot = sum(powers)
    assert [r["harmonic"] for r in rows] == list(range(1, 9))
    assert sum(r["is_dominant"] for r in rows) == 1
    for r, p in zip(rows, powers):
        assert abs(r["power_share"] - p / tot) < 1e-5
        assert abs(r["period_weeks"] - n / r["harmonic"]) < 0.01
    assert abs(sum(r["power_share"] for r in rows) - 1.0) < 1e-4
    best = max(rows, key=lambda r: (r["power_share"], -r["harmonic"]))
    assert best["is_dominant"] == 1


def test_calendar_gap_audit_replay(spark):
    rows = plans.REGISTRY["calendar_gap_audit"].build(spark, SF).collect()
    days = sorted(
        r["d"]
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(F.col("l_shipdate").cast("date").alias("d"))
        .distinct()
        .collect()
    )
    import datetime as dt

    full = set()
    cur = days[0]
    while cur <= days[-1]:
        full.add(cur)
        cur += dt.timedelta(days=1)
    missing = sorted(full - set(days))
    per_month: dict = {}
    for d in missing:
        per_month.setdefault(d.year * 100 + d.month, []).append(d)
    got = {r["ym"]: r for r in rows}
    assert set(got) == set(per_month)
    for ym, ds in per_month.items():
        r = got[ym]
        assert r["missing_days"] == len(ds)
        assert r["first_missing"] == min(ds)
        assert r["last_missing"] == max(ds)
