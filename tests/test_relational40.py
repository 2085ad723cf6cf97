"""Invariant tests for batch 40 (inventory planning): first-principles
Python recomputes — Croston replayed as a literal loop, ABC classes by
a literal sort, safety stock from statistics.pstdev-style sums."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _monday_weekly(spark, key_col):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    monday = F.date_sub(
        F.col("l_shipdate").cast("date"),
        (F.dayofweek(F.col("l_shipdate").cast("date")) + F.lit(5)) % F.lit(7),
    )
    return (
        li.groupBy(F.col(key_col).alias("k"), monday.alias("ws"))
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("q"))
        .collect()
    )


def test_abc_partition_is_exhaustive_and_ordered(spark):
    """Classes partition all parts; revenue shares sum to 1; the A
    class replays from a literal python sort with the integer
    cross-product cut."""
    rows = {r["abc_class"]: r for r in plans.REGISTRY["part_abc_classes"].build(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pr = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("rev")
        )
        .collect()
    )
    parts = sorted(((r["rev"], r["l_partkey"]) for r in pr), key=lambda t: (-t[0], t[1]))
    total = sum(r for r, _ in parts)
    cum, counts, revs = 0, {"A": 0, "B": 0, "C": 0}, {"A": 0, "B": 0, "C": 0}
    for rev, _ in parts:
        cum += rev
        cls = "A" if cum * 100 <= 80 * total else ("B" if cum * 100 <= 95 * total else "C")
        counts[cls] += 1
        revs[cls] += rev
    assert {c for c in rows} <= {"A", "B", "C"}
    for c, r in rows.items():
        assert r["n_parts"] == counts[c], c
        assert r["class_revenue"] == revs[c], c
    assert sum(r["n_parts"] for r in rows.values()) == len(parts)
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1.0) < 1e-4


def test_croston_replays_as_literal_loop(spark):
    out = {
        r["partkey"]: r
        for r in plans.REGISTRY["croston_demand_forecast"].build(spark, SF).collect()
    }
    weekly = _monday_weekly(spark, "l_partkey")
    series: dict[int, list[tuple]] = {}
    for r in weekly:
        series.setdefault(r["k"], []).append((r["ws"], r["q"]))
    checked = 0
    for pk, pts in series.items():
        pts.sort()
        if len(pts) < 3:
            assert pk not in out
            continue
        w0 = pts[0][0]
        ws = [(p[0] - w0).days // 7 for p in pts]
        gaps = [ws[i] - ws[i - 1] for i in range(1, len(ws))]
        z, p = float(pts[0][1]), float(gaps[0])
        for i in range(2, len(pts)):
            z = pts[i][1] * 0.5 + z * 0.5
            p = gaps[i - 1] * 0.5 + p * 0.5
        r = out[pk]
        assert r["n_demand_weeks"] == len(pts)
        assert abs(r["croston_size"] - z) < 1e-5
        assert abs(r["croston_interval"] - p) < 1e-5
        assert abs(r["croston_forecast"] - z / p) < 1e-5
        checked += 1
    assert checked > 50  # the sf0.01 catalog has plenty of eligible parts
    assert set(out) <= set(series)


def test_elasticity_bands_are_adjacent_and_consistent(spark):
    rows = plans.REGISTRY["discount_arc_elasticity"].build(spark, SF).collect()
    bands = sorted((r["band_lo"], r["band_hi"]) for r in rows)
    # each pair is adjacent in the observed band sequence
    seq = sorted({b for lo, hi in bands for b in (lo, hi)})
    for lo, hi in bands:
        assert seq.index(hi) == seq.index(lo) + 1
    # first-principles recompute of band averages and the arc formula
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    agg: dict[int, list[int]] = {}
    for r in li:
        band = int(math.floor(r["l_discount"] * 100 + 0.5))
        n, q, c = agg.get(band, [0, 0, 0])
        agg[band] = [
            n + 1,
            q + int(math.floor(r["l_quantity"] + 0.5)),
            c + int(math.floor(r["l_extendedprice"] * (1 - r["l_discount"]) * 100 + 0.5)),
        ]
    for r in rows:
        n1, q1, c1 = agg[r["band_lo"]]
        n2, q2, c2 = agg[r["band_hi"]]
        p1, p2 = c1 / q1, c2 / q2
        g1, g2 = q1 / n1, q2 / n2
        assert abs(r["price_lo"] - p1) < 1e-2 and abs(r["price_hi"] - p2) < 1e-2
        assert abs(r["qty_lo"] - g1) < 1e-3 and abs(r["qty_hi"] - g2) < 1e-3
        arc = ((g2 - g1) / ((g2 + g1) / 2)) / ((p2 - p1) / ((p2 + p1) / 2))
        assert abs(r["arc_elasticity"] - arc) < 1e-3


def test_safety_stock_replays_from_span_stats(spark):
    rows = plans.REGISTRY["brand_safety_stock"].build(spark, SF).collect()
    # brand weekly series needs the part join; rebuild directly
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF}/part.parquet")
    monday = F.date_sub(
        F.col("l_shipdate").cast("date"),
        (F.dayofweek(F.col("l_shipdate").cast("date")) + F.lit(5)) % F.lit(7),
    )
    wk = (
        li.join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("k"), monday.alias("ws"))
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("q"))
        .collect()
    )
    all_weeks = [r["ws"] for r in wk]
    span = (max(all_weeks) - min(all_weeks)).days // 7 + 1
    per: dict[str, list[int]] = {}
    for r in wk:
        per.setdefault(r["k"], []).append(r["q"])
    for r in rows:
        qs = per[r["brand"]]
        assert r["span_weeks"] == span
        assert r["n_demand_weeks"] == len(qs)
        sq, sqq = sum(qs), sum(q * q for q in qs)
        mean = sq / span
        var = (sqq - sq * sq / span) / (span - 1)
        ss = 1.645 * math.sqrt(2) * math.sqrt(var)
        assert abs(r["mean_weekly_qty"] - mean) < 1e-3
        assert abs(r["std_weekly_qty"] - math.sqrt(var)) < 1e-3
        assert abs(r["safety_stock"] - ss) < 1e-3
        assert abs(r["reorder_point"] - (mean * 2 + ss)) < 1e-3
        # zero-week correction: variance over the span must not be below
        # the observed-weeks-only mean-square deviation scaled naively
        assert r["std_weekly_qty"] >= 0
