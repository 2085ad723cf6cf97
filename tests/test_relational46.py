"""Invariant tests for batch 46: LTV cells recomputed from a python
fold, shift-share checked for exact additivity, price indices checked
against a literal basket recompute and the Fisher bracketing law."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_ltv_curve_replays_and_is_monotone(spark):
    rows = plans.REGISTRY["cohort_ltv_curve"].build(spark, SF).collect()
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_type", "value")
        .collect()
    )
    import datetime as dt

    def monday(d):
        return d - dt.timedelta(days=d.weekday())

    first: dict = {}
    for r in ev:
        d = r["ts"].date()
        if r["user_id"] not in first or d < first[r["user_id"]]:
            first[r["user_id"]] = d
    cm = {u: monday(d) for u, d in first.items()}
    sizes: dict = {}
    for u, m in cm.items():
        sizes[m] = sizes.get(m, 0) + 1
    cells: dict = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        d = r["ts"].date()
        key = (cm[r["user_id"]], (monday(d) - cm[r["user_id"]]).days // 7)
        n, rev = cells.get(key, (0, 0))
        cells[key] = (n + 1, rev + int(math.floor(r["value"] * 100 + 0.5)))
    got = {(r["cohort_week"], r["age_weeks"]): r for r in rows}
    assert set(got) == set(cells)
    # cumulative matches the python prefix-sum per cohort
    by_cohort: dict = {}
    for (c, a), (n, rev) in sorted(cells.items()):
        by_cohort.setdefault(c, []).append((a, n, rev))
    for c, lst in by_cohort.items():
        cum = 0
        for a, n, rev in lst:
            cum += rev
            r = got[(c, a)]
            assert r["n_purchases"] == n
            assert r["cum_revenue_cents"] == cum
            assert r["cohort_users"] == sizes[c]
            assert abs(r["ltv_cents_per_user"] - cum / sizes[c]) < 0.5
    # LTV never decreases with age within a cohort
    for c, lst in by_cohort.items():
        vals = [got[(c, a)]["cum_revenue_cents"] for a, _, _ in lst]
        assert vals == sorted(vals)


def test_shift_share_adds_back_exactly(spark):
    rows = plans.REGISTRY["shift_share_decomposition"].build(spark, SF).collect()
    t0 = sum(r["r0"] for r in rows)
    t1 = sum(r["r1"] for r in rows)
    for r in rows:
        assert r["delta"] == r["r1"] - r["r0"]
        tide = r["r0"] * (t1 / t0 - 1)
        assert abs(r["tide_effect"] - tide) < 0.5
        # effects sum back to the exact delta (within the 2dp rounding)
        assert abs(r["tide_effect"] + r["competitive_effect"] - r["delta"]) < 0.02
    # the tide effects aggregate to the total market growth
    assert abs(sum(r["tide_effect"] for r in rows) - (t1 - t0)) < 1.0
    # competitive effects are zero-sum across nations
    assert abs(sum(r["competitive_effect"] for r in rows)) < 1.0


def test_price_indices_replay_and_fisher_brackets(spark):
    rows = {r["brand"]: r for r in plans.REGISTRY["brand_price_indices"].build(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF}/part.parquet")
    data = (
        li.filter(F.year("l_shipdate").isin(1996, 1997))
        .join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_brand",
            "l_partkey",
            F.year("l_shipdate").alias("yr"),
            F.round("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
            .alias("c"),
        )
        .collect()
    )
    agg: dict = {}
    for r in data:
        k = (r["p_brand"], r["l_partkey"], r["yr"])
        q, c = agg.get(k, (0, 0))
        agg[k] = (q + r["q"], c + r["c"])
    brands: dict = {}
    parts = {(b, pk) for b, pk, _ in agg}
    for b, pk in parts:
        if (b, pk, 1996) in agg and (b, pk, 1997) in agg:
            q0, c0 = agg[(b, pk, 1996)]
            q1, c1 = agg[(b, pk, 1997)]
            if q0 > 0 and q1 > 0:
                brands.setdefault(b, []).append((q0, c0, q1, c1))
    assert set(rows) == set(brands)
    for b, lst in brands.items():
        p1q0 = sum(c1 / q1 * q0 for q0, c0, q1, c1 in lst)
        p0q0 = sum(c0 / q0 * q0 for q0, c0, q1, c1 in lst)
        p1q1 = sum(c1 / q1 * q1 for q0, c0, q1, c1 in lst)
        p0q1 = sum(c0 / q0 * q1 for q0, c0, q1, c1 in lst)
        r = rows[b]
        assert r["n_matched_parts"] == len(lst)
        assert abs(r["laspeyres"] - p1q0 / p0q0) < 1e-4
        assert abs(r["paasche"] - p1q1 / p0q1) < 1e-4
        fisher = math.sqrt((p1q0 / p0q0) * (p1q1 / p0q1))
        assert abs(r["fisher"] - fisher) < 1e-4
        # Fisher lies between Laspeyres and Paasche (geometric mean law)
        lo, hi = sorted((r["laspeyres"], r["paasche"]))
        assert lo - 1e-6 <= r["fisher"] <= hi + 1e-6
