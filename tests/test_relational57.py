"""Invariant tests for batch 57: the TWA integral replayed from raw
event segments, split gains against a python entropy scan, association
rules against set arithmetic, and the AM >= GM >= HM law."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_twa_integral_replay(spark):
    rows = plans.REGISTRY["user_value_twa"].build(spark, SF).collect()
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    got = {r["user_id"]: r for r in rows}
    checked = 0
    for u, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        if len(evs) < 2:
            assert u not in got
            continue
        segs = [
            (
                round(a["value"] * 100),
                (b["ts"] - a["ts"]).total_seconds() * 1e6,
            )
            for a, b in zip(evs, evs[1:])
        ]
        total = sum(d for _, d in segs)
        if total <= 0:
            assert u not in got
            continue
        twa = sum(c * d for c, d in segs) / total / 100
        r = got[u]
        assert r["n_segments"] == len(segs)
        assert abs(r["span_seconds"] - total / 1e6) < 0.05
        assert abs(r["twa_value"] - twa) < 1e-3
        # TWA is bounded by the min/max observed value
        vals = [c / 100 for c, _ in segs]
        assert min(vals) - 1e-9 <= r["twa_value"] <= max(vals) + 1e-9
        checked += 1
    assert checked > 10


def test_split_point_scan_replay(spark):
    rows = sorted(
        plans.REGISTRY["numeric_split_point_screen"].build(spark, SF).collect(),
        key=lambda r: r["candidate"],
    )
    assert len(rows) == 9
    assert sum(r["is_best"] for r in rows) == 1
    best = max(rows, key=lambda r: (r["info_gain"], -r["candidate"]))
    assert best["is_best"] == 1
    for r in rows:
        assert r["info_gain"] >= -1e-9
        assert r["n_l"] + r["n_r"] == rows[0]["n_l"] + rows[0]["n_r"]
    # deciles: n_l is monotone increasing in candidate
    nls = [r["n_l"] for r in rows]
    assert nls == sorted(nls)


def test_association_rules_set_arithmetic(spark):
    rows = plans.REGISTRY["brand_association_rules"].build(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = spark.read.parquet(f"{SF}/part.parquet")
    baskets = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
        .collect()
    )
    by_brand: dict = {}
    orders = set()
    for r in baskets:
        by_brand.setdefault(r["p_brand"], set()).add(r["l_orderkey"])
        orders.add(r["l_orderkey"])
    n = len(orders)
    assert 0 < len(rows) <= 20
    prev = None
    for r in rows:
        a, c = by_brand[r["antecedent"]], by_brand[r["consequent"]]
        both = len(a & c)
        assert r["n_both"] == both and both >= 10
        assert r["n_antecedent"] == len(a) and r["n_consequent"] == len(c)
        assert abs(r["confidence"] - both / len(a)) < 1e-6
        assert abs(r["lift"] - both * n / (len(a) * len(c))) < 1e-5
        if prev is not None:
            assert r["lift"] <= prev + 1e-9
        prev = r["lift"]


def test_pythagorean_mean_ordering(spark):
    rows = plans.REGISTRY["order_value_mean_spectrum"].build(spark, SF).collect()
    import statistics

    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    by_p: dict = {}
    for r in o:
        by_p.setdefault(r["o_orderpriority"], []).append(r["c"])
    for r in rows:
        vals = by_p[r["priority"]]
        assert r["n"] == len(vals)
        am = statistics.mean(vals) / 100
        gm = math.exp(statistics.mean(math.log(v) for v in vals)) / 100
        hm = len(vals) / sum(1 / v for v in vals) / 100
        assert abs(r["arithmetic_mean"] - am) < 1e-3
        assert abs(r["geometric_mean"] - gm) < 1e-3
        assert abs(r["harmonic_mean"] - hm) < 1e-3
        # AM >= GM >= HM with strict gaps for non-constant data
        assert r["arithmetic_mean"] >= r["geometric_mean"] >= r["harmonic_mean"]
