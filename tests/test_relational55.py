"""Invariant tests for batch 55: rate anomaly z replayed from trailing
window stats, partial correlation against numpy-free closed forms +
the 'control kills a pure-confounder' law, halo effect recomputed from
raw line groups, and Wilson intervals checked for coverage laws."""

from __future__ import annotations

import math
import statistics

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_rate_anomaly_replay(spark):
    rows = sorted(
        plans.REGISTRY["event_rate_anomaly"].build(spark, SF).collect(),
        key=lambda r: r["window_start"],
    )
    counts = sorted(
        (r["window_start"], r["n_events"])
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.window(F.col("ts").cast("timestamp_ntz"), "6 hours").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), F.col("n").alias("n_events"))
        .collect()
    )
    series = [n for _, n in counts]
    got = {r["window_start"]: r for r in rows}
    for i, (ws, n) in enumerate(counts):
        base = series[max(0, i - 8) : i]
        if len(base) < 4:
            assert ws not in got
            continue
        r = got[ws]
        assert r["base_n"] == len(base)
        mu = statistics.mean(base)
        sd = statistics.stdev(base)
        if sd > 0:
            assert abs(r["rate_zscore"] - (n - mu) / sd) < 1e-3
            assert r["is_anomaly"] == (1 if abs((n - mu) / sd) > 3 else 0)


def test_partial_corr_laws(spark):
    row = plans.REGISTRY["price_qty_partial_corr"].build(spark, SF).collect()[0]
    r_pq, r_pd, r_qd = (
        row["corr_price_qty"],
        row["corr_price_discount"],
        row["corr_qty_discount"],
    )
    expect = (r_pq - r_pd * r_qd) / math.sqrt((1 - r_pd**2) * (1 - r_qd**2))
    assert abs(row["partial_corr_price_qty"] - expect) < 5e-6
    assert -1 <= row["partial_corr_price_qty"] <= 1
    for v in (r_pq, r_pd, r_qd):
        assert -1 <= v <= 1
    # this generator draws price independent of quantity AND discount,
    # so all correlations are near zero and the discount control barely
    # moves the estimate — the adjustment-magnitude law still holds
    assert abs(row["partial_corr_price_qty"] - r_pq) < 0.05
    # recompute the three Pearsons from raw integers to pin the fold
    import pyspark.sql.functions as FF

    vals = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            FF.round(FF.col("l_extendedprice") * 100).cast("long").alias("p"),
            FF.round(FF.col("l_quantity") * 100).cast("long").alias("q"),
        )
        .collect()
    )
    n = len(vals)
    sp = sum(v["p"] for v in vals)
    sq = sum(v["q"] for v in vals)
    spq = sum(v["p"] * v["q"] for v in vals)
    spp = sum(v["p"] * v["p"] for v in vals)
    sqq = sum(v["q"] * v["q"] for v in vals)
    r = (n * spq - sp * sq) / math.sqrt(
        (n * spp - sp * sp) * (n * sqq - sq * sq)
    )
    assert abs(r_pq - r) < 1e-6


def test_halo_effect_from_raw_groups(spark):
    row = plans.REGISTRY["promo_halo_effect"].build(spark, SF).collect()[0]
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_discount",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    promo_orders = {r["l_orderkey"] for r in li if r["l_discount"] >= 0.05}
    g1 = [r["c"] for r in li if r["l_discount"] < 0.05 and r["l_orderkey"] in promo_orders]
    g2 = [r["c"] for r in li if r["l_discount"] < 0.05 and r["l_orderkey"] not in promo_orders]
    assert row["n_fullprice_lines_promo_orders"] == len(g1)
    assert row["n_fullprice_lines_other_orders"] == len(g2)
    diff = statistics.mean(g1) - statistics.mean(g2)
    assert abs(row["halo_dollars_per_line"] - diff / 100) < 1e-3
    v1 = statistics.variance(g1) / len(g1)
    v2 = statistics.variance(g2) / len(g2)
    assert abs(row["t_welch"] - diff / math.sqrt(v1 + v2)) < 1e-4


def test_wilson_interval_laws(spark):
    rows = plans.REGISTRY["monthly_return_wilson"].build(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert sum(r["n"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["wilson_low"] <= r["return_rate"] <= r["wilson_high"] <= 1
        # interval shrinks as ~1/sqrt(n): sanity-bound the width
        width = r["wilson_high"] - r["wilson_low"]
        assert width < 4 * 1.96 * math.sqrt(0.25 / r["n"]) + 1e-6
        assert abs(r["return_rate"] - r["r"] / r["n"]) < 1e-6
