"""Invariant tests for batch 86: SampEn vs a direct template scan,
Benford-2 vs Counter + closed-form shares, Hodges-Lehmann vs explicit
Walsh medians, spectral entropy vs a numpy periodogram."""

from __future__ import annotations

import math
from collections import Counter
from datetime import timedelta

import numpy as np
import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _weekly(spark):
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.date_trunc("week", "o_orderdate").cast("date").alias("w"))
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) as bigint)) DIV 100"
            ).alias("dollars")
        )
        .collect()
    )
    return sorted((r["w"], r["dollars"]) for r in rows)


def test_sample_entropy_replay(spark):
    row = plans.REGISTRY["weekly_revenue_sample_entropy"].build(spark, SF).collect()[0]
    d = [v for _, v in _weekly(spark)]
    n = len(d)
    ads = sorted(abs(d[i + 1] - d[i]) for i in range(n - 1))
    r = ads[(len(ads) + 1) // 2 - 1]
    tpl = [(d[i], d[i + 1], d[i + 2]) for i in range(n - 2)]
    b = a = 0
    for i in range(len(tpl)):
        for j in range(i + 1, len(tpl)):
            if max(abs(tpl[i][0] - tpl[j][0]), abs(tpl[i][1] - tpl[j][1])) <= r:
                b += 1
                if abs(tpl[i][2] - tpl[j][2]) <= r:
                    a += 1
    assert row["n_weeks"] == n
    assert row["tolerance_dollars"] == r
    assert row["m2_matches"] == b
    assert row["m3_matches"] == a
    assert abs(row["sample_entropy"] - (-math.log(a / b))) < 1e-5
    assert row["sample_entropy"] >= 0


def test_benford2_replay(spark):
    rows = (
        plans.REGISTRY["order_value_benford_second_digit"].build(spark, SF).collect()
    )
    cents = [
        r["c"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .collect()
        if r["c"] >= 10
    ]
    obs = Counter(int(str(c)[1]) for c in cents)
    n = len(cents)
    assert len(rows) == 10
    assert sum(r["n_obs"] for r in rows) == n
    for r in rows:
        d = r["digit"]
        p = sum(math.log10(1.0 + 1.0 / (10 * k + d)) for k in range(1, 10))
        assert r["n_obs"] == obs.get(d, 0)
        assert abs(r["expected_share"] - p) < 1e-5
        assert abs(r["observed_share"] - obs.get(d, 0) / n) < 1e-5
        dev = obs.get(d, 0) - n * p
        assert abs(r["chi2_contrib"] - dev * dev / (n * p)) < 1e-3
    assert abs(sum(r["expected_share"] for r in rows) - 1.0) < 1e-4


def test_hodges_lehmann_replay(spark):
    row = plans.REGISTRY["weekly_yoy_hodges_lehmann"].build(spark, SF).collect()[0]
    wk = dict(_weekly(spark))
    diffs = []
    for w, v in wk.items():
        nxt = wk.get(w + timedelta(days=364))
        if nxt is not None:
            diffs.append(nxt - v)
    walsh = sorted(
        diffs[i] + diffs[j] for i in range(len(diffs)) for j in range(i, len(diffs))
    )
    m = len(walsh)
    hl2 = walsh[(m + 1) // 2 - 1]
    assert row["n_diffs"] == len(diffs)
    assert row["n_walsh"] == m
    assert row["n_pos"] == sum(1 for d in diffs if d > 0)
    assert abs(row["hl_shift_dollars"] - hl2 / 2.0) < 1e-9


def test_spectral_entropy_replay(spark):
    row = (
        plans.REGISTRY["weekly_revenue_spectral_entropy"].build(spark, SF).collect()[0]
    )
    d = np.array([v for _, v in _weekly(spark)], dtype=np.float64)
    n = len(d)
    x = d - d.mean()
    t = np.arange(n)
    shares = []
    for k in range(1, 27):
        c = (x * np.cos(2 * np.pi * k * t / n)).sum()
        s = (x * np.sin(2 * np.pi * k * t / n)).sum()
        shares.append(c * c + s * s)
    shares = np.array(shares)
    shares = shares / shares.sum()
    h = float(-(shares * np.log(shares)).sum())
    assert row["n_weeks"] == n
    assert row["n_harmonics"] == 26
    assert abs(row["spectral_entropy_nats"] - h) < 1e-3
    assert abs(row["spectral_flatness"] - h / math.log(26)) < 1e-3
    assert abs(row["dominant_share"] - shares.max()) < 1e-3
    assert 0 <= row["spectral_flatness"] <= 1
