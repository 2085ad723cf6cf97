"""Invariant tests for batch 77: energy distance vs an O(n·m) pair
replay, permutation entropy vs a triple scan, conformal vs a sorted
split replay, load profile vs a Counter replay."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans
from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import events

SF = "/root/testdata/sf0.01"


def _weekly(spark):
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.date_trunc("week", "o_orderdate").cast("date").alias("w"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("w")
        .agg(F.expr("sum(cents) DIV 100").alias("y"))
        .collect()
    )
    return [y for _, y in sorted((r["w"], r["y"]) for r in rows)]


def test_energy_distance_replay(spark):
    row = plans.REGISTRY["segment_value_energy_distance"].build(spark, SF).collect()[0]
    x = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.col("c_mktsegment").isin("BUILDING", "FURNITURE"))
        .select(
            "c_mktsegment",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    import numpy as np

    a = np.array(sorted(r["cents"] for r in x if r["c_mktsegment"] == "BUILDING"))
    b = np.array(sorted(r["cents"] for r in x if r["c_mktsegment"] == "FURNITURE"))
    n, m = len(a), len(b)
    exy = float(np.abs(a[:, None] - b[None, :]).sum()) / (n * m)
    exx = float(np.abs(a[:, None] - a[None, :]).sum()) / (n * n)
    eyy = float(np.abs(b[:, None] - b[None, :]).sum()) / (m * m)
    d = 2 * exy - exx - eyy
    assert (row["n_building"], row["n_furniture"]) == (n, m)
    assert abs(row["exy"] - exy) < 0.01
    assert abs(row["exx"] - exx) < 0.01
    assert abs(row["eyy"] - eyy) < 0.01
    assert abs(row["energy_distance"] - d) < 1e-3
    assert row["energy_distance"] >= 0


def test_permutation_entropy_replay(spark):
    row = plans.REGISTRY["weekly_permutation_entropy"].build(spark, SF).collect()[0]
    ys = _weekly(spark)
    pats: Counter = Counter()
    for i in range(len(ys) - 2):
        y0, y1, y2 = ys[i], ys[i + 1], ys[i + 2]
        pats[(y1 > y0) + 2 * (y2 > y0) + 4 * (y2 > y1)] += 1
    n = sum(pats.values())
    h = -sum((c / n) * math.log(c / n) for c in pats.values())
    assert row["n_triples"] == n
    assert row["n_patterns"] == len(pats)
    assert abs(row["perm_entropy"] - h) < 1e-5
    assert abs(row["normalized_entropy"] - h / math.log(6)) < 1e-5
    assert 0 <= row["perm_entropy"] <= math.log(8) + 1e-9


def test_conformal_replay(spark):
    row = plans.REGISTRY["conformal_coverage_audit"].build(spark, SF).collect()[0]
    ys = _weekly(spark)
    aes = [abs(ys[i] - ys[i - 52]) for i in range(52, len(ys))]
    nr = len(aes)
    ncal = (4 * nr) // 5
    cal = aes[:ncal]
    tst = aes[ncal:]
    scal = sorted(cal)
    rk = math.ceil(0.9 * (len(cal) + 1))
    q90 = scal[rk - 1]
    cov = sum(1 for a in tst if a <= q90) / len(tst)
    assert row["n_calibration"] == ncal
    assert row["n_test"] == nr - ncal
    assert row["q90_dollars"] == q90
    assert abs(row["test_coverage"] - cov) < 1e-5


def test_load_profile_replay(spark):
    rows = plans.REGISTRY["event_load_peak_profile"].build(spark, SF).collect()
    ev = events(spark, SF).select("ts").collect()
    cells = defaultdict(int)
    for r in ev:
        t = r["ts"]
        cells[(t.isoweekday(), t.hour)] += 1
    per = defaultdict(dict)
    for (dow, hr), c in cells.items():
        per[dow][hr] = c
    assert len(rows) == len(per)
    for r in rows:
        hrs = per[r["iso_weekday"]]
        peak = min(hrs, key=lambda h: (-hrs[h], h))
        tot = sum(hrs.values())
        assert r["peak_hour"] == peak
        assert r["peak_count"] == hrs[peak]
        assert r["day_total"] == tot
        assert abs(r["peak_to_average"] - hrs[peak] * len(hrs) / tot) < 1e-3
        assert r["peak_to_average"] >= 1.0
