"""Invariant tests for batch 43: Bloom membership replayed with
hashlib, KMV signatures replayed with a literal sort, ESD rounds
replayed as an iterative python loop."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational43 import (
    _BLOOM_K,
    _BLOOM_M,
    _KMV_K,
)

SF = "/root/testdata/sf0.01"


def _bloom_pos(k: int) -> list[int]:
    return [
        int(hashlib.md5(f"{k}#{j}".encode()).hexdigest()[:8], 16) % _BLOOM_M
        for j in range(_BLOOM_K)
    ]


def test_bloom_audit_replays_and_no_false_negatives(spark):
    row = plans.REGISTRY["bloom_filter_join_audit"].build(spark, SF).collect()[0]
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    build = {
        r["o_orderkey"]
        for r in o.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        ).collect()
    }
    probe = {r["l_orderkey"] for r in li.select("l_orderkey").distinct().collect()}
    bits = {p for k in build for p in _bloom_pos(k)}
    passed = {k for k in probe if all(p in bits for p in _bloom_pos(k))}
    true = probe & build
    assert row["n_build"] == len(build)
    assert row["n_probe"] == len(probe)
    assert row["n_true"] == len(true)
    assert row["n_pass"] == len(passed)
    assert row["n_set_bits"] == len(bits)
    # a Bloom filter NEVER false-negatives
    assert true <= passed
    assert row["n_false_pos"] == len(passed - true)
    fp = len(passed - true) / (len(probe) - len(true))
    assert abs(row["fp_rate"] - fp) < 1e-5
    theory = (1 - math.exp(-_BLOOM_K * len(build) / _BLOOM_M)) ** _BLOOM_K
    assert abs(row["fp_theory"] - theory) < 1e-5
    # measured rate within an order of magnitude of theory (tiny-sample
    # noise allowed; at sf0.01 both are small)
    assert fp <= max(10 * theory, 0.01)


def test_kmv_estimate_replays_and_brackets_exact(spark):
    row = plans.REGISTRY["kmv_jaccard_audit"].build(spark, SF).collect()[0]
    o = spark.read.parquet(f"{SF}/orders.parquet")

    def keys(y):
        return {
            r["o_custkey"]
            for r in o.filter(
                (F.col("o_orderdate") >= f"{y}-01-01")
                & (F.col("o_orderdate") < f"{y + 1}-01-01")
            ).collect()
        }

    a, b = keys(1996), keys(1997)
    exact = len(a & b) / len(a | b)
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["n_intersect"] == len(a & b)
    assert row["n_union"] == len(a | b)
    assert abs(row["exact_jaccard"] - exact) < 1e-5

    def sig(s):
        return sorted(hashlib.md5(str(k).encode()).hexdigest() for k in s)[:_KMV_K]

    sa, sb = set(sig(a)), set(sig(b))
    un = sorted(sa | sb)[:_KMV_K]
    shared = sum(1 for h in un if h in sa and h in sb)
    assert row["kmv_shared"] == shared
    assert abs(row["kmv_estimate"] - shared / _KMV_K) < 1e-5
    # k=256 gives ~1/16 standard error; assert a loose 4-sigma bracket
    assert abs(row["kmv_estimate"] - exact) < 4 / math.sqrt(_KMV_K) + 0.05


def test_esd_rounds_replay_iteratively(spark):
    rows = sorted(
        plans.REGISTRY["weekly_esd_outliers"].build(spark, SF).collect(),
        key=lambda r: r["esd_round"],
    )
    assert [r["esd_round"] for r in rows] == [1, 2, 3]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    monday = F.date_sub(
        F.col("l_shipdate").cast("date"),
        (F.dayofweek(F.col("l_shipdate").cast("date")) + F.lit(5)) % F.lit(7),
    )
    wk = {
        r["x"]: r["y"]
        for r in li.groupBy(monday.alias("x"))
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("y"))
        .collect()
    }
    remaining = dict(wk)
    for r in rows:
        n = len(remaining)
        mean = sum(remaining.values()) / n
        var = (sum(v * v for v in remaining.values()) - sum(remaining.values()) ** 2 / n) / (n - 1)
        std = math.sqrt(var)
        best = max(remaining, key=lambda x: (abs((remaining[x] - mean) / std), ))
        # tie-break on week: find max |z| then smallest week among maxima
        zmax = max(abs((v - mean) / std) for v in remaining.values())
        cands = sorted(
            x for x, v in remaining.items() if abs((v - mean) / std) >= zmax - 1e-12
        )
        best = cands[0]
        z = (remaining[best] - mean) / std
        assert r["week_start"] == best
        assert r["revenue_cents"] == remaining[best]
        assert abs(r["z_score"] - z) < 1e-3
        assert r["is_outlier"] == (abs(z) > 3.0)
        del remaining[best]
    # the three emitted weeks are distinct
    assert len({r["week_start"] for r in rows}) == 3
