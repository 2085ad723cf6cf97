"""Invariant tests for batch 73: DiD vs a four-cell replay, price
spells vs a per-part scan, retention vs a set-lookup replay, MRL vs a
sorted-gap integral."""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_did_replay(spark):
    row = plans.REGISTRY["segment_value_did"].build(spark, SF).collect()[0]
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("g"),
            F.col("o_orderdate").cast("date").alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    dates = sorted(r["d"] for r in o)
    mdate = dates[(len(dates) + 1) // 2 - 1]
    cells = defaultdict(list)
    for r in o:
        cells[(r["g"], 1 if r["d"] > mdate else 0)].append(r["cents"])

    def mean(xs):
        return sum(xs) / len(xs)

    def mvar(xs):
        m = mean(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1) / len(xs)

    did = (mean(cells[(1, 1)]) - mean(cells[(1, 0)])) - (
        mean(cells[(0, 1)]) - mean(cells[(0, 0)])
    )
    se = math.sqrt(sum(mvar(v) for v in cells.values()))
    assert row["n_t_pre"] == len(cells[(1, 0)])
    assert row["n_t_post"] == len(cells[(1, 1)])
    assert row["n_c_pre"] == len(cells[(0, 0)])
    assert row["n_c_post"] == len(cells[(0, 1)])
    assert abs(row["treated_pre_mean"] - mean(cells[(1, 0)])) < 1e-1
    assert abs(row["did_cents"] - did) < 1e-2
    assert abs(row["did_se"] - se) < 1e-2
    assert abs(row["did_t"] - did / se) < 1e-3


def test_price_stickiness_replay(spark):
    row = plans.REGISTRY["part_price_stickiness"].build(spark, SF).collect()[0]
    pw = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") > 0)
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.date_trunc("week", "l_shipdate").cast("date").alias("week"),
        )
        .agg(
            F.min(
                F.round(F.lit(100.0) * F.col("l_extendedprice") / F.col("l_quantity"))
                .cast("long")
            ).alias("p")
        )
        .collect()
    )
    per = defaultdict(list)
    for r in pw:
        per[r["part"]].append((r["week"], r["p"]))
    lens = []
    for part, seq in per.items():
        seq.sort()
        run = 1
        for (_, a), (_, b) in zip(seq, seq[1:]):
            if b == a:
                run += 1
            else:
                lens.append(run)
                run = 1
        lens.append(run)
    n_spells = len(lens)
    n_pw = sum(lens)
    lens.sort()
    med = lens[(n_spells + 1) // 2 - 1]
    assert row["n_parts"] == len(per)
    assert row["n_spells"] == n_spells
    assert row["n_part_weeks"] == n_pw
    assert abs(row["avg_spell_weeks"] - n_pw / n_spells) < 1e-3
    assert row["median_spell_weeks"] == med
    assert abs(row["change_rate"] - (n_spells - len(per)) / n_pw) < 1e-5


def test_retention_replay(spark):
    rows = plans.REGISTRY["event_retention_curve"].build(spark, SF).collect()
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import events

    ud = (
        events(spark, SF)
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .collect()
    )
    days = defaultdict(set)
    for r in ud:
        days[r["user_id"]].add(r["day"])
    import datetime as dt

    first = {u: min(ds) for u, ds in days.items()}
    assert len(rows) == 4
    for r in rows:
        k = r["day_k"]
        ret = sum(
            1
            for u, d0 in first.items()
            if d0 + dt.timedelta(days=k) in days[u]
        )
        assert r["n_users"] == len(first)
        assert r["n_retained"] == ret
        assert abs(r["retention"] - ret / len(first)) < 1e-5


def test_mrl_replay(spark):
    rows = plans.REGISTRY["order_gap_mean_residual_life"].build(spark, SF).collect()
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("d"),
            "o_orderkey",
        )
        .collect()
    )
    per = defaultdict(list)
    for r in o:
        per[r["o_custkey"]].append((r["d"], r["o_orderkey"]))
    gaps = []
    for _, seq in per.items():
        seq.sort()
        for (a, _), (b, _) in zip(seq, seq[1:]):
            gaps.append((b - a).days)
    gaps.sort()
    n = len(gaps)
    assert len(rows) == 9
    for r in rows:
        q = r["decile"]
        t = gaps[(q * n + 9) // 10 - 1]
        tail = [g for g in gaps if g > t]
        assert r["threshold_days"] == t
        assert r["n_tail"] == len(tail)
        if tail:
            mrl = sum(g - t for g in tail) / len(tail)
            assert abs(r["mrl_days"] - mrl) < 1e-3
        else:
            assert r["mrl_days"] is None
    # thresholds are monotone in the decile
    ts = [r["threshold_days"] for r in sorted(rows, key=lambda x: x["decile"])]
    assert ts == sorted(ts)
