"""Invariant tests for batch 79: SLA percentiles vs sorted-lag
replay, median CI vs rank formulas, octile shape vs direct selection,
association vs a contingency replay."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_ship_sla_replay(spark):
    rows = plans.REGISTRY["priority_ship_sla"].build(spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet").select(
                "o_orderkey", "o_orderdate", "o_orderpriority"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("lag"),
        )
        .collect()
    )
    per = defaultdict(list)
    for r in li:
        per[r["o_orderpriority"]].append(r["lag"])
    assert len(rows) == len(per)
    for r in rows:
        lags = sorted(per[r["priority"]])
        n = len(lags)
        assert r["n_lines"] == n
        assert r["p50_days"] == lags[(n + 1) // 2 - 1]
        assert r["p90_days"] == lags[math.ceil(0.9 * n) - 1]
        assert r["p99_days"] == lags[math.ceil(0.99 * n) - 1]
        w30 = sum(1 for g in lags if g <= 30)
        assert abs(r["within_30d_share"] - w30 / n) < 1e-5
        assert r["p50_days"] <= r["p90_days"] <= r["p99_days"]


def test_median_ci_replay(spark):
    row = plans.REGISTRY["median_ci_order_stats"].build(spark, SF).collect()[0]
    cents = sorted(
        r["c"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .collect()
    )
    n = len(cents)
    lo = math.floor((n - 1.959964 * math.sqrt(n)) / 2.0)
    hi = math.ceil(1.0 + (n + 1.959964 * math.sqrt(n)) / 2.0)
    assert row["n_orders"] == n
    assert row["lo_rank"] == lo
    assert row["hi_rank"] == hi
    assert row["median_cents"] == cents[(n + 1) // 2 - 1]
    assert row["ci_lo_cents"] == cents[lo - 1]
    assert row["ci_hi_cents"] == cents[hi - 1]
    assert row["ci_lo_cents"] <= row["median_cents"] <= row["ci_hi_cents"]


def test_quantile_shape_replay(spark):
    row = plans.REGISTRY["order_value_quantile_shape"].build(spark, SF).collect()[0]
    cents = sorted(
        r["c"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .collect()
    )
    n = len(cents)
    e = {q: cents[math.ceil(q * n / 8) - 1] for q in range(1, 8)}
    bowley = (e[6] + e[2] - 2 * e[4]) / (e[6] - e[2])
    moors = ((e[7] - e[5]) + (e[3] - e[1])) / (e[6] - e[2])
    assert row["q1_cents"] == e[2]
    assert row["median_cents"] == e[4]
    assert row["q3_cents"] == e[6]
    assert abs(row["bowley_skewness"] - bowley) < 1e-5
    assert abs(row["moors_kurtosis"] - moors) < 1e-5
    assert -1 <= row["bowley_skewness"] <= 1


def test_association_replay(spark):
    row = plans.REGISTRY["priority_segment_association"].build(spark, SF).collect()[0]
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderpriority", "c_mktsegment")
        .collect()
    )
    cells: Counter = Counter()
    for r in o:
        cells[(r["o_orderpriority"], r["c_mktsegment"])] += 1
    prios = sorted({p for p, _ in cells})
    segs = sorted({s for _, s in cells})
    tot = sum(cells.values())
    rn = {p: sum(cells.get((p, s), 0) for s in segs) for p in prios}
    cn = {s: sum(cells.get((p, s), 0) for p in prios) for s in segs}
    chi2 = sum(
        (cells.get((p, s), 0) - rn[p] * cn[s] / tot) ** 2 / (rn[p] * cn[s] / tot)
        for p in prios
        for s in segs
    )
    v = math.sqrt(chi2 / (tot * (min(len(prios), len(segs)) - 1)))
    sum_col_max = sum(max(cells.get((p, s), 0) for p in prios) for s in segs)
    overall_max = max(rn.values())
    lam = (sum_col_max - overall_max) / (tot - overall_max)
    assert row["n_orders"] == tot
    assert row["n_priorities"] == len(prios)
    assert row["n_segments"] == len(segs)
    assert abs(row["chi2"] - chi2) < 1e-2
    assert abs(row["cramers_v"] - v) < 1e-5
    assert row["sum_col_max"] == sum_col_max
    assert row["overall_max"] == overall_max
    assert abs(row["gk_lambda"] - lam) < 1e-5
    assert 0 <= row["cramers_v"] <= 1
    assert 0 <= row["gk_lambda"] <= 1
