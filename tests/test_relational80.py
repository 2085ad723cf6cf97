"""Invariant tests for batch 80: Chatterjee ξ vs a pure-Python rank
replay, forecast metrics vs direct recomputation, JS divergence vs a
Counter replay (plus metric-axiom checks), turning points vs a scan."""

from __future__ import annotations

import math
from collections import Counter

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _daily(spark):
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.count("*").alias("x"),
            F.expr(
                "sum(cast(round(o_totalprice * 100) as bigint)) DIV 100"
            ).alias("y"),
        )
        .collect()
    )
    return [(r["d"], r["x"], r["y"]) for r in rows]


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
    return [r["dollars"] for r in sorted(rows, key=lambda r: r["w"])]


def test_chatterjee_xi_replay(spark):
    row = plans.REGISTRY["daily_traffic_revenue_xi"].build(spark, SF).collect()[0]
    pts = _daily(spark)
    n = len(pts)
    ys = sorted(y for _, _, y in pts)
    r_of = {}
    t_of = Counter(y for _, _, y in pts)
    for i, y in enumerate(ys):
        r_of[y] = i + 1  # last index of the tie block = count(y_j <= y)
    ordered = sorted(pts, key=lambda p: (p[1], p[2], p[0]))
    num = sum(
        abs(r_of[ordered[i + 1][2]] - r_of[ordered[i][2]]) for i in range(n - 1)
    )
    den = sum(
        (n - r_of[y] + t_of[y]) * (r_of[y] - t_of[y]) for _, _, y in pts
    )
    xi = 1.0 - n * num / (2.0 * den)
    assert row["n_days"] == n
    assert row["sum_abs_rank_steps"] == num
    assert int(row["denom_pairs"]) == den
    assert abs(row["xi"] - xi) < 1e-5
    # dependence of revenue on traffic should be decidedly positive
    assert row["xi"] > 0


def test_forecast_eval_replay(spark):
    row = plans.REGISTRY["weekly_forecast_theil_eval"].build(spark, SF).collect()[0]
    d = _weekly(spark)
    ev = [
        (d[i], d[i - 1], d[i - 4])
        for i in range(4, len(d))
        if d[i - 1] > 0
    ]
    abs_err = sum(abs(a4 - a) for a, _, a4 in ev)
    actual = sum(a for a, _, _ in ev)
    smape = sum(2.0 * abs(a4 - a) / (abs(a4) + abs(a)) for a, _, a4 in ev) / len(ev)
    u2 = math.sqrt(
        sum(((a4 - a) / a1) ** 2 for a, a1, a4 in ev)
        / sum(((a - a1) / a1) ** 2 for a, a1, _ in ev)
    )
    assert row["n_eval_weeks"] == len(ev)
    assert row["abs_err_dollars"] == abs_err
    assert row["actual_dollars"] == actual
    assert abs(row["wmape"] - abs_err / actual) < 1e-5
    assert abs(row["smape"] - smape) < 1e-5
    assert abs(row["theil_u2"] - u2) < 1e-5
    assert 0 <= row["smape"] <= 2


def test_js_divergence_replay(spark):
    rows = plans.REGISTRY["segment_brand_js_divergence"].build(spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("c_mktsegment", "p_brand")
        .collect()
    )
    cells: Counter = Counter((r["c_mktsegment"], r["p_brand"]) for r in li)
    segs = sorted({s for s, _ in cells})
    brands = sorted({b for _, b in cells})
    tot = {s: sum(cells.get((s, b), 0) for b in brands) for s in segs}
    assert len(rows) == len(segs) * (len(segs) - 1) // 2
    by_pair = {(r["seg_a"], r["seg_b"]): r for r in rows}
    for i, sa in enumerate(segs):
        for sb in segs[i + 1 :]:
            js = 0.0
            for b in brands:
                p = cells.get((sa, b), 0) / tot[sa]
                q = cells.get((sb, b), 0) / tot[sb]
                if p > 0:
                    js += 0.5 * p * math.log(2.0 * p / (p + q))
                if q > 0:
                    js += 0.5 * q * math.log(2.0 * q / (p + q))
            r = by_pair[(sa, sb)]
            assert r["lines_a"] == tot[sa]
            assert r["lines_b"] == tot[sb]
            assert abs(r["js_nats"] - js) < 1e-5
            assert abs(r["js_distance"] - math.sqrt(max(js, 0.0))) < 1e-5
            assert 0 <= r["js_nats"] <= math.log(2) + 1e-9


def test_turning_points_replay(spark):
    row = plans.REGISTRY["weekly_revenue_turning_points"].build(spark, SF).collect()[0]
    d = _weekly(spark)
    n = len(d)
    t = sum(
        1
        for i in range(1, n - 1)
        if (d[i] - d[i - 1]) * (d[i + 1] - d[i]) < 0
    )
    exp_t = 2.0 * (n - 2) / 3.0
    z = (t - exp_t) / math.sqrt((16.0 * n - 29.0) / 90.0)
    assert row["n_weeks"] == n
    assert row["n_turning_points"] == t
    assert abs(row["expected_tp"] - exp_t) < 1e-5
    assert abs(row["z_stat"] - z) < 1e-5
