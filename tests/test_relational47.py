"""Invariant tests for batch 47: AUC recomputed from a quadratic
python rank fold, gains table checked for partition/capture laws,
calibration bins checked against exact rational predictions, and MI
recomputed from first principles plus its information-theory bounds."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_auc_matches_pairwise_recompute(spark):
    row = plans.REGISTRY["discount_return_auc"].build(spark, SF).collect()[0]
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.round(F.col("l_discount") * 100).cast("int").alias("s"),
            (F.col("l_returnflag") == "R").cast("int").alias("y"),
        )
        .groupBy("s", "y")
        .count()
        .collect()
    )
    # per-score counts -> exact pairwise AUC
    pos: dict = {}
    neg: dict = {}
    for r in li:
        (pos if r["y"] == 1 else neg)[r["s"]] = (
            (pos if r["y"] == 1 else neg).get(r["s"], 0) + r["count"]
        )
    n1 = sum(pos.values())
    n0 = sum(neg.values())
    num = 0
    for sp, cp in pos.items():
        for sn, cn in neg.items():
            if sp > sn:
                num += 2 * cp * cn
            elif sp == sn:
                num += cp * cn
    assert row["n_pos"] == n1 and row["n_neg"] == n0
    assert abs(row["auc"] - num / (2 * n1 * n0)) < 1e-6
    assert abs(row["gini"] - (2 * row["auc"] - 1)) < 2e-6
    assert 0.0 <= row["auc"] <= 1.0


def test_gains_table_laws(spark):
    rows = sorted(
        plans.REGISTRY["model_gains_table"].build(spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert sum(r["n_orders"] for r in rows) == n_orders
    # ntile buckets differ by at most 1
    sizes = {r["n_orders"] for r in rows}
    assert max(sizes) - min(sizes) <= 1
    tot_pos = sum(r["n_pos"] for r in rows)
    cum = 0
    base = tot_pos / n_orders
    for r in rows:
        cum += r["n_pos"]
        assert abs(r["cum_capture"] - cum / tot_pos) < 1e-6
        assert abs(r["pos_rate"] - r["n_pos"] / r["n_orders"]) < 1e-6
        assert abs(r["lift"] - (r["n_pos"] / r["n_orders"]) / base) < 1e-5
    assert abs(rows[-1]["cum_capture"] - 1.0) < 1e-9


def test_calibration_bins_cover_and_order(spark):
    rows = sorted(
        plans.REGISTRY["calibration_bins"].build(spark, SF).collect(),
        key=lambda r: r["bin"],
    )
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert [r["bin"] for r in rows] == list(range(10))
    assert sum(r["n_orders"] for r in rows) == n_orders
    # equal-width bins over a percent-rank are ~equal-count; mean_pred
    # is strictly increasing and sits inside each bin's width
    preds = [r["mean_pred"] for r in rows]
    assert preds == sorted(preds)
    for r in rows:
        assert r["bin"] / 10 - 1e-9 <= r["mean_pred"] <= (r["bin"] + 1) / 10 + 1e-9
        assert abs(r["calib_gap"] - (r["frac_pos"] - r["mean_pred"])) < 2e-6


def test_mutual_info_first_principles(spark):
    row = plans.REGISTRY["segment_priority_mutual_info"].build(spark, SF).collect()[0]
    cells = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .count()
        .collect()
    )
    n = sum(r["count"] for r in cells)
    pi: dict = {}
    pj: dict = {}
    for r in cells:
        pi[r["c_mktsegment"]] = pi.get(r["c_mktsegment"], 0) + r["count"]
        pj[r["o_orderpriority"]] = pj.get(r["o_orderpriority"], 0) + r["count"]
    mi = sum(
        (r["count"] / n)
        * math.log(r["count"] * n / (pi[r["c_mktsegment"]] * pj[r["o_orderpriority"]]))
        for r in cells
    )
    h_i = -sum(v / n * math.log(v / n) for v in pi.values())
    h_j = -sum(v / n * math.log(v / n) for v in pj.values())
    h_ij = -sum(r["count"] / n * math.log(r["count"] / n) for r in cells)
    assert row["n"] == n
    assert abs(row["mutual_info"] - mi) < 1e-6
    assert abs(row["h_segment"] - h_i) < 1e-6
    assert abs(row["h_priority"] - h_j) < 1e-6
    assert abs(row["h_joint"] - h_ij) < 1e-6
    # information-theory laws: MI >= 0, MI = Hi + Hj - Hij, 0 <= NMI <= 1
    assert row["mutual_info"] >= -1e-9
    assert abs(row["h_segment"] + row["h_priority"] - row["h_joint"] - row["mutual_info"]) < 5e-6
    assert -1e-9 <= row["nmi"] <= 1 + 1e-9
