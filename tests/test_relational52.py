"""Invariant tests for batch 52: median polish checked against a full
python replay of both sweeps, the rolling median against per-row
sorted-window order statistics, the downsample audit against binomial
bounds + exact hash replay, and the k-anonymity summary against a
python contingency rebuild."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def test_median_polish_replay(spark):
    rows = plans.REGISTRY["median_polish_revenue"].build(spark, SF).collect()
    cells = {(r["nation"], r["yq"]): r["cell_cents"] for r in rows}
    # python replay of 2 sweeps
    res = dict(cells)
    row_eff = {na: 0 for na, _ in res}
    col_eff = {yq: 0 for _, yq in res}
    for _ in range(2):
        by_row: dict = {}
        for (na, yq), v in res.items():
            by_row.setdefault(na, []).append(v)
        rm = {na: _lower_median(vs) for na, vs in by_row.items()}
        for k in res:
            res[k] -= rm[k[0]]
        for na in rm:
            row_eff[na] += rm[na]
        by_col: dict = {}
        for (na, yq), v in res.items():
            by_col.setdefault(yq, []).append(v)
        cm = {yq: _lower_median(vs) for yq, vs in by_col.items()}
        for k in res:
            res[k] -= cm[k[1]]
        for yq in cm:
            col_eff[yq] += cm[yq]
    for r in rows:
        k = (r["nation"], r["yq"])
        assert r["row_eff"] == row_eff[r["nation"]]
        assert r["col_eff"] == col_eff[r["yq"]]
        assert r["residual_cents"] == res[k]
        # decomposition reassembles exactly
        assert (
            r["row_eff"] + r["col_eff"] + r["residual_cents"] == r["cell_cents"]
        )


def test_rolling_median_order_statistics(spark):
    rows = plans.REGISTRY["rolling_median_demand"].build(spark, SF).collect()
    by_brand: dict = {}
    for r in rows:
        by_brand.setdefault(r["brand"], []).append(r)
    for brand, rs in by_brand.items():
        rs.sort(key=lambda r: r["week_start"])
        series = [r["demand_centi"] for r in rs]
        for i, r in enumerate(rs):
            win = series[max(0, i - 4) : i + 1]
            assert r["win_n"] == len(win)
            assert r["rolling_median_centi"] == _lower_median(win)


def test_downsample_hash_replay_and_balance(spark):
    rows = plans.REGISTRY["class_balance_downsample"].build(spark, SF).collect()
    for r in rows:
        assert r["n_minority"] == min(r["n_pos"], r["n_neg"])
        assert r["n_majority"] == max(r["n_pos"], r["n_neg"])
        assert 0 < r["n_maj_kept"] <= r["n_majority"]
        # achieved count within 5 sigma of the target (minority size)
        target = r["n_minority"]
        sigma = math.sqrt(target)
        assert abs(r["n_maj_kept"] - target) < 5 * sigma + 5
        assert abs(r["kept_ratio"] - r["n_maj_kept"] / r["n_majority"]) < 1e-6
        assert abs(
            r["balance_after"]
            - r["n_minority"] / (r["n_minority"] + r["n_maj_kept"])
        ) < 1e-6
        # post-balance minority share is near 0.5
        assert 0.4 < r["balance_after"] < 0.6
    # exact hash replay for one segment
    seg = rows[0]["segment"]
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    ret = {
        r["l_orderkey"]
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
        .collect()
    }
    lab = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_mktsegment") == seg)
        .select("o_orderkey")
        .collect()
    )
    negs = [r["o_orderkey"] for r in lab if r["o_orderkey"] not in ret]
    poss = [r["o_orderkey"] for r in lab if r["o_orderkey"] in ret]
    n_pos, n_neg = len(poss), len(negs)
    maj_keys = poss if n_pos > n_neg else negs
    mino, majo = min(n_pos, n_neg), max(n_pos, n_neg)
    kept = sum(
        1
        for k in maj_keys
        if int(hashlib.md5(f"bal:{k}".encode()).hexdigest()[:6], 16) * majo
        < mino * 16777216
    )
    row = next(r for r in rows if r["segment"] == seg)
    assert row["n_pos"] == n_pos and row["n_neg"] == n_neg
    assert row["n_maj_kept"] == kept


def test_k_anonymity_summary(spark):
    row = plans.REGISTRY["k_anonymity_audit"].build(spark, SF).collect()[0]
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    qi = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_mktsegment", "n_name", F.year("o_orderdate").alias("yr"),
            "o_orderpriority",
        )
        .collect()
    )
    cls: dict = {}
    for r in qi:
        k = (r["c_mktsegment"], r["n_name"], r["yr"])
        cls.setdefault(k, []).append(r["o_orderpriority"])
    assert row["n_classes"] == len(cls)
    assert row["n_rows"] == len(qi)
    ks = [len(v) for v in cls.values()]
    ls = [len(set(v)) for v in cls.values()]
    assert row["k_min"] == min(ks)
    assert row["l_min"] == min(ls)
    assert row["classes_below_k5"] == sum(1 for k in ks if k < 5)
    assert row["rows_below_k5"] == sum(k for k in ks if k < 5)
    assert row["classes_below_l2"] == sum(1 for l in ls if l < 2)
