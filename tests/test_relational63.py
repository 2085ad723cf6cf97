"""Invariant tests for batch 63: tail dependence vs a python
exceedance count, burstiness vs per-term tf folds, NZV against caret's
definition, and per-nation ACF vs grouped Pearson replays."""

from __future__ import annotations

import math
import re
import statistics

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_tail_dependence_replay(spark):
    row = plans.REGISTRY["price_qty_tail_dependence"].build(spark, SF).collect()[0]
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
            F.round(F.col("l_quantity") * 100).cast("long").alias("q"),
        )
        .collect()
    )
    ps = sorted(r["p"] for r in li)
    qs = sorted(r["q"] for r in li)
    n = len(li)
    p95 = ps[(95 * n + 99) // 100 - 1]
    q95 = qs[(95 * n + 99) // 100 - 1]
    np_ = sum(1 for r in li if r["p"] > p95)
    nq = sum(1 for r in li if r["q"] > q95)
    nboth = sum(1 for r in li if r["p"] > p95 and r["q"] > q95)
    assert row["p95_cents"] == p95 and row["q95_centi"] == q95
    assert row["np"] == np_ and row["nq"] == nq and row["nboth"] == nboth
    assert abs(row["lambda_upper"] - nboth / np_) < 1e-6
    assert abs(row["exceedance_lift"] - nboth * n / (np_ * nq)) < 1e-4
    assert 0 <= row["lambda_upper"] <= 1


def test_burstiness_replay(spark):
    rows = plans.REGISTRY["term_burstiness_topk"].build(spark, SF).collect()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select("text")
        .collect()
    )
    tf: dict = {}
    for r in docs:
        cnt: dict = {}
        for w in re.split(r"\s+", r["text"].strip()):
            cnt[w] = cnt.get(w, 0) + 1
        for w, c in cnt.items():
            tf.setdefault(w, []).append(c)
    assert len(rows) == min(50, len(tf))
    for r in rows:
        tfs = tf[r["token"]]
        assert r["df"] == len(tfs)
        assert r["cf"] == sum(tfs)
        assert abs(r["mean_tf"] - sum(tfs) / len(tfs)) < 1e-3
        if len(tfs) > 1:
            vmr = statistics.variance(tfs) / statistics.mean(tfs)
            assert abs(r["burstiness_vmr"] - vmr) < 1e-3
            assert r["burstiness_vmr"] >= 0
    # top-k by df: every returned df >= the k-th largest df
    dfs = sorted((len(v) for v in tf.values()), reverse=True)
    k = min(50, len(dfs))
    assert min(r["df"] for r in rows) >= dfs[k - 1]


def test_nzv_caret_definition(spark):
    rows = {r["feature"]: r for r in
            plans.REGISTRY["nzv_feature_screen"].build(spark, SF).collect()}
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderpriority", "o_orderstatus", F.year("o_orderdate").alias("yr")
    ).collect()
    for feat, key in (
        ("o_orderpriority", "o_orderpriority"),
        ("o_orderstatus", "o_orderstatus"),
        ("order_year", "yr"),
    ):
        cnt: dict = {}
        for r in o:
            v = str(r[key])
            cnt[v] = cnt.get(v, 0) + 1
        top = sorted(cnt.values(), reverse=True)
        row = rows[feat]
        assert row["n_distinct"] == len(cnt)
        assert row["n_rows"] == len(o)
        assert abs(row["freq_ratio"] - top[0] / top[1]) < 1e-3
        expect_nzv = 1 if (top[0] / top[1] > 19 and len(cnt) / len(o) * 100 < 10) else 0
        assert row["near_zero_variance"] == expect_nzv


def test_nation_acf1_grouped_replay(spark):
    rows = plans.REGISTRY["nation_weekly_acf1"].build(spark, SF).collect()
    weekly = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            spark.read.parquet(f"{SF}/nation.parquet"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "n_name",
            F.date_trunc("week", "o_orderdate").cast("date").alias("w"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"))
        .collect()
    )
    by_nation: dict = {}
    for r in weekly:
        by_nation.setdefault(r["n_name"], []).append((r["w"], r["c"]))
    got = {r["nation"]: r for r in rows}
    for nation, series in by_nation.items():
        series.sort()
        xs = [c for _, c in series[:-1]]
        ys = [c for _, c in series[1:]]
        n = len(xs)
        if n < 2:
            continue
        num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
        den = (n * sum(x * x for x in xs) - sum(xs) ** 2) * (
            n * sum(y * y for y in ys) - sum(ys) ** 2
        )
        r = got[nation]
        assert r["n_pairs"] == n
        if den > 0:
            assert abs(r["acf1"] - num / math.sqrt(den)) < 1e-5
            assert -1 <= r["acf1"] <= 1
