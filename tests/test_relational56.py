"""Invariant tests for batch 56: TF-IDF cosine replayed from a python
sparse-vector build, capture-recapture against set arithmetic and the
estimator ordering law, split gains against a python contingency fold
(gain >= 0 law), and the runs test against a direct sequence scan."""

from __future__ import annotations

import math
import re

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_tfidf_cosine_replay(spark):
    rows = plans.REGISTRY["tfidf_cosine_pairs"].build(spark, SF).collect()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select("doc_id", "text")
        .collect()
    )
    tf: dict = {}
    for r in docs:
        cnt: dict = {}
        for w in re.split(r"\s+", r["text"].strip()):
            cnt[w] = cnt.get(w, 0) + 1
        tf[r["doc_id"]] = cnt
    df: dict = {}
    for cnt in tf.values():
        for w in cnt:
            df[w] = df.get(w, 0) + 1
    n = len(tf)
    vecs = {
        d: {w: c * n / df[w] for w, c in cnt.items() if df[w] <= 25}
        for d, cnt in tf.items()
    }
    nrm = {d: math.sqrt(sum(v * v for v in vec.values())) for d, vec in vecs.items()}
    assert len(rows) == 20
    prev = None
    for r in rows:
        va, vb = vecs[r["id_1"]], vecs[r["id_2"]]
        dot = sum(va[w] * vb[w] for w in va.keys() & vb.keys())
        sim = dot / (nrm[r["id_1"]] * nrm[r["id_2"]])
        assert abs(r["tfidf_cosine"] - sim) < 5e-4
        if prev is not None:
            assert r["tfidf_cosine"] <= prev + 1e-9
        prev = r["tfidf_cosine"]


def test_capture_recapture_sets(spark):
    row = plans.REGISTRY["customer_capture_recapture"].build(spark, SF).collect()[0]
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey", "o_orderdate"
    ).collect()
    import datetime as dt

    cut = dt.datetime(1996, 7, 1)
    s1 = {r["o_custkey"] for r in o if r["o_orderdate"] < cut}
    s2 = {r["o_custkey"] for r in o if r["o_orderdate"] >= cut}
    assert row["n1"] == len(s1) and row["n2"] == len(s2)
    assert row["m"] == len(s1 & s2)
    lp = len(s1) * len(s2) / len(s1 & s2)
    chap = (len(s1) + 1) * (len(s2) + 1) / (len(s1 & s2) + 1) - 1
    assert abs(row["lincoln_petersen"] - lp) < 0.1
    assert abs(row["chapman"] - chap) < 0.1
    # estimator laws: estimates exceed every observed count and
    # Chapman corrects LP downward; true population >= union size
    union = len(s1 | s2)
    assert row["chapman"] <= row["lincoln_petersen"] + 1e-9
    assert row["lincoln_petersen"] >= row["m"]
    # SE is 0 exactly when one survey is fully contained in the other
    if row["m"] < min(row["n1"], row["n2"]):
        assert row["chapman_se"] > 0
    else:
        assert row["chapman_se"] == 0
    # LP should be in the ballpark of (>= ) the union we saw
    assert row["lincoln_petersen"] > union * 0.9


def test_split_gain_nonnegative_and_replay(spark):
    rows = plans.REGISTRY["split_gain_screen"].build(spark, SF).collect()
    assert {r["feature"] for r in rows} == {
        "o_orderpriority",
        "c_mktsegment",
        "customer_nation",
    }
    for r in rows:
        # Gini gain of any split is non-negative (convexity)
        assert r["gini_gain"] >= -1e-9
        assert 0 <= r["gini_children"] <= r["gini_parent"] + 1e-9
        assert abs(
            r["gini_gain"] - (r["gini_parent"] - r["gini_children"])
        ) < 2e-6
        assert r["gini_parent"] <= 0.5 + 1e-9
    # parent impurity identical across features (same label)
    assert len({r["gini_parent"] for r in rows}) == 1
    # nation has 25 levels, segment and priority 5
    lv = {r["feature"]: r["n_levels"] for r in rows}
    assert lv["customer_nation"] == 25
    assert lv["c_mktsegment"] == 5 and lv["o_orderpriority"] == 5


def test_runs_test_replay(spark):
    row = plans.REGISTRY["daily_return_runs_test"].build(spark, SF).collect()[0]
    daily = sorted(
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("r"),
            F.count("*").alias("n"),
        )
        .collect(),
        key=lambda r: r["d"],
    )
    flags = [1 if 2 * r["r"] > r["n"] else 0 for r in daily]
    runs = 1 + sum(1 for a, b in zip(flags, flags[1:]) if a != b)
    n = len(flags)
    n1 = sum(flags)
    n0 = n - n1
    mu = 1 + 2 * n1 * n0 / n
    var = (2 * n1 * n0) * (2 * n1 * n0 - n) / (n * n * (n - 1))
    assert row["n_days"] == n and row["n_high_days"] == n1
    assert row["runs"] == runs
    assert abs(row["expected_runs"] - mu) < 1e-3
    if var > 0:
        assert abs(row["z_runs"] - (runs - mu) / math.sqrt(var)) < 1e-5
