"""Invariant tests for the composite training-data batch (relational18):
first-principles identities the DuckDB hash comparison can't see."""

from __future__ import annotations

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_golden_record_clusters_are_consistent(spark):
    """Every cluster has ≥2 members (edges created it), its id is the
    min member key, and the canonical name is that member's name."""
    golden = {
        r["cluster_id"]: r
        for r in plans.REGISTRY["entity_golden_record"].build(spark, SF).collect()
    }
    assert golden and all(r["n_members"] >= 2 for r in golden.values())
    names = {
        r["c_custkey"]: r["c_name"]
        for r in spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_custkey", "c_name")
        .collect()
    }
    for cid, r in golden.items():
        assert names[cid] == r["canonical_name"]


def test_golden_record_covers_all_paired_customers(spark):
    """Union of cluster members == set of customers appearing in the
    fuzzy pair edge set; total membership is consistent."""
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational9 import (
        fuzzy_name_pairs,
    )

    pairs = fuzzy_name_pairs(spark, SF).select("custkey_1", "custkey_2").collect()
    paired = {r["custkey_1"] for r in pairs} | {r["custkey_2"] for r in pairs}
    total_members = (
        plans.REGISTRY["entity_golden_record"]
        .build(spark, SF)
        .agg(F.sum("n_members"))
        .first()[0]
    )
    assert total_members == len(paired)


def test_seasonal_decompose_identity(spark):
    """residual == round(detrended - seasonal, 4) for every row, and the
    trend is the exact centered 5-week floor average."""
    rows = plans.REGISTRY["weekly_seasonal_decompose"].build(spark, SF).collect()
    assert len(rows) > 50
    for r in rows:
        detrended = float(r["dollars"] - r["trend_dollars"])
        assert abs(r["residual"] - round(detrended - r["seasonal"], 4)) < 1e-9

    weekly = sorted(
        (r["week_start"], r["dollars"])
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("week_start")
        .agg(F.expr("sum(cents) DIV 100").alias("dollars"))
        .collect()
    )
    trend = {r["week_start"]: r["trend_dollars"] for r in rows}
    for i in range(2, len(weekly) - 2):
        wk = weekly[i][0]
        if wk in trend:
            expect = sum(d for _, d in weekly[i - 2 : i + 3]) // 5
            assert trend[wk] == expect


def test_bigram_pmi_support_and_lift(spark):
    """Minimum support holds, and the lift recomputes from the counts."""
    rows = plans.REGISTRY["bigram_pmi_topk"].build(spark, SF).collect()
    assert len(rows) == 30
    toks = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select(F.split(F.trim("text"), r"\s+").alias("tk"))
    )
    n_uni = toks.select(F.explode("tk")).count()
    n_bi = toks.select((F.size("tk") - 1).alias("m")).agg(F.sum("m")).first()[0]
    for r in rows:
        assert r["c_xy"] >= 5
        lift = (r["c_xy"] * float(n_uni) * n_uni) / (float(n_bi) * r["c1"] * r["c2"])
        assert abs(r["lift"] - round(lift, 6)) < 1e-6


def test_negative_samples_disjoint_from_positives(spark):
    """No sampled negative is a real (customer, supplier) transaction,
    every customer gets ≤4 draws, and all customers are covered."""
    neg = plans.REGISTRY["negative_sample_pairs"].build(spark, SF)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pos = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_suppkey").alias("neg_suppkey"),
        )
        .distinct()
    )
    assert neg.join(pos, ["custkey", "neg_suppkey"], "inner").count() == 0
    per_cust = neg.groupBy("custkey").count().agg(F.max("count")).first()[0]
    assert per_cust <= 4
    # a customer whose 4 draws ALL hit positives keeps zero negatives
    # (~1% at sf0.01's ~33% positive density) — require near-full coverage
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert neg.select("custkey").distinct().count() >= 0.9 * n_cust
