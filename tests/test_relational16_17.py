"""Invariant tests for the TPC-H-completion batch (relational16) and the
retrieval/sampling batch (relational17) — properties the DuckDB hash
comparison can't see: plan shapes, first-principles BFS distances on a
hand graph, and sample-membership stability under repartitioning."""

from __future__ import annotations

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans
from grocery_store_sales_forecasting_etl_pipeline_spark.operators.graph import bfs_depths

SF = "/root/testdata/sf0.01"


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_disjunctive_join_is_hash_not_nested_loop(spark):
    """Q19's OR-residual must plan as a broadcast HASH join on the
    extracted p_partkey equi-key — a BroadcastNestedLoopJoin here is the
    cartesian-product failure mode the query exists to guard against."""
    plan = _executed_plan(
        plans.REGISTRY["brand_size_disjunctive_rev"].build(spark, SF)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_custdist_zero_bucket_counts_orderless_customers(spark):
    """Q13's point: customers with no qualifying orders land in bucket 0
    (ON-clause filter, NOT a post-join WHERE)."""
    out = {
        r["c_count"]: r["custdist"]
        for r in plans.REGISTRY["customer_order_distribution"].build(spark, SF).collect()
    }
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    with_orders = (
        o.filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey")
        .distinct()
        .count()
    )
    n_customers = c.select("c_custkey").distinct().count()
    assert out.get(0, 0) == n_customers - with_orders
    assert sum(out.values()) == n_customers


def test_bfs_depths_hand_graph(spark):
    """First-principles BFS on a path-plus-branch graph:
    1-2-3-4-5 chain with branch 3-6; seed {1}; max_depth=3 must reach
    exactly depths {1:0, 2:1, 3:2, 4:3, 6:3} and NOT node 5 (depth 4)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (3, 6)], ["u", "v"]
    )
    seeds = spark.createDataFrame([(1,)], ["v"])
    got = {r["v"]: r["depth"] for r in bfs_depths(edges, seeds, max_depth=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 6: 3}


def test_bfs_multi_source_takes_minimum(spark):
    """Two seeds on a chain 1-2-3-4-5: distance is the MIN over sources."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 5)], ["u", "v"])
    seeds = spark.createDataFrame([(1,), (5,)], ["v"])
    got = {r["v"]: r["depth"] for r in bfs_depths(edges, seeds, max_depth=3).collect()}
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_weighted_sample_membership_is_partitioning_invariant(spark):
    """The PPS sample is a pure function of (key, global total): the
    selected set must not change when the input partitioning does."""
    base = plans.REGISTRY["weighted_order_sample"].build(spark, SF)
    keys1 = {r["o_orderkey"] for r in base.collect()}

    o = spark.read.parquet(f"{SF}/orders.parquet").repartition(17)
    w = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 6), 16, 10)
        .cast("long")
        .alias("u24"),
    )
    tot = w.agg(F.sum("cents").cast("long").alias("sum_w"))
    d38 = "decimal(38,0)"
    keys2 = {
        r["o_orderkey"]
        for r in w.crossJoin(F.broadcast(tot))
        .filter(
            F.col("u24").cast(d38) * F.col("sum_w").cast(d38)
            < F.lit(200).cast(d38) * F.col("cents").cast(d38) * F.lit(16777216)
        )
        .select("o_orderkey")
        .collect()
    }
    assert keys1 == keys2 and len(keys1) > 0


def test_weighted_sample_skews_toward_high_value(spark):
    """PPS property: the sampled orders' mean value must exceed the
    population mean (inclusion ∝ value)."""
    sample = plans.REGISTRY["weighted_order_sample"].build(spark, SF)
    s_mean = sample.agg(F.avg("cents")).first()[0]
    p_mean = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .agg(F.avg(F.round(F.col("o_totalprice") * 100).cast("long")))
        .first()[0]
    )
    assert s_mean > p_mean


def test_rolling_distinct_users_bounds(spark):
    """active_7d ≥ active_1d everywhere, and on at least one day the
    trailing window is strictly larger (7 days of history exist)."""
    rows = plans.REGISTRY["rolling_distinct_users"].build(spark, SF).collect()
    assert len(rows) > 0
    assert all(r["active_7d"] >= r["active_1d"] for r in rows)
    assert any(r["active_7d"] > r["active_1d"] for r in rows)


def test_bm25_scores_descending_and_terms_present(spark):
    """Top-k ordering is by score descending; every returned doc matches
    at least one query term (inner-join retrieval semantics)."""
    rows = plans.REGISTRY["doc_bm25_topk"].build(spark, SF).collect()
    assert len(rows) == 20
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["tf_spark"] + r["tf_table"] + r["tf_window"] > 0 for r in rows)
