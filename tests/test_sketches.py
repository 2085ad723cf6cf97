"""Approximate-aggregate sketches: cross-engine hashes differ by design
(no oracle), so quality is pinned by error bounds against exact values."""

from __future__ import annotations

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t


def test_approx_count_distinct_error_bound(spark, sf_oracle):
    orders = _t(spark, sf_oracle, "orders")
    exact = orders.select(F.countDistinct("o_custkey")).first()[0]
    approx = orders.select(F.approx_count_distinct("o_custkey", rsd=0.05)).first()[0]
    assert abs(approx - exact) / exact < 0.15, (exact, approx)


def test_percentile_approx_error_bound(spark, sf_oracle):
    orders = _t(spark, sf_oracle, "orders")
    exact = orders.select(F.percentile("o_totalprice", 0.5)).first()[0]
    approx = orders.select(F.percentile_approx("o_totalprice", 0.5, 1000)).first()[0]
    # percentile_approx returns an actual data value within rank error
    assert abs(approx - exact) / exact < 0.05, (exact, approx)


def test_approx_count_distinct_mergeable(spark, sf_oracle):
    """The sketch must aggregate correctly under partial+final merge
    (grouped then summed vs global) — the property that makes it the
    100 TB cardinality tool."""
    li = _t(spark, sf_oracle, "lineitem")
    global_approx = li.select(F.approx_count_distinct("l_orderkey")).first()[0]
    exact = li.select(F.countDistinct("l_orderkey")).first()[0]
    assert abs(global_approx - exact) / exact < 0.1
