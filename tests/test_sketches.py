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


def test_cms_never_underestimates_and_is_linear(spark, sf_oracle):
    """Count-min guarantees: (1) est >= exact for every probed key;
    (2) cell counts are LINEAR — the sketch of two disjoint halves,
    merged by cell-wise addition, equals the sketch of the union. The
    second property is what makes per-partition / per-day sketches
    mergeable at 100 TB."""
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational14 import (
        heavy_hitter_cms_audit,
    )

    rows = heavy_hitter_cms_audit(spark, sf_oracle).collect()
    assert len(rows) == 20
    assert all(r["overcount"] >= 0 for r in rows), rows
    assert all(r["cm_est"] >= r["exact_n"] for r in rows), rows

    # linearity: sketch(half A) + sketch(half B) == sketch(A union B)
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational14 import (
        _cms_cells,
    )

    o = _t(spark, sf_oracle, "orders").select(F.col("o_custkey").alias("custkey"))
    cell_arr = _cms_cells(F.col("custkey"))

    def sketch(df):
        return {
            (r["row_i"], r["bucket"]): r["cnt"]
            for r in df.select(F.explode(cell_arr).alias("c"))
            .groupBy(F.col("c.row_i").alias("row_i"), F.col("c.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    half_a = o.filter(F.col("custkey") % 2 == 0)
    half_b = o.filter(F.col("custkey") % 2 == 1)
    merged: dict = {}
    for part in (sketch(half_a), sketch(half_b)):
        for k, v in part.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == sketch(o)
