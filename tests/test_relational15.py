"""Semantics tests for the statistical-audit batch (oracle-parity
hashes live in test_oracle_parity)."""

from __future__ import annotations

from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational15 as r15


def test_acf_bounds_and_pair_counts(spark, sf_oracle):
    rows = {r["lag"]: r for r in r15.weekly_revenue_acf(spark, sf_oracle).collect()}
    assert set(rows) == {1, 2, 3, 4}
    # n_pairs shrinks by exactly one per extra lag step
    assert rows[1]["n_pairs"] - rows[4]["n_pairs"] == 3
    for r in rows.values():
        assert -1.0 <= r["acf"] <= 1.0, r


def test_independence_deviations_sum_to_zero_per_margin(spark, sf_oracle):
    """Σ dev_n over any row (or column) is identically zero: Σ_c n·o_rc
    = n·row_total and Σ_c row_total·col_total = row_total·n."""
    rows = r15.priority_status_independence(spark, sf_oracle).collect()
    by_status, by_priority = {}, {}
    for r in rows:
        by_status[r["status"]] = by_status.get(r["status"], 0) + r["dev_n"]
        by_priority[r["priority"]] = by_priority.get(r["priority"], 0) + r["dev_n"]
    assert all(v == 0 for v in by_status.values()), by_status
    assert all(v == 0 for v in by_priority.values()), by_priority
    n = sum(r["observed"] for r in rows)
    assert all(0 < r["row_total"] <= n and 0 < r["col_total"] <= n for r in rows)


def test_gini_bounds_and_known_extremes(spark, sf_oracle):
    import pyspark.sql.functions as F

    rows = r15.nation_spend_gini(spark, sf_oracle).collect()
    assert len(rows) == 25
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0, r

    # closed-form sanity on constructed data: equal spend -> gini 0;
    # one customer holding everything -> gini -> (n-1)/n
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational15

    eq = spark.createDataFrame(
        [(1, i, 100) for i in range(10)], "nationkey int, custkey int, cents long"
    )
    w = relational15.Window.partitionBy("nationkey").orderBy("cents", "custkey")
    ranked = eq.select("nationkey", "cents", F.row_number().over(w).cast("long").alias("rnk"))
    stats = ranked.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("total"),
        F.sum(F.col("rnk") * F.col("cents")).alias("weighted"),
    ).first()
    gini = (2.0 * stats["weighted"] - (stats["n"] + 1.0) * stats["total"]) / (
        stats["n"] * stats["total"]
    )
    assert abs(gini) < 1e-12


def test_gap_audit_detects_injected_key_ranges(spark, tmp_path, sf_smoke):
    """The driver corpus has dense orderkeys (the registry row proves
    parity on the gap-free case); this injects real holes and checks
    the audit localizes them: a 200-key hole inside one bucket and a
    deleted head of a later bucket (boundary gap)."""
    import pyspark.sql.functions as F

    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational15 import (
        _GAP_BUCKET,
        orderkey_gap_audit,
    )

    o = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    # synthesize a wider key space: spread keys so several buckets exist,
    # then delete ranges
    wide = o.withColumn("o_orderkey", F.col("o_orderkey") * 20)
    holed = wide.filter(
        ~F.col("o_orderkey").between(3_000, 3_000 + 199 * 20)  # in-bucket hole
    ).filter(
        ~F.col("o_orderkey").between(_GAP_BUCKET, _GAP_BUCKET + 2_000)  # bucket head
    )
    d = tmp_path / "gaps"
    holed.write.parquet(f"{d}/orders.parquet")

    rows = {r["bucket"]: r for r in orderkey_gap_audit(spark, str(d)).collect()}
    # the in-bucket hole lands in bucket 0 and is fully counted there
    assert rows[0]["missing_within"] >= 199 * 20 - 20, rows[0]
    assert rows[0]["largest_gap"] >= 199 * 20 - 20, rows[0]
    # the deleted head of bucket 1 shows up as boundary_missing
    assert rows[1]["boundary_missing"] >= 2_000 - 20, rows[1]
    # every key is accounted: n_keys + holes == span per bucket
    for r in rows.values():
        span = r["max_key"] - r["min_key"] + 1
        assert r["n_keys"] + r["missing_within"] == span, r
