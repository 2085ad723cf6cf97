"""Invariant tests for the TPC-H completion 2 batch (relational19) and
the curation/versioning/featurization batch (relational20)."""

from __future__ import annotations

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_cheapest_supplier_is_the_minimum(spark):
    """Recompute the per-part minimum offer first-principles and compare
    for every returned part (price AND tie-break)."""
    rows = plans.REGISTRY["cheapest_supplier_per_part"].build(spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    offers = (
        li.select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            F.expr(
                "CAST(round(l_extendedprice * 100) AS BIGINT)"
                " DIV CAST(l_quantity AS BIGINT)"
            ).alias("uc"),
        )
        .groupBy("partkey", "suppkey")
        .agg(F.min("uc").alias("unit_cents"))
        .collect()
    )
    by_part: dict[int, list] = {}
    for r in offers:
        by_part.setdefault(r["partkey"], []).append((r["unit_cents"], r["suppkey"]))
    for r in rows:
        best = min(by_part[r["partkey"]])
        assert (r["unit_cents"], r["cheapest_suppkey"]) == best


def test_large_orders_exceed_threshold_and_match_having(spark):
    out = plans.REGISTRY["large_quantity_orders"].build(spark, SF)
    rows = out.collect()
    assert rows and all(r["total_qty"] > 250 for r in rows)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    expect = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .filter(F.col("q") > 250)
        .count()
    )
    assert len(rows) == expect


def test_part_supplier_counts_excludes_denylist(spark):
    """Recompute one (type, size) group's distinct-supplier count with
    the denylist applied independently."""
    out = {
        (r["p_type"], r["p_size"]): r["supplier_cnt"]
        for r in plans.REGISTRY["part_supplier_counts"].build(spark, SF).collect()
    }
    assert out
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = spark.read.parquet(f"{SF}/part.parquet")
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    denied = {r["s_suppkey"] for r in s.filter(F.col("s_acctbal") < 0).collect()}
    (ptype, psize), cnt = next(iter(sorted(out.items())))
    good = {
        r["l_suppkey"]
        for r in li.join(
            p.filter((F.col("p_type") == ptype) & (F.col("p_size") == psize)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(F.col("p_brand") != "Brand#1")
        .select("l_suppkey")
        .distinct()
        .collect()
    }
    assert cnt == len(good - denied)


def test_dataset_version_diff_accounting(spark):
    """Status counts must reproduce the md5-band construction exactly."""
    out = {
        r["status"]: (r["n_keys"], r["cents_delta"])
        for r in plans.REGISTRY["dataset_version_diff"].build(spark, SF).collect()
    }
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2).alias("h")
    )
    bands = {r["h"]: r["n"] for r in o.groupBy("h").agg(F.count("*").alias("n")).collect()}
    n_added = sum(n for h, n in bands.items() if h < "04")
    n_removed = sum(n for h, n in bands.items() if h < "08")
    n_changed = sum(n for h, n in bands.items() if "08" <= h < "10")
    assert out["added"][0] == n_added
    assert out["removed"][0] == n_removed
    assert out["changed"][0] == n_changed
    # every changed key drifts exactly +$1
    assert out["changed"][1] == 100 * n_changed
    assert out["unchanged"][1] == 0


def test_feature_hash_partitions_events(spark):
    """Each event lands in exactly one bucket: per-user Σf_i == n_events
    (holds because every event carries a non-null props.k), and the
    user count matches the raw events table."""
    out = plans.REGISTRY["event_feature_hash"].build(spark, SF)
    fsum = sum(F.col(f"f{i}") for i in range(8))
    assert out.filter(fsum != F.col("n_events")).count() == 0
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert out.count() == ev.select("user_id").distinct().count()


def test_containment_bounds_and_direction(spark):
    """Containment ∈ [0.5, 1]; inter ≤ src_sz; directed rows are
    same-source by construction."""
    rows = plans.REGISTRY["doc_containment_pairs"].build(spark, SF).collect()
    for r in rows:
        assert 0.5 <= r["containment"] <= 1.0
        assert r["inter"] <= r["src_sz"]
        assert r["id_src"] != r["id_dst"]
