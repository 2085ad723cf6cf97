"""Semantics tests for the round-5 reshaping batch: multi-level
aggregates are cross-checked against their flat-groupBy expansions,
pivot/unpivot against each other, and the decile windows against
partition-law invariants (oracle-parity hashes live in
test_oracle_parity)."""

from __future__ import annotations

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational14 as r14


def _rows(df):
    # None-safe sort key (rollup/cube rows carry NULL group cells)
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_rollup_equals_union_of_flat_groupbys(spark, sf_smoke):
    """The one-shuffle ROLLUP must equal the three separate groupBys it
    replaces (detail / per-status / grand), with the matching gid tags."""
    got = r14.status_priority_rollup(spark, sf_smoke)

    o = _t(spark, sf_smoke, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    agg = [
        F.sum("cents").cast("long").alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    ]
    detail = o.groupBy("status", "priority").agg(*agg).select(
        "status", "priority", F.lit(0).cast("long").alias("gid"), "cents", "n_orders"
    )
    per_status = o.groupBy("status").agg(*agg).select(
        "status",
        F.lit(None).cast("string").alias("priority"),
        F.lit(1).cast("long").alias("gid"),
        "cents",
        "n_orders",
    )
    grand = o.agg(*agg).select(
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("string").alias("priority"),
        F.lit(3).cast("long").alias("gid"),
        "cents",
        "n_orders",
    )
    want = detail.unionByName(per_status).unionByName(grand)
    assert _rows(got) == _rows(want)


def test_cube_contains_all_four_grouping_levels(spark, sf_smoke):
    """CUBE(year, status) = detail + year-only + status-only + grand;
    each slice must re-aggregate to the same grand total."""
    got = r14.year_status_cube(spark, sf_smoke).collect()
    by_gid = {}
    for r in got:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    totals = {g: sum(r["cents"] for r in rows) for g, rows in by_gid.items()}
    counts = {g: sum(r["n_orders"] for r in rows) for g, rows in by_gid.items()}
    assert len(set(totals.values())) == 1, totals
    assert len(set(counts.values())) == 1, counts
    (grand,) = by_gid[3]
    assert grand["order_year"] is None and grand["status"] is None


def test_unpivot_then_pivot_is_identity(spark, sf_smoke):
    """melt followed by re-pivot reconstructs the wide monthly frame
    exactly (the two reshapes are inverses)."""
    long = r14.monthly_metrics_unpivot(spark, sf_smoke)
    metrics = ["revenue_cents", "n_orders", "n_customers"]
    wide_again = (
        long.groupBy("month").pivot("metric", metrics).agg(F.first("value"))
    ).select("month", *metrics)

    o = _t(spark, sf_smoke, "orders")
    want = (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_custkey",
        )
        .groupBy("month")
        .agg(
            F.sum("cents").cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        )
    )
    assert _rows(wide_again) == _rows(want)


def test_deciles_partition_each_segment(spark, sf_smoke):
    """ntile(10) laws per segment: tiles cover every customer exactly
    once, sizes differ by at most 1, tile floors are non-decreasing, and
    decile revenue masses sum to the segment total."""
    rows = r14.customer_spend_deciles(spark, sf_smoke).collect()
    segs = {}
    for r in rows:
        segs.setdefault(r["segment"], []).append(r)

    c = _t(spark, sf_smoke, "customer")
    o = _t(spark, sf_smoke, "orders")
    per_seg = {
        r["segment"]: (r["n"], r["cents"])
        for r in o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.countDistinct("c_custkey").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert set(segs) == set(per_seg)
    for seg, tiles in segs.items():
        tiles.sort(key=lambda r: r["decile"])
        n_exp, cents_exp = per_seg[seg]
        assert [t["decile"] for t in tiles] == list(range(1, len(tiles) + 1))
        assert sum(t["n_customers"] for t in tiles) == n_exp
        assert sum(t["decile_cents"] for t in tiles) == cents_exp
        sizes = [t["n_customers"] for t in tiles]
        assert max(sizes) - min(sizes) <= 1, (seg, sizes)
        floors = [t["floor_cents"] for t in tiles]
        assert floors == sorted(floors), (seg, floors)
