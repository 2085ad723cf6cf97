"""Behavioral tests for the round-5 relational additions (sketch rollup,
incremental merge, sweep line, skyline, histogram, entropy) beyond the
oracle-parity hash checks in test_oracle_parity."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational10 as r10
from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t


def test_incremental_merge_any_increment_split(spark, sf_oracle):
    """Merging per-YEAR partial states (7 increments) must equal the
    2-way base/delta merge the registered query does — mergeable states
    are associative under ANY partitioning of the input."""
    o = _t(spark, sf_oracle, "orders")
    states = None
    for y in [r[0] for r in o.select(F.year("o_orderdate")).distinct().collect()]:
        part = r10._order_partials(o.filter(F.year("o_orderdate") == y))
        states = part if states is None else states.unionByName(part)
    merged = r10.merge_agg_states(states)
    expected = r10.incremental_agg_merge(spark, sf_oracle)
    a = {r.o_custkey: r for r in merged.collect()}
    b = {r.o_custkey: r for r in expected.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]


def test_part_skyline_matches_bruteforce(spark, sf_smoke):
    rows = (
        _t(spark, sf_smoke, "part")
        .select("p_partkey", F.col("p_retailprice").cast("double").alias("price"), "p_size")
        .collect()
    )
    pts = [(r.p_partkey, r.price, r.p_size) for r in rows]
    expect = {
        k
        for k, pr, sz in pts
        if not any(
            qpr <= pr and qsz >= sz and (qpr < pr or qsz > sz)
            for _, qpr, qsz in pts
        )
    }
    got = {r.p_partkey for r in r10.part_skyline(spark, sf_smoke).collect()}
    assert got == expect


def test_concurrency_two_level_equals_global_sweep(spark, sf_smoke):
    """The day-bucketed prefix-sum decomposition must reproduce the
    single-ordered-pass sweep exactly (including sessions spanning
    midnight via the carry-in offsets)."""
    e = _t(spark, sf_smoke, "events")
    from pyspark.sql import Window

    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    grp = e.select(
        "user_id",
        "ts",
        F.sum(
            F.when(
                F.lag("ts").over(wu).isNull()
                | (
                    F.col("ts").cast("timestamp").cast("long")
                    - F.lag("ts").over(wu).cast("timestamp").cast("long")
                    > 1800
                ),
                1,
            ).otherwise(0)
        )
        .over(wu)
        .alias("s_grp"),
    )
    sess = grp.groupBy("user_id", "s_grp").agg(
        F.min("ts").alias("s"), F.max("ts").alias("t")
    )
    deltas = sorted(
        [(r.s, 1, r.user_id) for r in sess.collect()]
        + [(r.t, -1, r.user_id) for r in sess.collect()],
        key=lambda x: (x[0], -x[1], x[2]),
    )
    run, peaks = 0, {}
    for ts, d, _ in deltas:
        run += d
        day = ts.date()
        peaks[day] = max(peaks.get(day, -(10**9)), run)
    got = {
        r.d: r.peak_concurrent
        for r in r10.concurrent_sessions_peak(spark, sf_smoke).collect()
    }
    assert got == peaks


def test_histogram_partitions_all_rows(spark, sf_oracle):
    h = r10.numeric_histogram(spark, sf_oracle).orderBy("bucket").collect()
    n = _t(spark, sf_oracle, "orders").count()
    assert sum(r.n_orders for r in h) == n
    assert all(0 <= r.bucket <= 19 for r in h)
    assert all(r.bucket_lo < r.bucket_hi for r in h)
    # adjacent bucket boundaries agree (within the 2 dp output rounding)
    for a, b in zip(h, h[1:]):
        if b.bucket == a.bucket + 1:
            assert abs(a.bucket_hi - b.bucket_lo) < 0.011


def test_entropy_bounds_and_extremes(spark, sf_smoke):
    rows = r10.doc_token_entropy(spark, sf_smoke).collect()
    assert rows
    # outputs are rounded to 4 dp, so bounds carry 5e-5 slack
    for r in rows:
        assert r.entropy >= -1e-4
        assert r.entropy <= math.log(max(r.n_distinct, 2)) + 1e-4
        assert -1e-4 <= r.norm_entropy <= 1.0 + 1e-4
        if r.n_distinct == r.n_tokens and r.n_distinct > 1:
            # all-distinct docs sit at maximum entropy
            assert abs(r.norm_entropy - 1.0) < 1e-3


def test_hll_rollup_merges_to_type_grain(spark, sf_oracle):
    out = {r.event_type: r for r in r10.hll_distinct_audit(spark, sf_oracle).collect()}
    e = _t(spark, sf_oracle, "events")
    months = (
        e.groupBy("event_type")
        .agg(F.countDistinct(F.date_format("ts", "yyyy-MM")).alias("m"))
        .collect()
    )
    for r in months:
        assert out[r.event_type].n_month_sketches == r.m
        assert out[r.event_type].approx_ok
