"""Physical-plan regression guards: the scale-critical plan properties
(.explain audits from SURVEY.md §4) must not silently regress."""

from __future__ import annotations

from grocery_store_sales_forecasting_etl_pipeline_spark import plans


def _explain(spark, name, sf_dir, mode="formatted"):
    df = plans.REGISTRY[name].build(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def _formatted(spark, name, sf_dir):
    return _explain(spark, name, sf_dir, "formatted")


def _simple(spark, name, sf_dir):
    # one line per physical node — reliable for counting exchanges
    return _explain(spark, name, sf_dir, "simple")


def test_filter_and_projection_pushdown(spark, sf_oracle):
    plan = _formatted(spark, "filter_project_cast", sf_oracle)
    assert "PushedFilters: [IsNotNull(p_retailprice), GreaterThan(p_retailprice,900.0)" in plan
    # column pruning: p_name (widest column) must NOT be read
    assert "p_name" not in plan


def test_dim_joins_broadcast_no_fact_shuffle(spark, sf_oracle):
    plan = _simple(spark, "dim_enrich_join", sf_oracle)
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    # the only exchanges are broadcast ones — the fact never hash-shuffles
    assert plan.count("BroadcastExchange") == 3
    assert "Exchange hashpartitioning" not in plan


def test_date_filter_pushed_to_scan(spark, sf_oracle):
    plan = _formatted(spark, "shipping_priority", sf_oracle)
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_weekly_agg_shuffle_budget(spark, sf_oracle):
    plan = _simple(spark, "weekly_lag_features", sf_oracle)
    # exactly two wide exchanges: group-by and window; scan pruned to the
    # 5 needed columns
    assert plan.count("Exchange hashpartitioning") == 2
    assert "l_returnflag" not in plan


def test_topk_no_global_sort(spark, sf_oracle):
    plan = _formatted(spark, "topk_orders", sf_oracle)
    assert "TakeOrderedAndProject" in plan


def test_partition_pruning_on_partitioned_table(spark, sf_oracle):
    """A filter on the partition column must prune at planning time
    (PartitionFilters), reading only matching year=… directories —
    the reference's year/month layout exists exactly for this."""
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
    import pyspark.sql.functions as F

    spark.sql("CREATE DATABASE IF NOT EXISTS prunedb")
    try:
        orders = _t(spark, sf_oracle, "orders").withColumn(
            "o_year", F.year("o_orderdate")
        )
        orders.write.mode("overwrite").partitionBy("o_year").format("parquet").saveAsTable(
            "prunedb.orders_by_year"
        )
        q = spark.table("prunedb.orders_by_year").filter(F.col("o_year") == 1997)
        plan = q._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "PartitionFilters: [isnotnull(o_year" in plan and "(o_year" in plan
        # the pruned read must not carry a post-scan filter on o_year rows
        n = q.count()
        assert n == _t(spark, sf_oracle, "orders").filter(F.year("o_orderdate") == 1997).count()
    finally:
        spark.sql("DROP DATABASE prunedb CASCADE")


def test_tfidf_single_scan_three_exchanges(spark, sf_oracle):
    """doc_tfidf_topk must stay single-data-scan (df counted via window,
    not a join-back that re-scans and re-explodes the corpus) with
    exactly three hash exchanges of the compact tf frame, and the top-3
    cut pushed below the final exchange (WindowGroupLimit)."""
    plan = _simple(spark, "doc_tfidf_topk", sf_oracle)
    # one data scan + the footer-only count(*) scan for N
    assert plan.count("Scan parquet") == 2
    assert plan.count("Exchange hashpartitioning") == 3
    assert "WindowGroupLimit" in plan
    assert "Join" not in plan.replace("BroadcastNestedLoopJoin", "")  # only the scalar-N cross


def test_simhash_candidates_band_equi_join(spark, sf_oracle):
    """simhash_candidates must pair via an equi-join on the band keys —
    never a cartesian/nested-loop over fingerprints."""
    plan = _simple(spark, "simhash_candidates", sf_oracle)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_decontam_bench_side_broadcast(spark, sf_oracle):
    """benchmark_decontam must broadcast the (small) benchmark gram set
    to the corpus-side join — a shuffle of all corpus gram rows on the
    gram key is the plan that dies at 100 TB."""
    plan = _simple(spark, "benchmark_decontam", sf_oracle)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_no_shingle_recompute_in_scan_filters(spark, sf_oracle):
    """Guard against the InferFiltersFromGenerate pathology: no
    shingle-family plan may carry the gram-construction expression
    (element_at over a fresh split) inside a Filter/Scan — that
    re-evaluates the tokenize per element access, measured 16× slower.
    Builders avoid it via materialized token columns + explode_outer."""
    for name in ["doc_ngram_jaccard", "doc_minhash_lsh", "benchmark_decontam",
                 "doc_repetition", "simhash_candidates",
                 "doc_winnow_fingerprints", "near_dup_verify", "doc_novelty",
                 "inverted_index_postings", "dedup_triangle_census"]:
        plan = _simple(spark, name, sf_oracle)
        assert "element_at(split" not in plan, f"{name} re-inlines split into a filter"


def test_zorder_audit_map_only_plus_two_aggregates(spark, sf_oracle):
    """zorder_layout_audit: the Morton key must stay a map-only codegen
    expression — exactly two exchanges total (the 1-row min/max frame's
    single-partition agg and the 16-row bucket agg), no sort, and the
    frame side joined as a broadcast."""
    plan = _simple(spark, "zorder_layout_audit", sf_oracle)
    # two data exchanges (frame's single-partition agg + bucket agg);
    # the third "Exchange" is the frame's BroadcastExchange itself
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Sort" not in plan, plan


def test_key_skew_report_distributed_topk(spark, sf_oracle):
    """key_skew_report: the top-20 must be TakeOrderedAndProject
    (per-partition top-k), never a global Sort of all keys."""
    plan = _simple(spark, "key_skew_report", sf_oracle)
    assert "TakeOrderedAndProject" in plan, plan


def test_backtest_two_exchanges_agg_fused_with_window(spark, sf_oracle):
    """forecast_backtest_eval: exactly two exchanges (weekly agg, then
    suppkey repartition) — the per-supplier metric aggregate must reuse
    the window's suppkey partitioning, not add a third shuffle."""
    plan = _simple(spark, "forecast_backtest_eval", sf_oracle)
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_runtime_bloom_filter_prunes_fact_fact_join(spark, sf_oracle):
    """The 100 TB shuffle-pruning lever: a selective filter on one side
    of a fact-fact SMJ must inject a runtime Bloom filter
    (might_contain) on the probe side, cutting the big fact's shuffle
    volume before the exchange. Spark gates this on a 10 GB
    application-side scan (never reached at test scale), so the test
    lowers the thresholds to assert the engine session leaves the
    feature ON and the plan shape qualifies — at production scale the
    default gates pass and the same plan injects the filter."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1B",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
        o = spark.read.parquet(f"{sf_oracle}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime Bloom filter not injected"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_simhash32_no_repartition_when_already_wide(spark, sf_oracle):
    """An already-wide corpus must NOT pay a full RoundRobin shuffle of raw
    text before tokenizing (r4 verdict residual): the repartition in
    simhash32 is guarded on getNumPartitions() < defaultParallelism, same
    as _shingle_rows."""
    from grocery_store_sales_forecasting_etl_pipeline_spark.operators.dedup import simhash32

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").select("doc_id", "text")
    parallelism = spark.sparkContext.defaultParallelism
    wide = docs.repartition(parallelism)  # simulate a well-split 100 TB scan
    plan = simhash32(wide, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    # exactly one RoundRobin exchange — ours above; simhash32 adds none
    assert plan.count("REPARTITION_BY_NUM") <= 1, plan

    narrow = docs.coalesce(1)
    plan2 = simhash32(narrow, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    # under-split input still gets widened
    assert "RoundRobinPartitioning" in plan2, plan2


def test_rollup_cube_single_exchange_with_mapside_partials(spark, sf_oracle):
    """ROLLUP/CUBE must be ONE aggregation: the Expand feeds map-side
    partial aggregates, so the shuffle carries one partial state per
    grouping tuple — not three separate groupBy jobs over the fact."""
    for name in ("status_priority_rollup", "year_status_cube"):
        plan = _simple(spark, name, sf_oracle)
        assert plan.count("Expand") == 1, (name, plan)
        assert plan.count("Exchange hashpartitioning") == 1, (name, plan)
        # partial agg sits BELOW the exchange (printed after in simple mode)
        assert plan.index("partial_sum") > plan.index("Exchange"), (name, plan)


def test_unpivot_is_map_only_expand(spark, sf_oracle):
    """The melt itself must add no shuffle: Expand is the TOP node above
    the monthly aggregate (its only exchanges are the agg's own)."""
    plan = _simple(spark, "monthly_metrics_unpivot", sf_oracle)
    assert plan.count("Expand") == 1, plan
    assert plan.index("Expand") < plan.index("HashAggregate"), plan


def test_pivot_fixed_values_single_scan(spark, sf_oracle):
    """Explicit pivot values fix the schema at plan time: one scan, a
    pivotfirst aggregate, and no second job to discover categories."""
    plan = _simple(spark, "priority_revenue_pivot", sf_oracle)
    assert plan.count("FileScan") == 1, plan
    assert "pivotfirst" in plan, plan


def test_decile_window_broadcast_dim_no_fact_sort_merge(spark, sf_oracle):
    plan = _simple(spark, "customer_spend_deciles", sf_oracle)
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan
    assert "ntile" in plan, plan


def test_cms_sketch_bounded_shuffle_broadcast_probe(spark, sf_oracle):
    """CM sketch: the cell build is a map-only Generate feeding map-side
    partials (shuffle state <= d*w cells/mapper), the probe side finds
    top-k distributed (TakeOrderedAndProject), and the tiny sketch is
    broadcast — no sort-merge join anywhere."""
    plan = _simple(spark, "heavy_hitter_cms_audit", sf_oracle)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("BroadcastExchange") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_argmax_three_grains_share_one_materialized_scan(spark, sf_oracle):
    """nation_customer_argmax: the per-order frame is localCheckpointed,
    so the three aggregation branches read the materialized RDD — the
    final plan contains NO parquet re-scan per branch (A/B: 4.8 -> 2.3s
    at sf10 when this landed)."""
    plan = _simple(spark, "nation_customer_argmax", sf_oracle)
    assert "FileScan parquet" not in plan, plan
    assert plan.count("Scan ExistingRDD") >= 2, plan


def test_label_agreement_broadcasts_panel_not_corpus(spark, sf_oracle):
    """The neighbor-label join must broadcast the bounded (panel x k)
    neighbor list, never the growing corpus label column: the corpus
    side streams map-side through the BroadcastHashJoin."""
    plan = _simple(spark, "knn_label_agreement", sf_oracle)
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan
    # the UNFILTERED corpus (vec_id, label) scan is the streamed side of
    # the top join: it appears textually BEFORE any BroadcastExchange,
    # while every broadcast subtree carries the bounded panel filter
    corpus_scan = plan.index("ReadSchema: struct<vec_id:bigint,label:int>")
    assert corpus_scan < plan.index("BroadcastExchange"), plan


def test_bucketed_join_eliminates_both_exchanges(spark, sf_oracle, tmp_path):
    """The write_bucketed docstring's promise: two tables bucketed on
    the same key and count join with ZERO hash exchanges (bucketing IS
    the shuffle, paid once at write time), and sortBy additionally
    removes the join-side sorts — the co-located-join strategy for
    repeatedly-joined 100 TB fact tables."""
    import pyspark.sql.functions as F

    from grocery_store_sales_forecasting_etl_pipeline_spark.sources.sinks import write_bucketed

    o = spark.read.parquet(f"{sf_oracle}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(o, "bkt_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bkt_lineitem",
        ["o_orderkey"],
        8,
        sort_by=["o_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        # at test scale AQE would broadcast the small side and hide the
        # bucketing property; at 100 TB neither side broadcasts — model
        # that by disabling the threshold for the plan assertion
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_orders").join(spark.table("bkt_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # cross-check correctness of the co-located join
        expect = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert joined.count() == expect
        # bucket pruning: an equality filter on the bucket key scans 1 bucket
        # bucket pruning: an equality filter on the bucket key reads 1 of
        # 8 buckets (autoBucketedScan would skip bucketed reading for a
        # filter-only plan, so pin it off for the assertion)
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        try:
            one = spark.table("bkt_orders").filter(F.col("o_orderkey") == 42)
            pruned = one._jdf.queryExecution().executedPlan().toString()
            assert "SelectedBucketsCount: 1 out of 8" in pruned
        finally:
            spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_rfm_segments_broadcast_dim_single_fact_fold(spark, sf_oracle):
    """The customer dim must broadcast onto orders (no fact sort-merge
    join), and the anchor stays a broadcast nested loop."""
    plan = _simple(spark, "rfm_segments", sf_oracle)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_velocity_filter_pushed_to_scan(spark, sf_oracle):
    """The purchase-only filter must reach the parquet scan as a pushed
    filter — the RANGE window never sees other event types."""
    plan = _formatted(spark, "purchase_velocity_flags", sf_oracle)
    assert "EqualTo(event_type,purchase)" in plan


def test_fuzzy_search_uses_takeordered(spark, sf_oracle):
    """Top-k over the scored vocabulary must be TakeOrderedAndProject
    (per-partition heaps), never a global Sort + Limit."""
    plan = _simple(spark, "char_trigram_fuzzy_search", sf_oracle)
    assert "TakeOrderedAndProject" in plan


def test_survival_curve_shuffle_budget(spark, sf_oracle):
    """Two data shuffles (customer fold, lifetime fold) + the single-
    partition window exchange — anything more means a re-derivation
    crept in."""
    plan = _simple(spark, "customer_survival_curve", sf_oracle)
    assert plan.count("Exchange") <= 4


def test_late_ship_priority_pushed_range_scan(spark, sf_oracle):
    """Q12 shape: the ship-date range must reach the lineitem scan as
    pushed filters, and the scan reads only the 3 needed columns."""
    plan = _formatted(spark, "late_ship_priority_matrix", sf_oracle)
    assert "GreaterThanOrEqual(l_shipdate,1997-01-01" in plan
    assert "LessThan(l_shipdate,1998-01-01" in plan
    assert "l_extendedprice" not in plan


def test_dominant_suppliers_broadcast_semi_no_smj(spark, sf_oracle):
    """Q20 shape: the part-family keys broadcast into a LeftSemi (the
    fact never shuffles for the part filter), supplier/nation broadcast,
    and the only hash exchanges are the keyed aggregate, the per-part
    window, and the tiny output rollup."""
    plan = _simple(spark, "part_dominant_suppliers", sf_oracle)
    assert "LeftSemi, BuildRight" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_chi2_single_scan_tiny_windows(spark, sf_oracle):
    """Chi-square folds ONE orders scan into the <=15-row contingency
    table; the marginal windows and final fold run over those rows.
    Since the r6 densification the contingency frame is
    localCheckpointed (three consumers), so the fact scan sits behind
    a LogicalRDD boundary and the visible plan shows <= 1 FileScan —
    the guard pins that no SECOND fact scan ever reappears."""
    plan = _simple(spark, "priority_status_chi2", sf_oracle)
    assert plan.count("FileScan") <= 1
    assert "SortMergeJoin" not in plan


def test_quota_sample_prefilter_before_window(spark, sf_oracle):
    """The hash-prefix pre-filter must bound the window's input: the
    stratum-count frame broadcasts, and no fact-grain sort-merge
    appears."""
    plan = _simple(spark, "lang_quota_sample", sf_oracle)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_approx_distinct_separate_exact_and_sketch_aggs(spark, sf_oracle):
    """Exact countDistinct and the HLL sketch must aggregate in
    SEPARATE scans: fusing them plans the sketch per distinct key in
    the partial phase (23s vs 2s at sf1), and multi-distinct packing
    goes through Expand. Neither Expand nor a partial HLL keyed by the
    entity may appear; each entity costs two one-column scans."""
    plan = _simple(spark, "approx_distinct_audit", sf_oracle)
    assert "Expand" not in plan
    assert plan.count("lineitem.parquet") == 4
    # no partial aggregate may group the HLL by the distinct key
    import re
    assert not re.search(r"HashAggregate\(keys=\[[lo]_\w+#\d+L?\][^\n]*approx_count_distinct", plan)


def test_fk_orphan_audit_broadcast_anti_no_fact_shuffle(spark, sf_oracle):
    """Every FK leg must be a broadcast LeftAnti (dim keys build side)
    — the facts never hash-shuffle for the integrity check."""
    plan = _simple(spark, "fk_orphan_audit", sf_oracle)
    assert plan.count("LeftAnti, BuildRight") == 4
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_skew_diagnostics_one_shuffle_per_key(spark, sf_oracle):
    """Each key leg costs exactly one map-combined shuffle to key
    grain; the hottest-key tie-break is a struct-min fold, never a
    window over fact grain."""
    plan = _simple(spark, "join_key_skew_diagnostics", sf_oracle)
    assert plan.count("Exchange hashpartitioning") == 3
    assert "Window" not in plan


def test_group_percentiles_single_scan_single_shuffle(spark, sf_oracle):
    plan = _simple(spark, "group_percentiles_exact", sf_oracle)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan") == 1


# ---------------------------------------------------------------------------
# Registry-wide guard: no unpartitioned window over a fact-scale input
# ---------------------------------------------------------------------------

# An unpartitioned Window (global sort / global count) is a single-task
# stage — the one plan shape that cannot survive a 100x scale-up. It is
# acceptable ONLY over a frame already reduced below the data grain
# (an Aggregate, a checkpoint of a reduced frame, a literal/range).
# scalerank.py provides the scale-safe equivalents (bucket-offset
# two-pass ranks, value-grain cumulatives, chunked rank regeneration);
# any query that trips this guard should use those instead of being
# whitelisted here.
_WINDOW_GUARD_WHITELIST: set[str] = set()

_REDUCERS = {
    # cardinality-reducing / already-bounded logical nodes: anything
    # below these is not fact-grain by the time the window sees it
    "Aggregate", "LogicalRDD", "LocalRelation", "Range", "GlobalLimit",
    "Expand",
}
_SCAN_NODES = {
    "LogicalRelation", "DataSourceV2Relation", "DataSourceV2ScanRelation",
    "HiveTableRelation",
}


def _jchildren(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _reaches_raw_scan(node):
    name = node.getClass().getSimpleName()
    if name in _REDUCERS:
        return False
    if name in _SCAN_NODES:
        return True
    return any(_reaches_raw_scan(c) for c in _jchildren(node))


def _unpartitioned_fact_windows(df):
    hits = []

    def walk(node):
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
            and any(_reaches_raw_scan(k) for k in _jchildren(node))
        ):
            hits.append(node.toString().split("\n")[0][:160])
        for c in _jchildren(node):
            walk(c)

    walk(df._jdf.queryExecution().optimizedPlan())
    return hits


def test_no_unpartitioned_window_over_fact_scale_input(spark, sf_smoke):
    offenders = {}
    for name in sorted(plans.REGISTRY):
        if name in _WINDOW_GUARD_WHITELIST:
            continue
        df = plans.REGISTRY[name].build(spark, sf_smoke)
        hits = _unpartitioned_fact_windows(df)
        if hits:
            offenders[name] = hits[0]
    assert not offenders, (
        "unpartitioned Window over a fact-scale input (single-task global "
        f"sort at scale) in: {offenders} — rewrite with plans/scalerank.py "
        "(value_cum_counts / bucketed_row_number / ranked_points) instead "
        "of whitelisting"
    )


def test_wrapped_limit_queries_keep_topk_fusion(spark, sf_smoke):
    """The decimal output boundary must not break TakeOrderedAndProject
    fusion on limit-rooted queries. apply_decimal_boundary coalesces
    bounded results to one partition precisely so the child's
    Limit(Sort) pattern stays fusable — a regression here re-introduces
    the CollectLimit + range-partitioned global Sort whose sampling pass
    re-executes non-exchange upstream subtrees (hybrid_rrf_search 9.1s
    vs 5.0s at sf0.1)."""
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans import registry

    offenders = {}
    for name in sorted(plans.REGISTRY):
        cols = registry.DECIMAL_BOUNDARY.get(name, [])
        if not cols:
            continue
        raw = plans.REGISTRY[name].build(spark, sf_smoke)
        limit = registry._root_limit(raw)
        if limit is None or limit > registry._COALESCE_LIMIT_MAX:
            continue
        wrapped = registry.wrapped_build(name)(spark, sf_smoke)
        p = wrapped._jdf.queryExecution().executedPlan().toString()
        if "CollectLimit" in p and "TakeOrderedAndProject" not in p.split(
            "CollectLimit"
        )[1]:
            offenders[name] = "CollectLimit without TakeOrdered below"
        elif "Exchange rangepartitioning" in p and "TakeOrderedAndProject" not in p:
            offenders[name] = "range-partitioned global sort"
    assert not offenders, (
        f"decimal boundary broke top-k fusion in: {offenders} — see "
        "registry._root_limit / apply_decimal_boundary"
    )
