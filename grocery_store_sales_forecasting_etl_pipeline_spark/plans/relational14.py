"""Round-5 additions, sixth batch: reshaping + multi-level aggregation
surface — pivot, rollup/cube with grouping ids, unpivot (melt), and the
ranking-window family (ntile / percent_rank / cume_dist).

The reference's aggregates are flat single-level groupBys
(gold_aggregation.py.py:21-38); a user migrating a reporting workload
also needs the reshaping shapes around them. All money math follows the
repo's exact-cents convention (CAST(round(x*100) AS BIGINT)) so the
driver's order-insensitive value hash is bit-stable in both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register
from grocery_store_sales_forecasting_etl_pipeline_spark.operators.sizing import (
    gated_broadcast as _gbcast,
)

# ---------------------------------------------------------------------------
# Pivot: order-year x priority revenue matrix
# ---------------------------------------------------------------------------

_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_PIVOT_COLS = ("p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low")

_PIVOT_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       {cols}
FROM orders
GROUP BY order_year
""".format(
    cols=",\n       ".join(
        "CAST(coalesce(sum(CASE WHEN o_orderpriority = '{v}' THEN "
        "CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) "
        "AS {c}".format(v=v, c=c)
        for v, c in zip(_PRIORITIES, _PIVOT_COLS)
    )
)


@register("priority_revenue_pivot", oracle=_PIVOT_ORACLE, tags=("agg", "pivot"))
def priority_revenue_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue matrix: one row per order year, one column per order
    priority (``groupBy().pivot()`` — long-to-wide reshaping the
    reference's flat gold aggregates lack).

    Scale notes: the pivot VALUES are passed explicitly, which (a) skips
    the extra distinct-collect job Spark otherwise runs to discover
    them, and (b) fixes the output schema at plan time — mandatory on a
    shared cluster where a stray new category would silently widen the
    table. The plan is a single hash aggregate over (year, priority)
    pivoted map-side; missing cells are filled with literal 0 so the
    driver hash never sees engine-specific NULL-vs-0 divergence.
    """
    o = _t(spark, sf_dir, "orders")
    wide = (
        o.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("o_orderpriority").alias("priority"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("order_year")
        .pivot("priority", list(_PRIORITIES))
        .agg(F.sum("cents"))
    )
    out = wide.select(
        "order_year",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(c)
            for v, c in zip(_PRIORITIES, _PIVOT_COLS)
        ],
    )
    return out


# ---------------------------------------------------------------------------
# Rollup with grouping ids: status -> priority subtotal hierarchy
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT o_orderstatus AS status,
       o_orderpriority AS priority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("status_priority_rollup", oracle=_ROLLUP_ORACLE, tags=("agg", "rollup"))
def status_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals in ONE aggregation: per (status, priority)
    detail, per-status subtotal, and grand total, tagged with
    ``grouping_id()`` so subtotal rows are distinguishable from genuine
    NULL groups (Spark's bitmask matches DuckDB's ``GROUPING(a, b)``
    bit-for-bit: detail=0, status subtotal=1, grand=3).

    Scale notes: ROLLUP expands each input row into (levels+1) grouping
    tuples via the Expand operator BEFORE the shuffle, but partial
    aggregation runs on the expanded stream map-side, so the shuffle
    carries one partial state per (group tuple, mapper) — not 3x the
    fact rows. Versus running 3 separate groupBys: one scan, one
    shuffle, identical results.
    """
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .rollup("status", "priority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.sum("cents").cast("long").alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .select("status", "priority", "gid", "cents", "n_orders")
    )


# ---------------------------------------------------------------------------
# Cube: year x status, all four grouping combinations
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       o_orderstatus AS status,
       CAST(GROUPING(year(o_orderdate), o_orderstatus) AS BIGINT) AS gid,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY CUBE (year(o_orderdate), o_orderstatus)
"""


@register("year_status_cube", oracle=_CUBE_ORACLE, tags=("agg", "cube"))
def year_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-classification: (year, status), year-only, status-only,
    and grand-total aggregates from one scan (``cube()``), the OLAP
    cross-tab backing "slice by anything" dashboards.

    Scale notes: cube over d dimensions expands 2^d tuples per row —
    fine at d=2, ruinous at d>4 (the Expand blowup is exponential); for
    wide dimension sets, compute the detail grain once and derive
    higher aggregates from it (the incremental_agg_merge pattern)
    instead of cubing the fact table. grouping_id disambiguates NULL
    data from subtotal rows exactly as in status_priority_rollup.
    """
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("o_orderstatus").alias("status"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .cube("order_year", "status")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.sum("cents").cast("long").alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .select("order_year", "status", "gid", "cents", "n_orders")
    )


# ---------------------------------------------------------------------------
# Unpivot (melt): wide monthly metrics -> long (month, metric, value)
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
  FROM orders GROUP BY month
)
SELECT month, metric, value FROM (
  SELECT month, 'revenue_cents' AS metric, revenue_cents AS value FROM wide
  UNION ALL
  SELECT month, 'n_orders', n_orders FROM wide
  UNION ALL
  SELECT month, 'n_customers', n_customers FROM wide
)
"""


@register("monthly_metrics_unpivot", oracle=_UNPIVOT_ORACLE, tags=("reshape",))
def monthly_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long melt: a per-month metrics frame (revenue, order
    count, distinct customers) unpivoted to (month, metric, value) rows
    — the inverse reshaping of priority_revenue_pivot, feeding
    metric-as-data sinks (time-series stores, generic alerting tables).

    Scale notes: ``DataFrame.unpivot`` is a map-only Expand (k output
    rows per input row, no shuffle, no UDF); the only shuffle here is
    the upstream monthly aggregate. All three metrics are cast to one BIGINT
    value column — unpivot requires a common type, and widening to
    string would break the driver's numeric rendering.
    """
    o = _t(spark, sf_dir, "orders")
    wide = (
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
    return wide.unpivot(
        ids=["month"],
        values=["revenue_cents", "n_orders", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# Ranking windows: ntile / percent_rank / cume_dist over customer spend
# ---------------------------------------------------------------------------

_DECILE_ORACLE = """
WITH spend AS (
  SELECT c.c_mktsegment AS segment, c.c_custkey AS custkey,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY segment, custkey
),
ranked AS (
  SELECT segment, custkey, spend_cents,
         CAST(ntile(10) OVER w AS BIGINT) AS decile,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume_p
  FROM spend
  WINDOW w AS (PARTITION BY segment ORDER BY spend_cents, custkey)
)
SELECT segment, decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(spend_cents) AS BIGINT) AS decile_cents,
       CAST(min(spend_cents) AS BIGINT) AS floor_cents,
       round(min(pct_rank), 6) AS min_pct_rank,
       round(max(cume_p), 6) AS max_cume_p
FROM ranked
GROUP BY segment, decile
"""


@register("customer_spend_deciles", oracle=_DECILE_ORACLE, tags=("window", "rank"))
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment spend deciles: ``ntile(10)`` buckets each
    segment's customers by total order spend, then per-decile size,
    revenue mass, and entry threshold — plus ``percent_rank`` /
    ``cume_dist`` boundary values, completing the ranking-window family
    (rank/dense_rank/row_number are covered by the top-k queries).

    Determinism: the window orders by (spend_cents, custkey) — custkey
    is unique, so tile assignment and both rank fractions are exact and
    identical in both engines (percent_rank=(rank-1)/(n-1) and
    cume_dist=rank/n are single IEEE divisions of the same integers;
    round(x, 6) at the boundary is belt-and-braces).

    Scale notes: the per-segment window is |segments|-way parallel —
    fine for balanced segments, a straggler when one segment dominates.
    At that point compute tile boundaries from the rank structure
    instead (the winsorized_price_stats two-pass pattern) and map-join
    them back; identical output, no single-task sort of the big
    segment. The final groupBy((segment, decile)) is a 50-row result —
    AQE coalesces it to one partition.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    spend = (
        o.select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .join(
            _gbcast(
                c.select(
                    F.col("c_custkey").alias("custkey"),
                    F.col("c_mktsegment").alias("segment"),
                )
            ),
            F.col("o_custkey") == F.col("custkey"),
        )
        .groupBy("segment", "custkey")
        .agg(F.sum("cents").cast("long").alias("spend_cents"))
    )
    w = Window.partitionBy("segment").orderBy("spend_cents", "custkey")
    ranked = spend.select(
        "segment",
        "custkey",
        "spend_cents",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_p"),
    )
    return ranked.groupBy("segment", "decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("spend_cents").cast("long").alias("decile_cents"),
        F.min("spend_cents").cast("long").alias("floor_cents"),
        F.round(F.min("pct_rank"), 6).alias("min_pct_rank"),
        F.round(F.max("cume_p"), 6).alias("max_cume_p"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy-hitter audit (sketch-family completion)
# ---------------------------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 512  # buckets per row

# The d hash functions are d DISJOINT 6-hex windows of ONE md5 digest
# (md5 bits are uniform and independent across positions; one hash per
# row instead of d) — the same slicing convention as the simhash and
# byte-histogram oracles in textops/mediaops.
_CMS_ORACLE = f"""
WITH base AS (
  SELECT o_custkey AS custkey, md5(CAST(o_custkey AS VARCHAR)) AS h
  FROM orders
),
rows_ AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS row_i),
cells AS (
  SELECT row_i,
         ('0x' || substr(h, CAST(6 * row_i + 1 AS INT), 6))::BIGINT
           % {_CMS_W} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM base CROSS JOIN rows_
  GROUP BY row_i, bucket
),
exact AS (
  SELECT custkey, CAST(count(*) AS BIGINT) AS exact_n
  FROM base GROUP BY custkey
  ORDER BY exact_n DESC, custkey LIMIT 20
),
probe AS (
  SELECT e.custkey, e.exact_n, r.row_i,
         ('0x' || substr(md5(CAST(e.custkey AS VARCHAR)),
             CAST(6 * r.row_i + 1 AS INT), 6))::BIGINT % {_CMS_W}
           AS bucket
  FROM exact e CROSS JOIN rows_ r
)
SELECT p.custkey, p.exact_n,
       CAST(min(c.cnt) AS BIGINT) AS cm_est,
       CAST(min(c.cnt) - p.exact_n AS BIGINT) AS overcount
FROM probe p JOIN cells c ON c.row_i = p.row_i AND c.bucket = p.bucket
GROUP BY p.custkey, p.exact_n
"""


def _cms_cells(key):
    """d (row_i, bucket) structs from ONE md5(key): bucket_i is hex
    window [6i+1, 6i+6] of the digest mod w — bit-exact in both engines
    (the repo's cross-engine hashing idiom; see relational6 hash_sample,
    mediaops byte-histogram slicing)."""
    h = F.md5(key.cast("string"))
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("row_i"),
                (
                    F.conv(F.substring(h, 6 * i + 1, 6), 16, 10).cast("long")
                    % _CMS_W
                ).alias("bucket"),
            )
            for i in range(_CMS_D)
        ]
    )


@register("heavy_hitter_cms_audit", oracle=_CMS_ORACLE, tags=("agg", "sketch"))
def heavy_hitter_cms_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation audited against exact
    counts: a d=4 x w=512 CM sketch of per-customer order counts, probed
    at the exact top-20 keys; ``overcount`` (always >= 0 — CM never
    underestimates) shows the collision error the w sizing buys.

    Completes the mergeable-sketch algebra next to ``hll_distinct_audit``
    (distinct counts) and ``quantile_bracket_audit`` (quantiles): cell
    counts are LINEAR in the input, so per-partition / per-day sketches
    merge by cell-wise addition — the "persist sketches, not rescans"
    pattern for frequency questions at 100 TB.

    Scale notes: construction is a map-only Expand (d cells per row)
    feeding map-side partial aggregation, so the shuffle carries at most
    d*w partial cells PER MAPPER — bounded regardless of input rows or
    key cardinality, exactly the property that makes CM viable where the
    exact per-key aggregate (whose state is |keys|) is not. The probe
    stage broadcasts both tiny sides (<= d*w sketch cells, 20*d probe
    rows). The exact top-20 here is the AUDIT harness, not the operator.
    """
    o = _t(spark, sf_dir, "orders")
    base = o.select(F.col("o_custkey").alias("custkey"))

    cells = (
        base.select(F.explode(_cms_cells(F.col("custkey"))).alias("c"))
        .groupBy(F.col("c.row_i").alias("row_i"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )

    exact = (
        base.groupBy("custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("custkey"))
        .limit(20)
    )
    probe = exact.select(
        "custkey",
        "exact_n",
        F.explode(_cms_cells(F.col("custkey"))).alias("c"),
    ).select("custkey", "exact_n", F.col("c.row_i").alias("row_i"), F.col("c.bucket").alias("bucket"))

    return (
        probe.join(F.broadcast(cells), ["row_i", "bucket"])
        .groupBy("custkey", "exact_n")
        .agg(
            F.min("cnt").cast("long").alias("cm_est"),
            (F.min("cnt") - F.col("exact_n")).cast("long").alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# Argmax / mode / exact median per group (tie-safe selection aggregates)
# ---------------------------------------------------------------------------

_ARGMAX_ORACLE = """
WITH ord AS (
  SELECT c.c_nationkey AS nationkey, o.o_custkey AS custkey,
         o.o_orderpriority AS priority,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
spend AS (
  SELECT nationkey, custkey, CAST(sum(cents) AS BIGINT) AS cents
  FROM ord GROUP BY nationkey, custkey
),
top_cust AS (
  SELECT nationkey,
         (max({'cents': cents, 'custkey': custkey})).custkey AS top_custkey,
         (max({'cents': cents, 'custkey': custkey})).cents AS top_cents
  FROM spend GROUP BY nationkey
),
prio_counts AS (
  SELECT nationkey, priority, CAST(count(*) AS BIGINT) AS cnt
  FROM ord GROUP BY nationkey, priority
),
prio_mode AS (
  SELECT nationkey,
         (max({'cnt': cnt, 'priority': priority})).priority AS mode_priority,
         (max({'cnt': cnt, 'priority': priority})).cnt AS mode_count
  FROM prio_counts GROUP BY nationkey
),
med AS (
  SELECT nationkey,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY cents) AS median_cents
  FROM ord GROUP BY nationkey
)
SELECT t.nationkey, t.top_custkey, t.top_cents,
       p.mode_priority, p.mode_count, m.median_cents
FROM top_cust t
JOIN prio_mode p ON p.nationkey = t.nationkey
JOIN med m ON m.nationkey = t.nationkey
"""


@register("nation_customer_argmax", oracle=_ARGMAX_ORACLE, tags=("agg", "argmax"))
def nation_customer_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection aggregates per nation: the top-spending customer
    (argmax), the most common order priority (mode), and the exact
    interpolated median order value — the ``max_by``/``mode``/``median``
    trio, each computed TIE-SAFELY.

    Determinism contract: bare ``max_by``/``arg_max``/``mode`` are
    nondeterministic under ties in BOTH engines, so every selection here
    maximizes a lexicographic struct whose trailing field is the unique
    (or desired-winner) key: max(struct(cents, custkey)) and
    max(struct(cnt, priority)) — Spark and DuckDB order named structs
    identically, making the argmax reproducible and hashable. The
    median interpolates (a+b)/2 on exact integer cents, which is exact
    in double, so the float crosses engines bit-identically.

    Scale notes: one fact scan feeds all three grains — the per-order
    frame is derived once (broadcast dim join) and localCheckpointed so
    the three branches read the materialized frame instead of each
    re-running the scan+join; then three partial-agg shuffles over
    compact (nation, ...) keys and broadcast 25-row output joins. The struct-max argmax is a single-pass aggregate (no
    window, no sort) — the shape to prefer over row_number()-per-group
    when only the winner is needed. The exact-percentile median holds
    per-group values in aggregation state (fine for |nations| groups;
    measured 4.5× at 100× data) — for billion-row groups use the
    rank-based two-pass of quantile_bracket_audit / winsorized_price
    _stats, or percentile_approx, whose state is bounded.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    ord_ = o.join(
        _gbcast(
            c.select(F.col("c_custkey").alias("custkey"), F.col("c_nationkey").alias("nationkey"))
        ),
        F.col("o_custkey") == F.col("custkey"),
    ).select(
        "nationkey",
        "custkey",
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # three aggregation grains consume this frame; Catalyst has no
    # cross-branch subplan reuse, so without materialization each branch
    # would redo the scan + dim join (3x the dominant cost).
    # localCheckpoint, not persist: a persist here would poison identical
    # later builds via the plan-matching CacheManager (r5 bench learning)
    ord_ = ord_.localCheckpoint(eager=False)

    spend = ord_.groupBy("nationkey", "custkey").agg(
        F.sum("cents").cast("long").alias("cents")
    )
    top_cust = spend.groupBy("nationkey").agg(
        F.max(F.struct("cents", "custkey")).alias("m")
    ).select(
        "nationkey",
        F.col("m.custkey").alias("top_custkey"),
        F.col("m.cents").alias("top_cents"),
    )

    prio_mode = (
        ord_.groupBy("nationkey", "priority")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .groupBy("nationkey")
        .agg(F.max(F.struct("cnt", "priority")).alias("m"))
        .select(
            "nationkey",
            F.col("m.priority").alias("mode_priority"),
            F.col("m.cnt").alias("mode_count"),
        )
    )

    med = ord_.groupBy("nationkey").agg(
        F.percentile("cents", F.lit(0.5)).alias("median_cents")
    )

    return top_cust.join(F.broadcast(prio_mode), "nationkey").join(
        F.broadcast(med), "nationkey"
    )
