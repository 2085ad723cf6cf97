"""Round-5 additions, fourth batch: data-quality violation summary,
interval-union session coverage, and HLL set-algebra overlap audit —
the registry faces of the quality-gate operator family (SURVEY.md §2.13
E2-E6; the reference fails hard on first violation,
``test_data_quality.py.py:13-94`` — here violations are COUNTED in one
pass so the gate can report before it kills a 100 TB job), the
interval-union sibling of the sweep-line peak, and the intersection
completion of the mergeable-sketch story.
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
# Data-quality violation summary
# ---------------------------------------------------------------------------

_DQ_ORACLE = """
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_orderkey IS NULL OR l_partkey IS NULL
                        OR l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_keys,
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                       THEN 1 ELSE 0 END) AS BIGINT) AS qty_range,
         CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS price_positive,
         CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                       THEN 1 ELSE 0 END) AS BIGINT) AS flag_domain
  FROM lineitem
),
dups AS (
  SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS extra
  FROM (SELECT count(*) AS c FROM lineitem
        GROUP BY l_orderkey, l_linenumber) WHERE c > 1
),
orphans AS (
  SELECT CAST(count(*) AS BIGINT) AS n_orphan
  FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
)
SELECT rule, n_checked, n_violations, n_violations = 0 AS passed
FROM (
  SELECT 'null_keys' AS rule, n AS n_checked, null_keys AS n_violations
  FROM base
  UNION ALL
  SELECT 'qty_range', n, qty_range FROM base
  UNION ALL
  SELECT 'price_positive', n, price_positive FROM base
  UNION ALL
  SELECT 'flag_domain', n, flag_domain FROM base
  UNION ALL
  SELECT 'pk_duplicates', base.n, dups.extra FROM base, dups
  UNION ALL
  SELECT 'fk_orphans', base.n, orphans.n_orphan FROM base, orphans
)
"""


@register("dq_violation_summary", oracle=_DQ_ORACLE, tags=("quality",))
def dq_violation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row-per-rule data-quality report over the fact table: null
    key columns, quantity range, positive price, return-flag domain,
    primary-key duplicates, and foreign-key orphans — the registry face
    of the quality-gate operator family (operators/quality.py E2-E6,
    which return CheckResults for pipeline gating; this query emits the
    same evidence as DATA so the contract can hash it).

    Scale notes: the four value rules are conditional aggregates in ONE
    fact scan (the reference runs a filtered count per rule — N scans,
    ``test_data_quality.py.py:23-40``); the duplicate rule is a
    key-grain groupBy with map-side partials; the orphan rule is a
    LEFT ANTI join that AQE turns into broadcast when the key side
    fits. Nothing collects; every count is exact BIGINT.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    base = li.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("l_orderkey").isNull()
                | F.col("l_partkey").isNull()
                | F.col("l_suppkey").isNull(),
                1,
            ).otherwise(0)
        ).cast("long").alias("null_keys"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
            .otherwise(0)
        ).cast("long").alias("qty_range"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0))
        .cast("long").alias("price_positive"),
        F.sum(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0)
        ).cast("long").alias("flag_domain"),
    ).localCheckpoint(eager=False)
    dups = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("long").alias("extra"))
    )
    orphans = li.join(
        o, li["l_orderkey"] == o["o_orderkey"], "left_anti"
    ).agg(F.count("*").cast("long").alias("n_orphan"))
    per_rule = base.selectExpr(
        "stack(4, 'null_keys', null_keys, 'qty_range', qty_range, "
        "'price_positive', price_positive, 'flag_domain', flag_domain) "
        "AS (rule, n_violations)",
        "n AS n_checked",
    ).select("rule", "n_checked", "n_violations")
    extra = (
        base.crossJoin(_gbcast(dups))
        .crossJoin(F.broadcast(orphans))
        .selectExpr(
            "stack(2, 'pk_duplicates', extra, 'fk_orphans', n_orphan) "
            "AS (rule, n_violations)",
            "n AS n_checked",
        )
        .select("rule", "n_checked", "n_violations")
    )
    return per_rule.union(extra).select(
        "rule",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


# ---------------------------------------------------------------------------
# Interval-union session coverage (sweep-line measure)
# ---------------------------------------------------------------------------

# Same no-global-sort sweep as concurrent_sessions_peak: session
# boundaries become +-1 deltas collapsed to one row per distinct
# boundary SECOND, prefix-summed WITHIN each day partition plus a
# broadcast |days|-row carry-in frame. Coverage adds the measure
# accumulator: between consecutive sweep points, elapsed seconds count
# iff the running session count is > 0; a day's last point chains to
# the NEXT day's first boundary (from the same broadcast day frame),
# so overnight spans attribute to their starting day exactly like a
# global sweep. Boundary timestamps floor to whole epoch seconds on
# BOTH sides (Spark timestamp->long truncates; DuckDB needs an
# explicit floor() because CAST(double AS BIGINT) rounds half-even).
_COVERAGE_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM e
),
sess AS (
  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS t0,
         CAST(floor(epoch(max(ts))) AS BIGINT) AS t1
  FROM s GROUP BY user_id, sid
),
pts AS (
  SELECT t0 AS t, 1 AS d FROM sess UNION ALL SELECT t1, -1 FROM sess
),
agg AS (SELECT t, CAST(sum(d) AS BIGINT) AS d FROM pts GROUP BY t),
sweep AS (
  SELECT t,
         sum(d) OVER (ORDER BY t) AS running,
         lead(t) OVER (ORDER BY t) AS nxt
  FROM agg
)
SELECT strftime(make_timestamp(t * 1000000), '%Y-%m-%d') AS day,
       CAST(sum(CASE WHEN running > 0 THEN coalesce(nxt, t) - t
                     ELSE 0 END) AS BIGINT) AS covered_sec
FROM sweep
GROUP BY day
HAVING sum(CASE WHEN running > 0 THEN coalesce(nxt, t) - t ELSE 0 END) > 0
"""


@register("session_coverage", oracle=_COVERAGE_ORACLE, tags=("window", "sweep"))
def session_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seconds of each day covered by at least one active user session
    (the union-of-intervals measure) — the coverage sibling of
    ``concurrent_sessions_peak``'s max statistic: same +-1 sweep
    deltas, accumulating elapsed time while the running session count
    is positive. Utilization/SLA reporting at 100 TB is exactly this
    shape.

    Scale notes: deltas collapse to one row per distinct boundary
    second BEFORE any ordered pass, and the prefix sum is two-level
    exactly like the peak query — within-day windows (parallel across
    days) plus a |days|-row broadcast frame carrying (a) the running
    offset for sessions open at midnight and (b) the next day's first
    boundary so a day's closing segment is measured without a global
    sort. The oracle's single global sweep is reproduced exactly,
    including overnight spans attributed to their starting day.
    """
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational10 import (
        session_bounds,
    )

    e = _t(spark, sf_dir, "events")
    # checkpoint the session-grain frame (both union arms consume it)
    # and the boundary-grain agg below (both sweep levels consume it) —
    # uncheckpointed this builder scans events 4× (multi-derivation
    # trap, BASELINE.md r5); checkpointed, once.
    sess = (
        session_bounds(e)
        .select(
            F.col("s_start").cast("timestamp").cast("long").alias("t0"),
            F.col("s_end").cast("timestamp").cast("long").alias("t1"),
        )
        .localCheckpoint(eager=False)
    )
    pts = sess.select(F.col("t0").alias("t"), F.lit(1).alias("d")).union(
        sess.select(F.col("t1").alias("t"), F.lit(-1).alias("d"))
    )
    agg = (
        pts.groupBy("t")
        .agg(F.sum("d").cast("long").alias("d"))
        .withColumn(
            "day", F.date_format(F.timestamp_seconds("t"), "yyyy-MM-dd")
        )
        .localCheckpoint(eager=False)
    )
    wd = Window.partitionBy("day").orderBy("t")
    local = agg.select(
        "day",
        "t",
        F.sum("d").over(wd.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "local_run"
        ),
        F.lead("t").over(wd).alias("nxt_in_day"),
    )
    # |days|-row frame: carry-in offset + next day's first boundary
    wdays = Window.orderBy("day")
    dayf = (
        agg.groupBy("day")
        .agg(F.sum("d").alias("net"), F.min("t").alias("first_t"))
        .select(
            "day",
            F.coalesce(
                F.sum("net").over(wdays.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long").alias("carry_in"),
            F.lead("first_t").over(wdays).alias("next_day_first"),
        )
    )
    sweep = local.join(F.broadcast(dayf), "day").select(
        "day",
        "t",
        (F.col("local_run") + F.col("carry_in")).alias("running"),
        F.coalesce("nxt_in_day", "next_day_first").alias("nxt"),
    )
    return (
        sweep.groupBy("day")
        .agg(
            F.sum(
                F.when(
                    F.col("running") > 0,
                    F.coalesce(F.col("nxt"), F.col("t")) - F.col("t"),
                ).otherwise(0)
            ).cast("long").alias("covered_sec")
        )
        .where(F.col("covered_sec") > 0)
    )


# ---------------------------------------------------------------------------
# HLL set-algebra overlap audit
# ---------------------------------------------------------------------------

_OVERLAP_ORACLE = """
WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
p AS (
  SELECT a.event_type AS type_1, b.event_type AS type_2,
         CAST(count(*) AS BIGINT) AS exact_overlap
  FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_1, type_2, exact_overlap, TRUE AS approx_ok FROM p
"""


@register("hll_overlap_audit", oracle=_OVERLAP_ORACLE, tags=("agg", "sketch"))
def hll_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user OVERLAP between every pair of event types, exact
    plus an inclusion-exclusion estimate from mergeable HLL sketches
    (|A∩B| ≈ est(A) + est(B) - est(A∪B)), audited within 10% of the
    larger set — completing the sketch algebra next to
    ``hll_distinct_audit``'s union: at 100 TB you persist ONE sketch
    per type and answer any pairwise overlap by merging two 16 KB
    states, never re-scanning.

    Determinism: HLL state is a per-register max (order-independent),
    and lgConfigK=14 gives ~0.8% RSD per estimate, so the 10%-of-max
    audit band is far beyond any realizable error — the boolean cannot
    flap. The exact side exists to BE the oracle, same division of
    labor as the other sketch audits.
    """
    e = _t(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.count_distinct("user_id").cast("long").alias("exact_n"),
    ).localCheckpoint(eager=False)
    a = sk.select(
        F.col("event_type").alias("type_1"),
        F.col("sk").alias("sk1"),
        F.col("exact_n").alias("n1"),
    )
    b = sk.select(
        F.col("event_type").alias("type_2"),
        F.col("sk").alias("sk2"),
        F.col("exact_n").alias("n2"),
    )
    pairs = a.join(b, F.col("type_1") < F.col("type_2")).select(
        "type_1",
        "type_2",
        F.hll_sketch_estimate("sk1").alias("est1"),
        F.hll_sketch_estimate("sk2").alias("est2"),
        F.hll_sketch_estimate(
            F.expr("hll_union(sk1, sk2)")
        ).alias("est_union"),
        F.greatest("n1", "n2").alias("nmax"),
    )
    u = _t(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    ua = u.select(F.col("event_type").alias("type_1"), "user_id")
    ub = u.select(F.col("event_type").alias("type_2"), F.col("user_id").alias("uid2"))
    exact = (
        ua.join(
            ub,
            (ua["user_id"] == ub["uid2"]) & (F.col("type_1") < F.col("type_2")),
        )
        .groupBy("type_1", "type_2")
        .agg(F.count("*").cast("long").alias("exact_overlap"))
    )
    est = pairs.select(
        "type_1",
        "type_2",
        (F.col("est1") + F.col("est2") - F.col("est_union")).alias("est_overlap"),
        "nmax",
    )
    return exact.join(F.broadcast(est), ["type_1", "type_2"]).select(
        "type_1",
        "type_2",
        "exact_overlap",
        (
            F.abs(F.col("est_overlap") - F.col("exact_overlap"))
            <= F.col("nmax") * 0.10
        ).alias("approx_ok"),
    )
