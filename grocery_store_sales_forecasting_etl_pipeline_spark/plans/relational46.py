"""Round-6 additions, batch 46: the business-analytics closures — a
cohort LTV curve (cumulative revenue per signup cohort by age, the
marketing metric cohort_retention only counts users for), a
shift-share decomposition of year-over-year revenue growth by
supplier nation (how much of each nation's growth is the tide vs the
boat), and classical price indices per brand (Laspeyres, Paasche,
Fisher — the retail-economics standard for separating price movement
from basket drift).

Determinism discipline: cohort keys are Monday-anchored dates and
ages exact integer week differences; all revenue masses
are exact cents; the decomposition and indices are closed-form
doubles over exact sums (the per-part price-quantity cross terms sum
~80 doubles per brand — noise ~1e-15 of the ratio against 6dp
rounding), rounded once.
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
# Cohort LTV curve
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         CAST(min(ts) AS DATE) AS first_day
  FROM events GROUP BY user_id
),
cohorts AS (
  SELECT user_id,
         first_day - CAST((dayofweek(first_day) + 6) % 7 AS INTEGER) AS cw
  FROM firsts
),
sizes AS (
  SELECT cw, CAST(count(*) AS BIGINT) AS cohort_users
  FROM cohorts GROUP BY cw
),
purch AS (
  SELECT c.cw,
         CAST(date_diff('day', c.cw,
              CAST(e.ts AS DATE)
                - CAST((dayofweek(CAST(e.ts AS DATE)) + 6) % 7 AS INTEGER))
              // 7 AS BIGINT) AS age_weeks,
         CAST(count(*) AS BIGINT) AS n_purchases,
         CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM events e JOIN cohorts c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
),
cum AS (
  SELECT cw, age_weeks, n_purchases,
         CAST(sum(rev) OVER (PARTITION BY cw ORDER BY age_weeks
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_revenue_cents
  FROM purch
)
SELECT cum.cw AS cohort_week,
       cum.age_weeks,
       cum.n_purchases,
       cum.cum_revenue_cents,
       s.cohort_users,
       round(cum.cum_revenue_cents * 1.0 / s.cohort_users, 2) AS ltv_cents_per_user
FROM cum JOIN sizes s ON cum.cw = s.cw
"""


@register("cohort_ltv_curve", oracle=_LTV_ORACLE, tags=("events", "window", "agg"))
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users cohorted by first-activity
    WEEK (Monday-anchored; the events corpus spans ~1 month, so weekly
    cohorts give the curve real cells), purchase revenue accumulated
    by weeks-since-cohort, and
    LTV per cohort user — the curve a marketer reads payback periods
    off. Companion to cohort_retention (which counts active USERS per
    cell; this accumulates MONEY per cohort).

    Determinism: cohort keys are Monday-anchored dates (the modular
    dayofweek idiom) and ages are exact integer week differences;
    revenue is exact cents; the cumulative window runs over integer
    cells; the single per-user division rounds once.

    Scale notes: one user-keyed fold for first-activity, broadcast
    back onto the purchase stream (user-dim sized), one
    (cohort, age) fold with map-side partials, and the cumulative
    window runs over the calendar-bounded cohort-x-age frame. Nothing
    is user-grain after the first two shuffles.
    """
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min("ts").cast("date").alias("first_day"))
    monday = lambda col: F.date_sub(col, (F.dayofweek(col) + F.lit(5)) % F.lit(7))
    cohorts = firsts.select(
        "user_id", monday(F.col("first_day")).alias("cw")
    ).localCheckpoint(eager=False)
    sizes = cohorts.groupBy("cw").agg(F.count("*").cast("long").alias("cohort_users"))
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .join(_gbcast(cohorts, source=e), "user_id")
        .groupBy(
            "cw",
            (F.datediff(monday(F.col("ts").cast("date")), F.col("cw")) / 7)
            .cast("long")
            .alias("age_weeks"),
        )
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("rev"),
        )
    )
    w_cum = (
        Window.partitionBy("cw")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = purch.select(
        "cw",
        "age_weeks",
        "n_purchases",
        F.sum("rev").over(w_cum).cast("long").alias("cum_revenue_cents"),
    )
    return cum.join(F.broadcast(sizes), "cw").select(
        F.col("cw").alias("cohort_week"),
        "age_weeks",
        "n_purchases",
        "cum_revenue_cents",
        "cohort_users",
        F.round(F.col("cum_revenue_cents") * 1.0 / F.col("cohort_users"), 2).alias(
            "ltv_cents_per_user"
        ),
    )


# ---------------------------------------------------------------------------
# Shift-share decomposition of YoY revenue growth by supplier nation
# ---------------------------------------------------------------------------

_SHIFT_ORACLE = """
WITH r AS (
  SELECT n.n_name AS nation,
         year(l.l_shipdate) AS yr,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE year(l.l_shipdate) IN (1996, 1997)
  GROUP BY 1, 2
),
p AS (
  SELECT nation,
         CAST(coalesce(sum(CASE WHEN yr = 1996 THEN rev END), 0) AS BIGINT) AS r0,
         CAST(coalesce(sum(CASE WHEN yr = 1997 THEN rev END), 0) AS BIGINT) AS r1
  FROM r GROUP BY nation
),
tot AS (
  SELECT CAST(sum(r0) AS BIGINT) AS t0, CAST(sum(r1) AS BIGINT) AS t1 FROM p
)
SELECT p.nation, p.r0, p.r1,
       CAST(p.r1 - p.r0 AS BIGINT) AS delta,
       round(p.r0 * (CAST(t1 AS DOUBLE) / t0 - 1), 2) AS tide_effect,
       round((p.r1 - p.r0) - p.r0 * (CAST(t1 AS DOUBLE) / t0 - 1), 2)
         AS competitive_effect
FROM p CROSS JOIN tot
"""


@register("shift_share_decomposition", oracle=_SHIFT_ORACLE, tags=("agg", "stats"))
def shift_share_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition of 1996->1997 revenue growth by
    supplier nation: each nation's delta splits into the TIDE effect
    (what it would have grown had it tracked the corpus-wide rate,
    r0 * (T1/T0 - 1)) and the COMPETITIVE effect (the residual — share
    gained or lost against the market). The BI decomposition that
    stops a regional team taking credit for a rising market.

    Determinism: per-nation-year revenue is exact cents; the only
    float is the corpus growth ratio applied in one closed-form
    expression per row, rounded once. The two effects sum back to the
    exact integer delta by construction (pinned in pytest).

    Scale notes: one fact scan with both dims broadcast, folded
    map-side to (nation, year) — 25 x 2 rows; the pivot and the
    1-row totals crossJoin are micro-frame operations. The year
    filter pushes to the parquet scan.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = (
        li.filter(F.year("l_shipdate").isin(1996, 1997))
        .join(_gbcast(s.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("yr"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("rev")
        )
    )
    p = r.groupBy("nation").agg(
        F.coalesce(F.sum(F.when(F.col("yr") == 1996, F.col("rev"))), F.lit(0))
        .cast("long")
        .alias("r0"),
        F.coalesce(F.sum(F.when(F.col("yr") == 1997, F.col("rev"))), F.lit(0))
        .cast("long")
        .alias("r1"),
    ).localCheckpoint(eager=False)
    tot = p.agg(
        F.sum("r0").cast("long").alias("t0"), F.sum("r1").cast("long").alias("t1")
    )
    j = p.crossJoin(F.broadcast(tot))
    tide = F.col("r0") * (F.col("t1").cast("double") / F.col("t0") - 1)
    return j.select(
        "nation",
        "r0",
        "r1",
        (F.col("r1") - F.col("r0")).cast("long").alias("delta"),
        F.round(tide, 2).alias("tide_effect"),
        F.round((F.col("r1") - F.col("r0")) - tide, 2).alias("competitive_effect"),
    )


# ---------------------------------------------------------------------------
# Classical price indices per brand (Laspeyres / Paasche / Fisher)
# ---------------------------------------------------------------------------

_INDEX_ORACLE = """
WITH py AS (
  SELECT p.p_brand AS brand, l.l_partkey AS partkey,
         year(l.l_shipdate) AS yr,
         CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS q,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) IN (1996, 1997)
  GROUP BY 1, 2, 3
),
m AS (
  SELECT brand, partkey,
         CAST(sum(CASE WHEN yr = 1996 THEN q END) AS BIGINT) AS q0,
         CAST(sum(CASE WHEN yr = 1996 THEN c END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN yr = 1997 THEN q END) AS BIGINT) AS q1,
         CAST(sum(CASE WHEN yr = 1997 THEN c END) AS BIGINT) AS c1
  FROM py GROUP BY 1, 2
  HAVING sum(CASE WHEN yr = 1996 THEN q END) > 0
     AND sum(CASE WHEN yr = 1997 THEN q END) > 0
),
s AS (
  SELECT brand,
         CAST(count(*) AS BIGINT) AS n_matched_parts,
         sum(CAST(c1 AS DOUBLE) / q1 * q0) AS p1q0,
         sum(CAST(c0 AS DOUBLE) / q0 * q0) AS p0q0,
         sum(CAST(c1 AS DOUBLE) / q1 * q1) AS p1q1,
         sum(CAST(c0 AS DOUBLE) / q0 * q1) AS p0q1
  FROM m GROUP BY brand
)
SELECT brand, n_matched_parts,
       round(p1q0 / p0q0, 6) AS laspeyres,
       round(p1q1 / p0q1, 6) AS paasche,
       round(sqrt((p1q0 / p0q0) * (p1q1 / p0q1)), 6) AS fisher
FROM s
"""


@register("brand_price_indices", oracle=_INDEX_ORACLE, tags=("agg", "stats"))
def brand_price_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche, and Fisher price indices per brand between
    1996 and 1997 over the matched-part basket (parts sold in BOTH
    years): Laspeyres weights price relatives by base-year
    quantities, Paasche by current-year, Fisher is their geometric
    mean — the standard retail separation of price inflation from
    basket-mix drift (a raw revenue-per-unit trend confounds the two).

    Determinism: unit prices are exact-integer ratios c/q per
    (part, year); the four cross-sums each add ~|parts per brand|
    identical doubles (noise ~1e-15 of a near-1.0 ratio against 6dp
    rounding); each index is one closed-form expression rounded once.

    Scale notes: one fact scan (year filter pushed down, part dim
    broadcast) folds to (brand, part, year) grain map-side; the
    matched-basket pivot and index sums run at part-catalog grain.
    Output is brand cardinality.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    py = (
        li.filter(F.year("l_shipdate").isin(1996, 1997))
        .join(_gbcast(p.select("p_partkey", "p_brand")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_partkey").alias("partkey"),
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            F.sum(F.round("l_quantity").cast("long")).cast("long").alias("q"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("c"),
        )
    )
    m = (
        py.groupBy("brand", "partkey")
        .agg(
            F.sum(F.when(F.col("yr") == 1996, F.col("q"))).cast("long").alias("q0"),
            F.sum(F.when(F.col("yr") == 1996, F.col("c"))).cast("long").alias("c0"),
            F.sum(F.when(F.col("yr") == 1997, F.col("q"))).cast("long").alias("q1"),
            F.sum(F.when(F.col("yr") == 1997, F.col("c"))).cast("long").alias("c1"),
        )
        .filter((F.col("q0") > 0) & (F.col("q1") > 0))
    )
    p1 = F.col("c1").cast("double") / F.col("q1")
    p0 = F.col("c0").cast("double") / F.col("q0")
    s = m.groupBy("brand").agg(
        F.count("*").cast("long").alias("n_matched_parts"),
        F.sum(p1 * F.col("q0")).alias("p1q0"),
        F.sum(p0 * F.col("q0")).alias("p0q0"),
        F.sum(p1 * F.col("q1")).alias("p1q1"),
        F.sum(p0 * F.col("q1")).alias("p0q1"),
    )
    lasp = F.col("p1q0") / F.col("p0q0")
    paas = F.col("p1q1") / F.col("p0q1")
    return s.select(
        "brand",
        "n_matched_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )
