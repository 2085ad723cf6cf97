"""Round-6 additions, batch 55: monitoring and causal-flavored
analytics — windowed event-rate anomaly scoring (each 6-hour window's
count z-scored against its own trailing baseline — the shape every
ops monitor runs), partial correlation (price vs quantity CONTROLLING
for discount — the screen that separates a real relationship from a
confounded one), the promo halo effect (do discounted baskets lift
the full-price lines riding along in the same order), and monthly
return-rate Wilson intervals (the binomial control chart for a
seasonal quality metric).

Determinism discipline: window counts and cents are exact BIGINTs
with DECIMAL(38,0)/HUGEINT second moments; the partial-correlation
formula r_xy.z = (r_xy - r_xz*r_yz)/sqrt((1-r_xz²)(1-r_yz²)) runs on
three Pearsons that each derive from one integer sufficient-stat
fold; Wilson bounds use the repo's established closed form with
z = 1.96 as an exact literal.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Windowed event-rate anomaly
# ---------------------------------------------------------------------------

_RATE_ANOMALY_ORACLE = """
WITH w AS (
  SELECT time_bucket(INTERVAL 6 HOUR, ts) AS window_start,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
r AS (
  SELECT window_start, n_events,
         CAST(count(*) OVER tr AS BIGINT) AS base_n,
         CAST(sum(n_events) OVER tr AS BIGINT) AS base_s,
         CAST(sum(CAST(n_events AS HUGEINT) * n_events) OVER tr AS HUGEINT)
           AS base_q
  FROM w
  WINDOW tr AS (ORDER BY window_start
                ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT window_start, n_events, base_n,
         CASE WHEN base_n >= 4
                   AND (CAST(base_q AS DOUBLE)
                        - CAST(base_s AS DOUBLE) * CAST(base_s AS DOUBLE)
                          / base_n) / (base_n - 1) > 0
              THEN (CAST(n_events AS DOUBLE) - CAST(base_s AS DOUBLE) / base_n)
                   / sqrt((CAST(base_q AS DOUBLE)
                           - CAST(base_s AS DOUBLE) * CAST(base_s AS DOUBLE)
                             / base_n) / (base_n - 1))
         END AS zraw
  FROM r
)
SELECT window_start, n_events, base_n,
       round(zraw, 4) AS rate_zscore,
       CAST(CASE WHEN abs(zraw) > 3.0 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM z WHERE base_n >= 4
"""


@register("event_rate_anomaly", oracle=_RATE_ANOMALY_ORACLE, tags=("streaming", "window"))
def event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed event-rate anomaly score: each 6-hour window's event
    count z-scored against the mean/std of its own trailing 8 windows
    (current window excluded — the baseline must not contain the point
    it judges), flagged at |z| > 3. This is the batch contract for the
    canonical streaming monitor shape: windowed count → window-over-
    window baseline → alert; windows with fewer than 4 baseline points
    don't score (cold start, mirrored on both sides).

    Numerics: counts are exact; the trailing second moment accumulates
    in DECIMAL(38,0)/HUGEINT; the z tree is identical on both sides
    (the stateful_outlier_scores discipline applied window-over-window)
    and NULL-guards zero variance.

    Scale notes: the fact folds to the calendar-bounded window frame
    first (map-side combinable); the trailing window runs over that
    tiny frame. The 6h bucket is the TZ-safe midnight-aligned
    time_bucket == F.window equivalence pinned by event_time_buckets.
    """
    e = _t(spark, sf_dir, "events")
    w = (
        e.groupBy(F.window("ts", "6 hours").alias("win"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            "n_events",
        )
    )
    tr = Window.orderBy("window_start").rowsBetween(-8, -1)
    d38 = "decimal(38,0)"
    r = w.select(
        "window_start",
        "n_events",
        F.count("*").over(tr).cast("long").alias("base_n"),
        F.sum("n_events").over(tr).cast("long").alias("base_s"),
        F.sum(F.col("n_events").cast(d38) * F.col("n_events"))
        .over(tr)
        .alias("base_q"),
    )
    var = (
        F.col("base_q").cast("double")
        - F.col("base_s").cast("double")
        * F.col("base_s").cast("double")
        / F.col("base_n")
    ) / (F.col("base_n") - 1)
    zraw = F.when(
        (F.col("base_n") >= 4) & (var > 0),
        (F.col("n_events").cast("double") - F.col("base_s").cast("double") / F.col("base_n"))
        / F.sqrt(var),
    )
    z = r.select(
        "window_start", "n_events", "base_n", zraw.alias("zraw")
    ).filter(F.col("base_n") >= 4)
    return z.select(
        "window_start",
        "n_events",
        "base_n",
        F.round(F.col("zraw"), 4).alias("rate_zscore"),
        F.when(F.abs(F.col("zraw")) > 3.0, 1)
        .otherwise(0)
        .cast("long")
        .alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Partial correlation (price vs quantity | discount)
# ---------------------------------------------------------------------------

_PARTIAL_CORR_ORACLE = """
WITH x AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
         CAST(round(l_quantity * 100) AS BIGINT) AS q,
         CAST(round(l_discount * 100) AS BIGINT) AS d
  FROM lineitem
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(p AS HUGEINT)) AS HUGEINT) AS sp,
         CAST(sum(CAST(q AS HUGEINT)) AS HUGEINT) AS sq,
         CAST(sum(CAST(d AS HUGEINT)) AS HUGEINT) AS sd,
         CAST(sum(CAST(p AS HUGEINT) * q) AS HUGEINT) AS spq,
         CAST(sum(CAST(p AS HUGEINT) * d) AS HUGEINT) AS spd,
         CAST(sum(CAST(q AS HUGEINT) * d) AS HUGEINT) AS sqd,
         CAST(sum(CAST(p AS HUGEINT) * p) AS HUGEINT) AS spp,
         CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS sqq,
         CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sdd
  FROM x
),
rr AS (
  SELECT n,
         (CAST(n AS DOUBLE) * CAST(spq AS DOUBLE)
            - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                 - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                 - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))) AS r_pq,
         (CAST(n AS DOUBLE) * CAST(spd AS DOUBLE)
            - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                 - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                 - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))) AS r_pd,
         (CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE)
            - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                 - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                 - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))) AS r_qd
  FROM st
)
SELECT n AS n_lines,
       round(r_pq, 6) AS corr_price_qty,
       round(r_pd, 6) AS corr_price_discount,
       round(r_qd, 6) AS corr_qty_discount,
       round((r_pq - r_pd * r_qd)
             / sqrt((1 - r_pd * r_pd) * (1 - r_qd * r_qd)), 6)
         AS partial_corr_price_qty
FROM rr
"""


@register("price_qty_partial_corr", oracle=_PARTIAL_CORR_ORACLE, tags=("stats",))
def price_qty_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation of line price and quantity
    CONTROLLING for discount: r_pq.d = (r_pq - r_pd·r_qd) /
    sqrt((1-r_pd²)(1-r_qd²)). If the raw price-quantity correlation
    survives the control it is not a discount artifact — the standard
    confounder screen before anyone fits an elasticity. All three
    pairwise correlations are emitted alongside so the adjustment is
    auditable.

    Numerics: ONE fact fold to ten integer sufficient statistics in
    DECIMAL(38,0)/HUGEINT (cents x centi-qty products cross BIGINT at
    ~10^7 rows); the three Pearsons and the partial formula are
    identical double trees, each rounded once at the boundary.

    Scale notes: a single map-side-combinable aggregate — no joins, no
    windows, no second pass; the partial arithmetic is scalar.
    """
    li = _t(spark, sf_dir, "lineitem")
    x = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
    )
    d38 = "decimal(38,0)"
    c = lambda col: F.col(col).cast(d38)
    st = x.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(c("p")).alias("sp"),
        F.sum(c("q")).alias("sq"),
        F.sum(c("d")).alias("sd"),
        F.sum(c("p") * F.col("q")).alias("spq"),
        F.sum(c("p") * F.col("d")).alias("spd"),
        F.sum(c("q") * F.col("d")).alias("sqd"),
        F.sum(c("p") * F.col("p")).alias("spp"),
        F.sum(c("q") * F.col("q")).alias("sqq"),
        F.sum(c("d") * F.col("d")).alias("sdd"),
    )

    def pearson(sxy, sx, sy, sxx, syy):
        n = F.col("n").cast("double")
        return (
            n * F.col(sxy).cast("double")
            - F.col(sx).cast("double") * F.col(sy).cast("double")
        ) / F.sqrt(
            (
                n * F.col(sxx).cast("double")
                - F.col(sx).cast("double") * F.col(sx).cast("double")
            )
            * (
                n * F.col(syy).cast("double")
                - F.col(sy).cast("double") * F.col(sy).cast("double")
            )
        )

    rr = st.select(
        "n",
        pearson("spq", "sp", "sq", "spp", "sqq").alias("r_pq"),
        pearson("spd", "sp", "sd", "spp", "sdd").alias("r_pd"),
        pearson("sqd", "sq", "sd", "sqq", "sdd").alias("r_qd"),
    )
    return rr.select(
        F.col("n").alias("n_lines"),
        F.round(F.col("r_pq"), 6).alias("corr_price_qty"),
        F.round(F.col("r_pd"), 6).alias("corr_price_discount"),
        F.round(F.col("r_qd"), 6).alias("corr_qty_discount"),
        F.round(
            (F.col("r_pq") - F.col("r_pd") * F.col("r_qd"))
            / F.sqrt(
                (1 - F.col("r_pd") * F.col("r_pd"))
                * (1 - F.col("r_qd") * F.col("r_qd"))
            ),
            6,
        ).alias("partial_corr_price_qty"),
    )


# ---------------------------------------------------------------------------
# Promo halo effect
# ---------------------------------------------------------------------------

_HALO_ORACLE = """
WITH promo AS (
  SELECT l_orderkey, CAST(max(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)
                          AS BIGINT) AS has_promo
  FROM lineitem GROUP BY l_orderkey
),
fp AS (
  SELECT p.has_promo,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l JOIN promo p ON l.l_orderkey = p.l_orderkey
  WHERE l.l_discount < 0.05
),
st AS (
  SELECT has_promo,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q
  FROM fp GROUP BY has_promo
),
p AS (
  SELECT max(CASE WHEN has_promo = 1 THEN n END) AS n1,
         max(CASE WHEN has_promo = 1 THEN CAST(s AS DOUBLE) END) AS s1,
         max(CASE WHEN has_promo = 1 THEN CAST(q AS DOUBLE) END) AS q1,
         max(CASE WHEN has_promo = 0 THEN n END) AS n2,
         max(CASE WHEN has_promo = 0 THEN CAST(s AS DOUBLE) END) AS s2,
         max(CASE WHEN has_promo = 0 THEN CAST(q AS DOUBLE) END) AS q2
  FROM st
),
d AS (
  SELECT n1, n2,
         s1 / n1 - s2 / n2 AS diff,
         ((q1 - s1 * s1 / n1) / (n1 - 1)) / n1 AS v1,
         ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2 AS v2
  FROM p
)
SELECT n1 AS n_fullprice_lines_promo_orders,
       n2 AS n_fullprice_lines_other_orders,
       round(diff / 100, 4) AS halo_dollars_per_line,
       round(diff / sqrt(v1 + v2), 6) AS t_welch
FROM d
"""


@register("promo_halo_effect", oracle=_HALO_ORACLE, tags=("stats", "agg", "join"))
def promo_halo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The promo halo: restricted to FULL-PRICE lines only (discount
    < 5%), does their average price differ between orders that also
    contain a promoted line and orders that don't? A positive halo
    means discounts pull bigger full-price items into the basket —
    the cross-sell justification for running promos at a loss; the
    Welch t quantifies whether the gap beats noise.

    Scale notes: the order classification is a map-side-combinable
    fold on the natural key, joined back co-partitioned (orderkey ==
    orderkey — no new shuffle grain); the two-group sufficient-stat
    fold and Welch tree reuse the welch_price_ttest machinery.
    """
    li = _t(spark, sf_dir, "lineitem")
    promo = li.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_discount") >= 0.05, 1).otherwise(0))
        .cast("long")
        .alias("has_promo")
    )
    fp = (
        li.filter(F.col("l_discount") < 0.05)
        .join(promo, "l_orderkey")
        .select(
            "has_promo",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
    )
    d38 = "decimal(38,0)"
    st = fp.groupBy("has_promo").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("cents").cast(d38)).alias("s"),
        F.sum(F.col("cents").cast(d38) * F.col("cents")).alias("q"),
    )
    p = st.agg(
        F.max(F.when(F.col("has_promo") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("has_promo") == 1, F.col("s").cast("double"))).alias("s1"),
        F.max(F.when(F.col("has_promo") == 1, F.col("q").cast("double"))).alias("q1"),
        F.max(F.when(F.col("has_promo") == 0, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("has_promo") == 0, F.col("s").cast("double"))).alias("s2"),
        F.max(F.when(F.col("has_promo") == 0, F.col("q").cast("double"))).alias("q2"),
    )
    diff = F.col("s1") / F.col("n1") - F.col("s2") / F.col("n2")
    v1 = ((F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1")) / (F.col("n1") - 1)) / F.col("n1")
    v2 = ((F.col("q2") - F.col("s2") * F.col("s2") / F.col("n2")) / (F.col("n2") - 1)) / F.col("n2")
    d = p.select(
        "n1", "n2", diff.alias("diff"), v1.alias("v1"), v2.alias("v2")
    )
    return d.select(
        F.col("n1").alias("n_fullprice_lines_promo_orders"),
        F.col("n2").alias("n_fullprice_lines_other_orders"),
        F.round(F.col("diff") / 100, 4).alias("halo_dollars_per_line"),
        F.round(F.col("diff") / F.sqrt(F.col("v1") + F.col("v2")), 6).alias(
            "t_welch"
        ),
    )


# ---------------------------------------------------------------------------
# Monthly return-rate Wilson intervals
# ---------------------------------------------------------------------------

_MONTHLY_WILSON_ORACLE = """
WITH m AS (
  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS r
  FROM lineitem GROUP BY 1
)
SELECT ym, n, r,
       round(CAST(r AS DOUBLE) / n, 6) AS return_rate,
       round((CAST(r AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)
              - 1.96 * sqrt((CAST(r AS DOUBLE) / n)
                            * (1 - CAST(r AS DOUBLE) / n) / n
                            + 1.96 * 1.96 / (4.0 * n * n)))
             / (1 + 1.96 * 1.96 / n), 6) AS wilson_low,
       round((CAST(r AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)
              + 1.96 * sqrt((CAST(r AS DOUBLE) / n)
                            * (1 - CAST(r AS DOUBLE) / n) / n
                            + 1.96 * 1.96 / (4.0 * n * n)))
             / (1 + 1.96 * 1.96 / n), 6) AS wilson_high
FROM m
"""


@register("monthly_return_wilson", oracle=_MONTHLY_WILSON_ORACLE, tags=("stats", "agg"))
def monthly_return_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly return-rate with 95% Wilson score intervals — the
    binomial control chart for a seasonal quality metric: a month whose
    interval clears the overall band is a real shift, not small-n
    noise (Wilson stays honest at the month sizes where the normal
    approximation lies). Extends source_quality_wilson's closed form
    from a static grouping to the calendar axis.

    Scale notes: one map-side-combinable fold to the calendar-bounded
    month frame; the Wilson trees are per-row scalar arithmetic over
    exact counts with the z=1.96 literal, rounded once.
    """
    li = _t(spark, sf_dir, "lineitem")
    m = li.groupBy(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
        .cast("long")
        .alias("ym")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("r"),
    )
    z = F.lit(1.96)
    phat = F.col("r").cast("double") / F.col("n")
    half = z * F.sqrt(
        phat * (1 - phat) / F.col("n")
        + z * z / (F.lit(4.0) * F.col("n") * F.col("n"))
    )
    center = phat + z * z / (2 * F.col("n"))
    denom = 1 + z * z / F.col("n")
    return m.select(
        "ym",
        "n",
        "r",
        F.round(phat, 6).alias("return_rate"),
        F.round((center - half) / denom, 6).alias("wilson_low"),
        F.round((center + half) / denom, 6).alias("wilson_high"),
    )
