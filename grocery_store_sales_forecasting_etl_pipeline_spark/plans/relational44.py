"""Round-6 additions, batch 44: robust/regularized estimation and an
operational simulation — a Huber M-estimated weekly mean (5 unrolled
IRLS steps: outlier-weeks downweighted smoothly instead of trimmed), a
ridge-regression grid solved in closed form from sufficient statistics
(the 2-predictor normal equations with an L2 term — no iterative
solver, no MLlib dependency), and an integer inventory fill-rate
simulation per part (order-up-to replenishment replayed as a
sequential fold over the gap-filled weekly demand series — the
downstream consumer of batch 40's Croston/safety-stock numbers).

Determinism discipline: Huber weights and the ridge solution are
closed-form doubles over DECIMAL(38,0)/HUGEINT sufficient sums with
identical expression trees in both engines (noise ~1e-13 against 4dp
boundaries); the inventory fold is ALL-INTEGER state (stock, filled,
lost, stockout-weeks) over an ordered array — bit-exact by
construction, like the Croston/EWMA folds but without a single float
until the output ratio.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Huber M-estimated weekly revenue mean (5 unrolled IRLS steps)
# ---------------------------------------------------------------------------

_HUBER_ITERS = 5
_HUBER_C = 1.345  # the standard 95%-efficiency tuning constant

_WEEK_CTE = """
w AS (
  SELECT CAST(l_shipdate AS DATE)
           - CAST((dayofweek(CAST(l_shipdate AS DATE)) + 6) % 7 AS INTEGER) AS x,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
s0 AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM w
),
init AS (
  SELECT CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS m,
         sqrt((CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE) - 1)) AS scale
  FROM s0
)"""


def _huber_oracle() -> str:
    stages = []
    prev = "init"
    for i in range(1, _HUBER_ITERS + 1):
        stages.append(f"""
it{i} AS (
  SELECT sum(CASE WHEN abs(w.y - {prev}.m) <= {_HUBER_C} * {prev}.scale
             THEN CAST(w.y AS DOUBLE)
             ELSE {_HUBER_C} * {prev}.scale / abs(w.y - {prev}.m) * w.y END)
         / sum(CASE WHEN abs(w.y - {prev}.m) <= {_HUBER_C} * {prev}.scale
               THEN 1.0
               ELSE {_HUBER_C} * {prev}.scale / abs(w.y - {prev}.m) END) AS m,
         max({prev}.scale) AS scale
  FROM w CROSS JOIN {prev}
)""")
        prev = f"it{i}"
    body = ",".join(stages)
    return f"""
WITH {_WEEK_CTE},
{body}
SELECT CAST((SELECT n FROM s0) AS BIGINT) AS n_weeks,
       round((SELECT m FROM init), 4) AS plain_mean,
       round((SELECT scale FROM init), 4) AS scale,
       round({prev}.m, 4) AS huber_mean
FROM {prev}
"""


@register("huber_weekly_mean", oracle=_huber_oracle(), tags=("stats", "robust", "timeseries"))
def huber_weekly_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimate of the weekly-revenue location: 5 fixed IRLS
    steps with c = 1.345 and the scale frozen at the initial sample
    std — observations inside c*scale keep weight 1, outliers get the
    smooth c*scale/|r| downweight (between the mean's weight-everything
    and the trimmed mean's weight-zero). The companion to
    weekly_esd_outliers: ESD names the outlier weeks, Huber reports
    the location AS IF they had been softly discounted.

    Determinism: weekly cents are exact; the init mean/std come from
    DECIMAL(38,0) sums; each IRLS step is one weighted mean over the
    ~100-row week frame with identical closed-form weights in both
    engines (float-sum noise ~1e-13 per step over bounded terms, 4dp
    output). Fixed iteration count — no data-dependent convergence
    test to diverge on.

    Scale notes: ONE map-side-combined fact fold to the calendar-
    bounded week grain (localCheckpointed; all 5 steps and the init
    stats consume it); every iteration is a 1-row aggregate
    crossJoined back as a broadcast. Iteration state is a scalar.
    """
    li = _t(spark, sf_dir, "lineitem")
    monday = F.date_sub(
        F.col("l_shipdate").cast("date"),
        (F.dayofweek(F.col("l_shipdate").cast("date")) + F.lit(5)) % F.lit(7),
    )
    w = (
        li.groupBy(monday.alias("x"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
        .localCheckpoint(eager=False)
    )
    dec = "decimal(38,0)"
    s0 = w.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    init = s0.select(
        F.col("n").cast("long").alias("n_weeks"),
        (F.col("sy").cast("double") / n_d).alias("m"),
        F.sqrt(
            (
                F.col("syy").cast("double")
                - F.col("sy").cast("double") * F.col("sy").cast("double") / n_d
            )
            / (n_d - 1)
        ).alias("scale"),
    ).localCheckpoint(eager=False)
    cur = init
    for _ in range(_HUBER_ITERS):
        r = F.abs(F.col("y") - F.col("m"))
        wgt = F.when(r <= _HUBER_C * F.col("scale"), F.lit(1.0)).otherwise(
            F.lit(_HUBER_C) * F.col("scale") / r
        )
        cur = (
            w.crossJoin(F.broadcast(cur.select("n_weeks", "m", "scale")))
            .agg(
                F.max("n_weeks").alias("n_weeks"),
                (F.sum(wgt * F.col("y")) / F.sum(wgt)).alias("m"),
                F.max("scale").alias("scale"),
            )
        )
    return cur.crossJoin(F.broadcast(init.select(F.col("m").alias("m0"), F.col("scale").alias("s0")))).select(
        "n_weeks",
        F.round("m0", 4).alias("plain_mean"),
        F.round("s0", 4).alias("scale"),
        F.round("m", 4).alias("huber_mean"),
    )


# ---------------------------------------------------------------------------
# Ridge regression grid in closed form (2 predictors + intercept)
# ---------------------------------------------------------------------------

_RIDGE_LAMBDAS = (0.0, 4.0, 16.0)

_RIDGE_ORACLE = f"""
WITH w AS (
  SELECT CAST(l_shipdate AS DATE)
           - CAST((dayofweek(CAST(l_shipdate AS DATE)) + 6) % 7 AS INTEGER) AS wk,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
x AS (
  SELECT CAST(date_diff('day', (SELECT min(wk) FROM w), wk) // 7 AS BIGINT) AS x1,
         q AS x2, y
  FROM w
),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x1 AS HUGEINT)) AS HUGEINT) AS s1,
         CAST(sum(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s2,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy0,
         CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
         CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
         CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
         CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
         CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y
  FROM x
),
c AS (
  SELECT CAST(n AS DOUBLE) AS n,
         CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n AS c11,
         CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n AS c22,
         CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n AS c12,
         CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy0 / n AS c1y,
         CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy0 / n AS c2y,
         CAST(s1 AS DOUBLE) / n AS m1,
         CAST(s2 AS DOUBLE) / n AS m2,
         CAST(sy0 AS DOUBLE) / n AS my
  FROM s
),
g AS (SELECT CAST(unnest(list_value{_RIDGE_LAMBDAS}) AS DOUBLE) AS lam)
SELECT lam AS ridge_lambda,
       round(((c22 + lam * (c11 + c22) / 2) * c1y - c12 * c2y)
             / ((c11 + lam * (c11 + c22) / 2) * (c22 + lam * (c11 + c22) / 2)
                - c12 * c12), 6) AS b_week,
       round((((c11 + lam * (c11 + c22) / 2) * c2y - c12 * c1y))
             / ((c11 + lam * (c11 + c22) / 2) * (c22 + lam * (c11 + c22) / 2)
                - c12 * c12), 6) AS b_qty,
       round(my
             - ((c22 + lam * (c11 + c22) / 2) * c1y - c12 * c2y)
               / ((c11 + lam * (c11 + c22) / 2) * (c22 + lam * (c11 + c22) / 2)
                  - c12 * c12) * m1
             - ((c11 + lam * (c11 + c22) / 2) * c2y - c12 * c1y)
               / ((c11 + lam * (c11 + c22) / 2) * (c22 + lam * (c11 + c22) / 2)
                  - c12 * c12) * m2, 4) AS intercept
FROM c CROSS JOIN g
"""


@register("ridge_trend_grid", oracle=_RIDGE_ORACLE, tags=("ml", "stats"))
def ridge_trend_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression of weekly revenue on (week index, weekly
    quantity) for a grid of regularization strengths, solved in CLOSED
    FORM from sufficient statistics: the centered 2x2 normal equations
    with the L2 term lam*(mean diagonal) added to the diagonal (a
    scale-balanced penalty so one lambda grid serves both predictors),
    inverted symbolically — no iterative solver, no collect of the
    data, three output rows from nine exact sums. lambda = 0 is
    exactly OLS, pinning the grid's base case to the classical answer.

    Determinism: all nine sufficient sums are DECIMAL(38,0)/HUGEINT
    exact; the solution is one closed-form double expression per
    coefficient (identical trees in both engines), rounded once.

    Scale notes: ONE map-side-combined fold to the calendar-bounded
    week grain, one 1-row sufficient-statistics aggregate, then a
    3-row literal-grid cross join — the entire "model fitting" costs
    one scan regardless of data size, which is the point of
    sufficient-statistics ML at 100 TB.
    """
    li = _t(spark, sf_dir, "lineitem")
    monday = F.date_sub(
        F.col("l_shipdate").cast("date"),
        (F.dayofweek(F.col("l_shipdate").cast("date")) + F.lit(5)) % F.lit(7),
    )
    wk = li.groupBy(monday.alias("wk")).agg(
        F.sum(F.round("l_quantity").cast("long")).cast("long").alias("q"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("y"),
    )
    w0 = Window.partitionBy()
    x = wk.select(
        (F.datediff(F.col("wk"), F.min("wk").over(w0)) / 7).cast("long").alias("x1"),
        F.col("q").alias("x2"),
        "y",
    )
    dec = "decimal(38,0)"
    s = x.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x1").cast(dec)).alias("s1"),
        F.sum(F.col("x2").cast(dec)).alias("s2"),
        F.sum(F.col("y").cast(dec)).alias("sy0"),
        F.sum(F.col("x1").cast(dec) * F.col("x1")).alias("s11"),
        F.sum(F.col("x2").cast(dec) * F.col("x2")).alias("s22"),
        F.sum(F.col("x1").cast(dec) * F.col("x2")).alias("s12"),
        F.sum(F.col("x1").cast(dec) * F.col("y")).alias("s1y"),
        F.sum(F.col("x2").cast(dec) * F.col("y")).alias("s2y"),
    )
    n_d = F.col("n").cast("double")
    c = s.select(
        n_d.alias("n"),
        (F.col("s11").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / n_d).alias("c11"),
        (F.col("s22").cast("double") - F.col("s2").cast("double") * F.col("s2").cast("double") / n_d).alias("c22"),
        (F.col("s12").cast("double") - F.col("s1").cast("double") * F.col("s2").cast("double") / n_d).alias("c12"),
        (F.col("s1y").cast("double") - F.col("s1").cast("double") * F.col("sy0").cast("double") / n_d).alias("c1y"),
        (F.col("s2y").cast("double") - F.col("s2").cast("double") * F.col("sy0").cast("double") / n_d).alias("c2y"),
        (F.col("s1").cast("double") / n_d).alias("m1"),
        (F.col("s2").cast("double") / n_d).alias("m2"),
        (F.col("sy0").cast("double") / n_d).alias("my"),
    )
    g = c.select(
        "*", F.explode(F.array(*[F.lit(l) for l in _RIDGE_LAMBDAS])).alias("lam")
    )
    diag = F.col("lam") * (F.col("c11") + F.col("c22")) / 2
    a11 = F.col("c11") + diag
    a22 = F.col("c22") + diag
    det = a11 * a22 - F.col("c12") * F.col("c12")
    b1 = (a22 * F.col("c1y") - F.col("c12") * F.col("c2y")) / det
    b2 = (a11 * F.col("c2y") - F.col("c12") * F.col("c1y")) / det
    return g.select(
        F.col("lam").alias("ridge_lambda"),
        F.round(b1, 6).alias("b_week"),
        F.round(b2, 6).alias("b_qty"),
        F.round(F.col("my") - b1 * F.col("m1") - b2 * F.col("m2"), 4).alias(
            "intercept"
        ),
    )


# ---------------------------------------------------------------------------
# Integer inventory fill-rate simulation per part
# ---------------------------------------------------------------------------

_SIM_MIN_WEEKS = 8  # parts need a meaningful span to simulate

_SIM_ORACLE = f"""
WITH d0 AS (
  SELECT l_partkey AS partkey,
         CAST(l_shipdate AS DATE)
           - CAST((dayofweek(CAST(l_shipdate AS DATE)) + 6) % 7 AS INTEGER)
           AS week_start,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
),
g AS (
  SELECT partkey,
         CAST(min(week_start) - DATE '1970-01-01' AS BIGINT) AS w0d,
         CAST((max(week_start) - min(week_start)) // 7 + 1 AS BIGINT) AS span,
         CAST(sum(qty) AS BIGINT) AS total,
         list(list_value(CAST(week_start - DATE '1970-01-01' AS BIGINT), qty)
              ORDER BY week_start) AS raw
  FROM d0 GROUP BY partkey
  HAVING (max(week_start) - min(week_start)) // 7 + 1 >= {_SIM_MIN_WEEKS}
),
sim AS (
  SELECT partkey, span, total,
         CAST(ceil(total * 1.0 / span) AS BIGINT) AS q_weekly,
         list_reduce(
           list_prepend(
             list_value(2 * CAST(ceil(total * 1.0 / span) AS BIGINT),
                        CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                        CAST(0 AS BIGINT), CAST(-1 AS BIGINT)),
             list_transform(raw,
                            p -> list_value((p[1] - w0d) // 7, p[2],
                                            CAST(0 AS BIGINT),
                                            CAST(0 AS BIGINT),
                                            CAST(0 AS BIGINT)))),
           (acc, x) -> list_value(
             acc[1] + (x[1] - acc[5]) * CAST(ceil(total * 1.0 / span) AS BIGINT)
               - least(acc[1] + (x[1] - acc[5])
                         * CAST(ceil(total * 1.0 / span) AS BIGINT), x[2]),
             acc[2] + least(acc[1] + (x[1] - acc[5])
                              * CAST(ceil(total * 1.0 / span) AS BIGINT), x[2]),
             acc[3] + x[2] - least(acc[1] + (x[1] - acc[5])
                                     * CAST(ceil(total * 1.0 / span) AS BIGINT),
                                   x[2]),
             acc[4] + CASE WHEN x[2] > acc[1] + (x[1] - acc[5])
                                         * CAST(ceil(total * 1.0 / span)
                                                AS BIGINT)
                           THEN 1 ELSE 0 END,
             x[1]
           )
         ) AS st
  FROM g
)
SELECT partkey, span AS span_weeks, total AS total_demand, q_weekly,
       CAST(st[2] AS BIGINT) AS filled_units,
       CAST(st[3] AS BIGINT) AS lost_units,
       CAST(st[4] AS BIGINT) AS n_stockout_weeks,
       round(st[2] * 1.0 / total, 6) AS fill_rate
FROM sim
"""


@register("inventory_fill_rate_sim", oracle=_SIM_ORACLE, tags=("ml", "timeseries", "agg"))
def inventory_fill_rate_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-up-to inventory simulation per part: starting stock =
    2 weeks of average demand, a fixed replenishment of
    ceil(total/span) units arrives each week, demand is filled from
    on-hand stock, shortfalls are LOST (no backorders); the fold
    reports filled units, lost units, stockout weeks, and the fill
    rate — the service-level readout that grades batch 40's
    safety-stock numbers against an actual demand replay. Weeks with
    zero demand are IN the series (gap-filled from each part's own
    span), because stock accumulates through them.

    Determinism: the simulation state (stock, filled, lost,
    stockout-weeks, previous demand week) is ALL-INTEGER and folds an
    ordered array — both engines execute the identical recurrence on
    identical integers, bit-exact, no float until the output ratio.

    Scale notes: one fold to (part, week) demand grain, then ONE
    (partkey) aggregation collecting the SPARSE demand list — the
    simulation never materializes zero-demand weeks, because a run of
    g empty weeks only adds g·q_weekly stock (filled/lost/stockout
    unchanged), so the fold jumps demand-to-demand via the gap term
    (x.w − prev_w)·q_weekly. The previous dense-grid formulation
    exploded each part's full [0, span) calendar and joined demand
    back in (6.7M grid rows vs 0.6M demand rows at sf0.1; 11s → ~4s):
    grid size scaled with span, this scales with actual demand rows.
    The fold state per part is 5 longs.
    """
    li = _t(spark, sf_dir, "lineitem")
    monday = F.date_sub(
        F.col("l_shipdate").cast("date"),
        (F.dayofweek(F.col("l_shipdate").cast("date")) + F.lit(5)) % F.lit(7),
    )
    d0 = li.groupBy(
        F.col("l_partkey").alias("partkey"), monday.alias("week_start")
    ).agg(F.sum(F.round("l_quantity").cast("long")).cast("long").alias("qty"))
    g = (
        d0.groupBy("partkey")
        .agg(
            F.min("week_start").alias("w0"),
            F.max("week_start").alias("wmax"),
            F.sum("qty").cast("long").alias("total"),
            F.sort_array(F.collect_list(F.struct("week_start", "qty"))).alias(
                "raw"
            ),
        )
        .withColumn(
            "span", (F.datediff("wmax", "w0") / 7 + 1).cast("long")
        )
        .filter(F.col("span") >= _SIM_MIN_WEEKS)
        .withColumn(
            "q_weekly", F.ceil(F.col("total") * 1.0 / F.col("span")).cast("long")
        )
    )
    # sparse (week-index, demand) pairs; week index is exact integer
    # (Monday-to-Monday datediff is a multiple of 7)
    dems = F.transform(
        F.col("raw"),
        lambda r: F.struct(
            (F.datediff(r["week_start"], F.col("w0")) / 7)
            .cast("long")
            .alias("w"),
            r["qty"].cast("long").alias("dem"),
        ),
    )
    q = F.col("q_weekly")

    def step(acc, x):
        stock1 = acc[0] + (x["w"] - acc[4]) * q  # gap replenishment
        take = F.least(stock1, x["dem"])
        return F.array(
            stock1 - take,
            acc[1] + take,
            acc[2] + x["dem"] - take,
            acc[3] + F.when(x["dem"] > stock1, 1).otherwise(0),
            x["w"],
        )

    fold = F.aggregate(
        dems,
        F.array(
            (F.lit(2) * q).cast("long"),
            F.lit(0).cast("long"),
            F.lit(0).cast("long"),
            F.lit(0).cast("long"),
            F.lit(-1).cast("long"),
        ),
        step,
    )
    return g.select(
        "partkey",
        F.col("span").alias("span_weeks"),
        F.col("total").alias("total_demand"),
        "q_weekly",
        F.element_at(fold, 2).cast("long").alias("filled_units"),
        F.element_at(fold, 3).cast("long").alias("lost_units"),
        F.element_at(fold, 4).cast("long").alias("n_stockout_weeks"),
        F.round(F.element_at(fold, 2) * 1.0 / F.col("total"), 6).alias("fill_rate"),
    )
