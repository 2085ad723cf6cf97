"""ML forecasting queries (reference M1-M3 → SURVEY.md §2.11): the
distributed replacements for the reference's driver-side LightGBM.
Model outputs are run-dependent at the margins (tree ensembles), so these
are rows-only checks; training determinism (fixed seed) and prediction
quality are pinned by tests/test_pipeline.py."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational import (
    weekly_lag_features,
)

_FEATURES = ("prev_week_qty", "prev2_week_qty", "mean_last4_weeks", "n_items")
_LABEL = "weekly_qty"


def _feature_matrix_sql() -> str:
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational import (
        _WEEKLY_LAG_ORACLE,
    )

    # addition order matters: both engines sum IEEE doubles left-to-right,
    # so the same textual order gives bit-identical sums (and sqrt is
    # correctly rounded), keeping hash parity without a tolerance
    return f"""
WITH feats AS ({_WEEKLY_LAG_ORACLE})
SELECT
  suppkey, year, week,
  CAST(weekly_qty AS DOUBLE)        AS label,
  CAST(prev_week_qty AS DOUBLE)     AS f_prev_week_qty,
  CAST(prev2_week_qty AS DOUBLE)    AS f_prev2_week_qty,
  CAST(mean_last4_weeks AS DOUBLE)  AS f_mean_last4_weeks,
  CAST(n_items AS DOUBLE)           AS f_n_items,
  round(sqrt(
    CAST(prev_week_qty AS DOUBLE) * CAST(prev_week_qty AS DOUBLE)
    + CAST(prev2_week_qty AS DOUBLE) * CAST(prev2_week_qty AS DOUBLE)
    + CAST(mean_last4_weeks AS DOUBLE) * CAST(mean_last4_weeks AS DOUBLE)
    + CAST(n_items AS DOUBLE) * CAST(n_items AS DOUBLE)
  ), 6) AS feature_l2
FROM feats
WHERE prev_week_qty IS NOT NULL AND prev2_week_qty IS NOT NULL
  AND mean_last4_weeks IS NOT NULL AND n_items IS NOT NULL
"""


@register("forecast_feature_matrix", oracle=_feature_matrix_sql(), tags=("ml", "flagship"))
def forecast_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact model-boundary frame the GBT queries train on: the
    weekly lag-feature pipeline with every assembler input cast to
    double, nulls dropped (what VectorAssembler would reject), and an L2
    norm of the assembled vector as a scalar digest — pinning the full
    feature pipeline up to the (inherently non-SQL) model fit under the
    hash oracle, so the rows-only forecast checks only cover the model
    itself (reference gold_feature.py.py:43-53 casts + assembly).
    """
    feats = weekly_lag_features(spark, sf_dir)
    fcols = [F.col(c).cast("double") for c in _FEATURES]
    l2 = F.round(
        F.sqrt(
            fcols[0] * fcols[0]
            + fcols[1] * fcols[1]
            + fcols[2] * fcols[2]
            + fcols[3] * fcols[3]
        ),
        6,
    )
    return feats.na.drop(subset=list(_FEATURES)).select(
        "suppkey",
        "year",
        "week",
        F.col(_LABEL).cast("double").alias("label"),
        fcols[0].alias("f_prev_week_qty"),
        fcols[1].alias("f_prev2_week_qty"),
        fcols[2].alias("f_mean_last4_weeks"),
        fcols[3].alias("f_n_items"),
        l2.alias("feature_l2"),
    )


@register("forecast_weekly_gbt", oracle=None, tags=("ml",))
def forecast_weekly_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib GBTRegressor over the weekly lag-feature frame — fully
    distributed train + predict (VectorAssembler → GBT →
    model.transform), no driver collect anywhere (contrast reference
    gold_feature.py.py:54). Small maxIter keeps the contract/bench run
    bounded; scale the iterations, not the architecture.
    """
    from grocery_store_sales_forecasting_etl_pipeline_spark.ml.forecast import (
        train_predict_global,
    )

    features = weekly_lag_features(spark, sf_dir)
    out = train_predict_global(
        features,
        feature_cols=_FEATURES,
        label_col=_LABEL,
        max_iter=10,
        max_depth=4,
        # the sf0.1 feature frame is ~29k rows: a few fat partitions beat
        # 32 near-empty tasks × ~50 boosting jobs of scheduler overhead
        train_partitions=4,
    )
    return out.select(
        "suppkey",
        "year",
        "week",
        F.col(_LABEL).alias("actual_qty"),
        F.round("predicted_transactions", 2).alias("predicted_qty"),
    )


@register("forecast_per_group", oracle=None, tags=("ml",))
def forecast_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One model per supplier via ``applyInPandas`` grouped-map (Arrow
    batches; sklearn GBM when present, closed-form ridge otherwise) —
    the per-entity training pattern (SNIPPETS.md [3] shape, original
    implementation).
    """
    from grocery_store_sales_forecasting_etl_pipeline_spark.ml.forecast import (
        train_predict_per_group,
    )

    features = weekly_lag_features(spark, sf_dir)
    out = train_predict_per_group(
        features, group_col="suppkey", feature_cols=_FEATURES, label_col=_LABEL
    )
    return out.select(
        "suppkey",
        "year",
        "week",
        F.col(_LABEL).alias("actual_qty"),
        F.round("predicted_transactions", 2).alias("predicted_qty"),
    )


# ---------------------------------------------------------------------------
# Closed-form forecasting: per-supplier OLS weekly trend (hash-checkable)
# ---------------------------------------------------------------------------

# shared weekly series for the closed-form forecasting family: both the
# OLS trend and the backtest bucket by ISO (year, week) — one definition
# so the series can never silently desynchronize between them
_WEEKLY_QTY_CTE = """WITH weekly AS (
  SELECT l_suppkey AS suppkey,
         CAST(isoyear(CAST(l_shipdate AS DATE)) AS BIGINT) AS yr,
         CAST(weekofyear(CAST(l_shipdate AS DATE)) AS BIGINT) AS wk,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1, 2, 3
),"""


def _weekly_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(supplier, ISO year, ISO week) integer quantity sums — the
    Spark twin of _WEEKLY_QTY_CTE. ISO year + ISO week, never calendar
    year + ISO week: weekofyear is ISO-8601, so late-December dates can
    belong to week 1 of the NEXT iso year (and early-January to week
    52/53 of the previous one) — calendar year() would merge both ends
    of a year into one bucket and misorder the series at every
    boundary. Integer y keeps every downstream sufficient statistic
    exact."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("l_suppkey").alias("suppkey"),
            F.expr(
                "CAST(extract(YEAROFWEEK FROM CAST(l_shipdate AS DATE)) AS BIGINT)"
            ).alias("yr"),
            F.weekofyear(F.col("l_shipdate").cast("date")).cast("long").alias("wk"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .groupBy("suppkey", "yr", "wk")
        .agg(F.sum("qty").cast("long").alias("y"))
    )


_TREND_MIN_WEEKS = 8

_TREND_ORACLE = f"""
{_WEEKLY_QTY_CTE}
xy AS (
  SELECT suppkey, y,
         CAST(row_number() OVER (PARTITION BY suppkey ORDER BY yr, wk) AS BIGINT) AS x
  FROM weekly
),
s AS (
  SELECT suppkey,
         count(*)        AS n,
         sum(x)          AS sx,
         sum(y)          AS sy,
         sum(x * x)      AS sxx,
         sum(x * y)      AS sxy
  FROM xy GROUP BY suppkey
)
SELECT suppkey,
       CAST(n AS BIGINT) AS n_weeks,
       round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6)  AS slope,
       round((sy * sxx - sx * sxy) * 1.0 / (n * sxx - sx * sx), 6) AS intercept,
       round((sy * sxx - sx * sxy) * 1.0 / (n * sxx - sx * sx)
             + (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * (n + 1), 4)
         AS pred_next_week
FROM s
WHERE n >= {_TREND_MIN_WEEKS}
"""


@register("forecast_linear_trend", oracle=_TREND_ORACLE, tags=("ml",))
def forecast_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form forecasting: per-supplier ordinary-least-squares trend
    of weekly shipped quantity, with the next-week extrapolation — the
    hash-checkable member of the forecasting family (GBT's tree
    ensembles are structurally rows-only; a normal-equations fit is
    exact algebra).

    Engine-parity design: x is the 1..n week index (row_number over the
    weekly series) and y an integer quantity sum, so every sufficient
    statistic (n, Σx, Σy, Σx², Σxy) is an EXACT integer — order of
    aggregation cannot perturb them. slope and intercept are single
    IEEE divisions of integer-valued numerators/denominators
    (intercept via the closed form (ΣyΣx² − ΣxΣxy)/(nΣx² − (Σx)²), not
    slope-dependent arithmetic), so both engines round identical
    doubles. Suppliers with < 8 weeks are dropped (denominator
    degeneracy and meaningless fits).

    Scale notes: two shuffles (weekly agg; per-supplier stats) on a
    frame whose size is |suppliers|·|weeks| — tiny relative to lineitem;
    everything else is map-side integer arithmetic in codegen.
    """
    from pyspark.sql import Window

    weekly = _weekly_qty(spark, sf_dir)
    w = Window.partitionBy("suppkey").orderBy("yr", "wk")
    xy = weekly.withColumn("x", F.row_number().over(w).cast("long"))
    s = xy.groupBy("suppkey").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den
    intercept = (sy * sxx - sx * sxy) / den
    return s.filter(n >= _TREND_MIN_WEEKS).select(
        "suppkey",
        n.alias("n_weeks"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(intercept + slope * (n + 1), 4).alias("pred_next_week"),
    )


# ---------------------------------------------------------------------------
# Walk-forward backtest: naive vs seasonal-naive baselines, exact MAE
# ---------------------------------------------------------------------------

_BT_SEASON = 4  # "seasonal" lag in observations (≈ monthly cycle)
_BT_MIN_EVAL = 8

_BACKTEST_ORACLE = f"""
{_WEEKLY_QTY_CTE}
lagged AS (
  SELECT suppkey, y,
         lag(y, 1) OVER (PARTITION BY suppkey ORDER BY yr, wk) AS p1,
         lag(y, {_BT_SEASON}) OVER (PARTITION BY suppkey ORDER BY yr, wk) AS p4
  FROM weekly
),
ev AS (
  SELECT suppkey,
         count(*)           AS n_eval,
         sum(abs(y - p1))   AS ae1,
         sum(y - p1)        AS be1,
         sum(abs(y - p4))   AS ae4
  FROM lagged WHERE p4 IS NOT NULL GROUP BY suppkey
)
SELECT suppkey,
       CAST(n_eval AS BIGINT)              AS n_eval,
       round(ae1 * 1.0 / n_eval, 4)        AS mae_naive,
       round(be1 * 1.0 / n_eval, 4)        AS bias_naive,
       round(ae4 * 1.0 / n_eval, 4)        AS mae_seasonal,
       CASE WHEN ae4 < ae1 THEN 'seasonal' ELSE 'naive' END AS better_model
FROM ev WHERE n_eval >= {_BT_MIN_EVAL}
"""


@register("forecast_backtest_eval", oracle=_BACKTEST_ORACLE, tags=("ml", "window"))
def forecast_backtest_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtest of two forecasting baselines on the weekly
    quantity series: naive (previous observation) and seasonal-naive
    (the observation 4 steps back), scored per supplier with MAE and
    bias plus the winning model — the evaluation harness every
    forecasting deployment runs before trusting a model, and the
    honesty check for the GBT/OLS members of this family.

    Engine-parity design: predictions are lagged INTEGER values, so the
    absolute-error and bias accumulators are exact integer sums immune
    to float-add ordering; each metric is then a single IEEE division.
    MAPE is deliberately absent — a per-row float ratio sum would be
    order-dependent across engines (and undefined at y=0).

    Scale notes: one shuffle builds the weekly frame, and the lag
    window + per-supplier aggregate both key on suppkey, so Catalyst
    reuses the second exchange (window then partial-agg in the same
    stage). Everything downstream of the weekly frame is
    |suppliers|x|weeks| — thousands of times smaller than lineitem.
    """
    from pyspark.sql import Window

    weekly = _weekly_qty(spark, sf_dir)
    w = Window.partitionBy("suppkey").orderBy("yr", "wk")
    lagged = weekly.select(
        "suppkey",
        "y",
        F.lag("y", 1).over(w).alias("p1"),
        F.lag("y", _BT_SEASON).over(w).alias("p4"),
    ).filter(F.col("p4").isNotNull())
    y, p1, p4 = F.col("y"), F.col("p1"), F.col("p4")
    ev = lagged.groupBy("suppkey").agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(F.abs(y - p1)).alias("ae1"),
        F.sum(y - p1).alias("be1"),
        F.sum(F.abs(y - p4)).alias("ae4"),
    )
    return ev.filter(F.col("n_eval") >= _BT_MIN_EVAL).select(
        "suppkey",
        "n_eval",
        F.round(F.col("ae1") / F.col("n_eval"), 4).alias("mae_naive"),
        F.round(F.col("be1") / F.col("n_eval"), 4).alias("bias_naive"),
        F.round(F.col("ae4") / F.col("n_eval"), 4).alias("mae_seasonal"),
        F.when(F.col("ae4") < F.col("ae1"), "seasonal")
        .otherwise("naive")
        .alias("better_model"),
    )


# ---------------------------------------------------------------------------
# Exponential smoothing (EWMA level, exact dyadic fold)
# ---------------------------------------------------------------------------

# alpha = 0.5 EXACTLY: halving is a binary-exponent shift, so every fold
# step performs the identical IEEE ops in any engine, and the only
# rounding is the (deterministic, order-pinned) addition
_EWMA_MIN_WEEKS = 8

_EWMA_ORACLE = f"""
{_WEEKLY_QTY_CTE}
s AS (
  SELECT suppkey,
         count(*) AS n_weeks,
         list_reduce(list(CAST(y AS DOUBLE) ORDER BY yr, wk),
                     (acc, x) -> acc * 0.5 + x * 0.5) AS ewma
  FROM weekly GROUP BY suppkey
)
SELECT suppkey,
       CAST(n_weeks AS BIGINT) AS n_weeks,
       round(ewma, 6)          AS ewma_level
FROM s WHERE n_weeks >= {_EWMA_MIN_WEEKS}
"""


@register("forecast_ewma", oracle=_EWMA_ORACLE, tags=("ml",))
def forecast_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential smoothing per supplier (EWMA level with alpha = 0.5,
    s_1 = x_1, s_t = x_t/2 + s_{t-1}/2) over the weekly quantity
    series — the classic one-number forecast (next week = current
    level) completing the family: naive/seasonal-naive (backtest), OLS
    trend, EWMA, GBT.

    Engine-parity design: EWMA is a SEQUENTIAL recurrence, the one
    shape distributed sums can't reorder — so each supplier's series is
    assembled into an ordered array (sort_array over the collected
    (yr, wk, y) structs) and folded left with ``F.aggregate``, exactly
    mirroring the oracle's ``list_reduce`` over ``list(... ORDER BY)``.
    alpha = 0.5 makes each multiply a pure exponent shift; the fold's
    additions are the only rounding and both engines perform them in
    the identical pinned order.

    Scale notes: one shuffle to group each supplier's series; the array
    per group is |weeks| (hundreds), the standard escape hatch for
    per-entity sequential recurrences — memory per group is bounded by
    series length, never corpus size, and suppliers parallelize freely.
    """
    weekly = _weekly_qty(spark, sf_dir)
    s = weekly.groupBy("suppkey").agg(
        F.count("*").cast("long").alias("n_weeks"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("yr", "wk", "y"))),
            lambda r: r["y"].cast("double"),
        ).alias("ys"),
    )
    ewma = F.aggregate(
        F.slice(F.col("ys"), 2, F.size("ys") - 1),
        F.element_at("ys", 1),
        lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
    )
    return s.filter(F.col("n_weeks") >= _EWMA_MIN_WEEKS).select(
        "suppkey",
        "n_weeks",
        F.round(ewma, 6).alias("ewma_level"),
    )


# ---------------------------------------------------------------------------
# Holt linear trend (double exponential smoothing, exact dyadic fold)
# ---------------------------------------------------------------------------

# alpha = beta = 0.5: every multiply is a binary-exponent shift, so both
# engines perform the identical IEEE additions in the identical pinned
# order (same design as forecast_ewma). Init: l = x2, b = x2 - x1, fold
# from x3. DuckDB list_reduce has no init argument, so the init state is
# PREPENDED as the first element of a list-of-[value, ignored] pairs —
# its first "element" IS the accumulator.
_HOLT_MIN_WEEKS = 8

_HOLT_ORACLE = f"""
{_WEEKLY_QTY_CTE}
s AS (
  SELECT suppkey,
         count(*) AS n_weeks,
         list(CAST(y AS DOUBLE) ORDER BY yr, wk) AS ys
  FROM weekly GROUP BY suppkey
),
f AS (
  SELECT suppkey, n_weeks,
         list_reduce(
           list_prepend(
             list_value(ys[2], ys[2] - ys[1]),
             list_transform(ys[3:], x -> list_value(x, 0.0))
           ),
           (acc, x) -> list_value(
             x[1] * 0.5 + (acc[1] + acc[2]) * 0.5,
             (x[1] * 0.5 + (acc[1] + acc[2]) * 0.5 - acc[1]) * 0.5
               + acc[2] * 0.5
           )
         ) AS st
  FROM s WHERE n_weeks >= {_HOLT_MIN_WEEKS}
)
SELECT suppkey,
       CAST(n_weeks AS BIGINT)   AS n_weeks,
       round(st[1], 6)           AS holt_level,
       round(st[2], 6)           AS holt_trend,
       round(st[1] + st[2], 6)   AS holt_forecast
FROM f
"""


@register("forecast_holt_linear", oracle=_HOLT_ORACLE, tags=("ml",))
def forecast_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per supplier
    (alpha = beta = 0.5) over the weekly quantity series: level AND
    trend states, one-step-ahead forecast = level + trend — the
    trend-aware sibling of ``forecast_ewma`` completing the classical
    smoothing family (naive/seasonal-naive, OLS trend, EWMA, Holt,
    GBT).

    Engine-parity design: the recurrence folds left over the ordered
    series with a TWO-ELEMENT array state ([level, trend]) in
    ``F.aggregate``; the oracle reproduces it with ``list_reduce`` over
    a list whose prepended first element is the init state (DuckDB's
    reduce takes no init argument). alpha = beta = 0.5 makes every
    multiply an exponent shift, so the only rounding is the pinned
    -order additions — bit-exact across engines, like forecast_ewma.

    Scale notes: one shuffle groups each supplier's series; state per
    group is |weeks| doubles (the per-entity sequential-recurrence
    escape hatch — bounded by series length, never corpus size).
    """
    weekly = _weekly_qty(spark, sf_dir)
    s = weekly.groupBy("suppkey").agg(
        F.count("*").cast("long").alias("n_weeks"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("yr", "wk", "y"))),
            lambda r: r["y"].cast("double"),
        ).alias("ys"),
    ).filter(F.col("n_weeks") >= _HOLT_MIN_WEEKS)
    x1 = F.element_at("ys", 1)
    x2 = F.element_at("ys", 2)

    def step(acc, x):
        new_level = x * F.lit(0.5) + (acc[0] + acc[1]) * F.lit(0.5)
        new_trend = (
            x * F.lit(0.5) + (acc[0] + acc[1]) * F.lit(0.5) - acc[0]
        ) * F.lit(0.5) + acc[1] * F.lit(0.5)
        return F.array(new_level, new_trend)

    st = F.aggregate(
        F.slice(F.col("ys"), 3, F.size("ys") - 2),
        F.array(x2, x2 - x1),
        step,
    )
    return s.select(
        "suppkey",
        "n_weeks",
        F.round(st[0], 6).alias("holt_level"),
        F.round(st[1], 6).alias("holt_trend"),
        F.round(st[0] + st[1], 6).alias("holt_forecast"),
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing
# ---------------------------------------------------------------------------

_HW_SEASON = 4  # weekly series, ~monthly seasonal cycle
_HW_MIN_WEEKS = 12  # >= 3 full seasons

# The recurrence state is the (2 + m)-element array
# [level, trend, s_next, s_next+1, ..., s_next+m-1]; each step consumes
# the head seasonal and rotates the updated one to the back. The level
# expression is inlined (lambdas bind no intermediates) with IDENTICAL
# text in both engines; alpha = beta = gamma = 0.5 keeps every multiply
# an exponent shift so only the pinned-order additions round.
_HW_L_SQL = "((x[1] - acc[3]) * 0.5 + (acc[1] + acc[2]) * 0.5)"

_HW_ORACLE = f"""
{_WEEKLY_QTY_CTE}
s AS (
  SELECT suppkey,
         count(*) AS n_weeks,
         list(CAST(y AS DOUBLE) ORDER BY yr, wk) AS ys
  FROM weekly GROUP BY suppkey
),
i AS (
  SELECT suppkey, n_weeks, ys,
         (ys[1] + ys[2] + ys[3] + ys[4]) / 4.0 AS m0
  FROM s WHERE n_weeks >= {_HW_MIN_WEEKS}
),
f AS (
  SELECT suppkey, n_weeks,
         list_reduce(
           list_prepend(
             list_value(m0, 0.0, ys[1] - m0, ys[2] - m0, ys[3] - m0, ys[4] - m0),
             list_transform(ys[{_HW_SEASON + 1}:], x -> list_value(x))
           ),
           (acc, x) -> list_concat(
             list_value(
               {_HW_L_SQL},
               (({_HW_L_SQL}) - acc[1]) * 0.5 + acc[2] * 0.5
             ),
             list_concat(
               acc[4:{_HW_SEASON + 2}],
               list_value((x[1] - ({_HW_L_SQL})) * 0.5 + acc[3] * 0.5)
             )
           )
         ) AS st
  FROM i
)
SELECT suppkey,
       CAST(n_weeks AS BIGINT)        AS n_weeks,
       round(st[1], 6)                AS hw_level,
       round(st[2], 6)                AS hw_trend,
       round(st[3], 6)                AS hw_seasonal_next,
       round(st[1] + st[2] + st[3], 6) AS hw_forecast
FROM f
"""


@register("forecast_holt_winters", oracle=_HW_ORACLE, tags=("ml",))
def forecast_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing per supplier
    (alpha = beta = gamma = 0.5, season length 4) over the weekly
    quantity series: level, trend, AND a rotating seasonal vector —
    the seasonality-aware completion of the smoothing family
    (EWMA -> Holt -> Holt-Winters), i.e. the model the repo is named
    for. Initialization: level = mean of the first season, trend 0,
    seasonals = first-season deviations; one-step forecast =
    level + trend + next seasonal.

    Engine-parity design: the fold state is a 6-element array
    [level, trend, s1..s4] rotated each step inside ``F.aggregate``;
    the oracle replays it with ``list_reduce`` over an init-prepended
    list (the forecast_holt_linear scaffolding). The inlined level
    expression uses identical text in both engines, and the 0.5
    coefficients make every multiply exact — only the pinned-order
    additions round, so results are bit-identical like EWMA/Holt.

    Scale notes: one shuffle groups each supplier's series; per-group
    state is |weeks| doubles plus a season-length array — the
    per-entity sequential-recurrence escape hatch, bounded by series
    length, never corpus size.
    """
    weekly = _weekly_qty(spark, sf_dir)
    s = (
        weekly.groupBy("suppkey")
        .agg(
            F.count("*").cast("long").alias("n_weeks"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("yr", "wk", "y"))),
                lambda r: r["y"].cast("double"),
            ).alias("ys"),
        )
        .filter(F.col("n_weeks") >= _HW_MIN_WEEKS)
        .withColumn(
            "m0",
            (
                F.element_at("ys", 1)
                + F.element_at("ys", 2)
                + F.element_at("ys", 3)
                + F.element_at("ys", 4)
            )
            / F.lit(4.0),
        )
    )

    def step(acc, x):
        # identical op order to _HW_L_SQL (acc is 0-based here)
        lev = (x - acc[2]) * F.lit(0.5) + (acc[0] + acc[1]) * F.lit(0.5)
        trend = (
            ((x - acc[2]) * F.lit(0.5) + (acc[0] + acc[1]) * F.lit(0.5)) - acc[0]
        ) * F.lit(0.5) + acc[1] * F.lit(0.5)
        snew = (
            x - ((x - acc[2]) * F.lit(0.5) + (acc[0] + acc[1]) * F.lit(0.5))
        ) * F.lit(0.5) + acc[2] * F.lit(0.5)
        return F.concat(
            F.array(lev, trend),
            F.slice(acc, 4, _HW_SEASON - 1),
            F.array(snew),
        )

    m0 = F.col("m0")
    init = F.array(
        m0,
        F.lit(0.0),
        F.element_at("ys", 1) - m0,
        F.element_at("ys", 2) - m0,
        F.element_at("ys", 3) - m0,
        F.element_at("ys", 4) - m0,
    )
    st = F.aggregate(
        F.slice(F.col("ys"), _HW_SEASON + 1, F.size("ys") - _HW_SEASON),
        init,
        step,
    )
    return s.select(
        "suppkey",
        "n_weeks",
        F.round(st[0], 6).alias("hw_level"),
        F.round(st[1], 6).alias("hw_trend"),
        F.round(st[2], 6).alias("hw_seasonal_next"),
        F.round(st[0] + st[1] + st[2], 6).alias("hw_forecast"),
    )
