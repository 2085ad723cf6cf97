"""Round-6 additions, batch 59: forecast-evaluation and distribution
-shape closures — the naive-baseline scorecard (MAE/RMSE/MASE for
naive, seasonal-naive and drift one-step forecasts: the bar every
model in the forecast family must clear, and MASE is the
scale-free way to say so), the Hurst exponent via rescaled-range
analysis (is weekly revenue mean-reverting, random, or trending at
the process level), Lorenz-curve deciles (the full concentration
curve behind the nation_spend_gini single number), and a price-ending
audit (the .99 pricing-convention fingerprint).

Determinism discipline: all series values are exact cents; block
R/S statistics derive from within-block prefix sums of integers;
MASE/RMSE/slope trees are textually identical; ntile deciles use the
(spend, custkey) total order; endings are pure integer mod.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational15 import (
    _WEEKLY_CTE,
    _weekly_dollars,
)

# ---------------------------------------------------------------------------
# Naive-baseline forecast scorecard (MAE / RMSE / MASE)
# ---------------------------------------------------------------------------

_BASELINES_ORACLE = _WEEKLY_CTE + """,
led AS (
  SELECT dollars AS y,
         CAST(row_number() OVER (ORDER BY week_start) AS BIGINT) AS t,
         lag(dollars, 1) OVER (ORDER BY week_start) AS y1,
         lag(dollars, 4) OVER (ORDER BY week_start) AS y4,
         first_value(dollars) OVER (ORDER BY week_start) AS y_first
  FROM weekly
),
ev AS (
  SELECT t, y, y1, y4,
         CAST(y1 AS DOUBLE)
           + (CAST(y1 AS DOUBLE) - y_first) / (t - 2) AS drift_pred
  FROM led WHERE t >= 5
),
errs AS (
  SELECT 'naive' AS method, CAST(abs(y - y1) AS DOUBLE) AS ae,
         CAST(y - y1 AS DOUBLE) * (y - y1) AS se
  FROM ev
  UNION ALL
  SELECT 'seasonal_naive_4', CAST(abs(y - y4) AS DOUBLE),
         CAST(y - y4 AS DOUBLE) * (y - y4)
  FROM ev
  UNION ALL
  SELECT 'drift', abs(y - drift_pred),
         (y - drift_pred) * (y - drift_pred)
  FROM ev
),
sc AS (
  SELECT method, CAST(count(*) AS BIGINT) AS n_evals,
         sum(ae) / count(*) AS mae,
         sqrt(sum(se) / count(*)) AS rmse
  FROM errs GROUP BY method
)
SELECT method, n_evals,
       round(mae, 4) AS mae,
       round(rmse, 4) AS rmse,
       round(mae / max(CASE WHEN method = 'naive' THEN mae END) OVER (), 6)
         AS mase_vs_naive
FROM sc
"""


@register(
    "weekly_forecast_baselines", oracle=_BASELINES_ORACLE, tags=("timeseries", "ml-eval")
)
def weekly_forecast_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The naive-baseline forecast scorecard over weekly revenue:
    one-step-ahead errors for the naive (last value), seasonal-naive
    (4 weeks back) and drift (last value + average historical slope)
    forecasts, each scored by MAE, RMSE and MASE (MAE relative to the
    naive's MAE — the scale-free Hyndman standard). Any model in the
    forecast family (Holt, Holt-Winters, GBT) that cannot beat
    mase < 1 is not forecasting, it's decorating — this query is the
    bar.

    Numerics: predictions and errors derive from exact integer weekly
    dollars (drift is one double tree); the per-method folds sum
    doubles under the documented noise-vs-4dp bound; MASE divides two
    folded MAEs via a window over the 3-row method frame.

    Scale notes: one fact fold to the weekly frame, one lag/lead
    window pass, a 3-method map-only explode, and a 3-row fold.
    """
    weekly = _weekly_dollars(spark, sf_dir)
    w = Window.orderBy("week_start")
    led = weekly.select(
        F.col("dollars").alias("y"),
        F.row_number().over(w).cast("long").alias("t"),
        F.lag("dollars", 1).over(w).alias("y1"),
        F.lag("dollars", 4).over(w).alias("y4"),
        F.first("dollars").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("y_first"),
    )
    ev = led.filter(F.col("t") >= 5).select(
        "t",
        "y",
        "y1",
        "y4",
        (
            F.col("y1").cast("double")
            + (F.col("y1").cast("double") - F.col("y_first")) / (F.col("t") - 2)
        ).alias("drift_pred"),
    )
    errs = ev.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("naive").alias("method"),
                    F.abs(F.col("y") - F.col("y1")).cast("double").alias("ae"),
                    (
                        (F.col("y") - F.col("y1")).cast("double")
                        * (F.col("y") - F.col("y1"))
                    ).alias("se"),
                ),
                F.struct(
                    F.lit("seasonal_naive_4").alias("method"),
                    F.abs(F.col("y") - F.col("y4")).cast("double").alias("ae"),
                    (
                        (F.col("y") - F.col("y4")).cast("double")
                        * (F.col("y") - F.col("y4"))
                    ).alias("se"),
                ),
                F.struct(
                    F.lit("drift").alias("method"),
                    F.abs(F.col("y") - F.col("drift_pred")).alias("ae"),
                    (
                        (F.col("y") - F.col("drift_pred"))
                        * (F.col("y") - F.col("drift_pred"))
                    ).alias("se"),
                ),
            )
        ).alias("e")
    ).select("e.method", "e.ae", "e.se")
    sc = errs.groupBy("method").agg(
        F.count("*").cast("long").alias("n_evals"),
        (F.sum("ae") / F.count("*")).alias("mae"),
        F.sqrt(F.sum("se") / F.count("*")).alias("rmse"),
    )
    w_all = Window.partitionBy()
    return sc.select(
        "method",
        "n_evals",
        F.round(F.col("mae"), 4).alias("mae"),
        F.round(F.col("rmse"), 4).alias("rmse"),
        F.round(
            F.col("mae")
            / F.max(
                F.when(F.col("method") == "naive", F.col("mae"))
            ).over(w_all),
            6,
        ).alias("mase_vs_naive"),
    )


# ---------------------------------------------------------------------------
# Hurst exponent (rescaled-range analysis)
# ---------------------------------------------------------------------------

_HURST_ORACLE = _WEEKLY_CTE + """,
idx AS (
  SELECT dollars AS y,
         CAST(row_number() OVER (ORDER BY week_start) AS BIGINT) AS t,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM weekly
),
sizes AS (SELECT unnest([8, 16, 32, 64]) AS s),
cells AS (
  SELECT sz.s, (i.t - 1) // sz.s AS blk,
         CAST(((i.t - 1) % sz.s) + 1 AS BIGINT) AS pos,
         i.y
  FROM idx i CROSS JOIN sizes sz
  WHERE i.t <= sz.s * (i.n // sz.s)
),
blocks AS (
  SELECT s, blk, pos, y,
         CAST(sum(y) OVER (PARTITION BY s, blk ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
           AS ps,
         CAST(sum(y) OVER (PARTITION BY s, blk) AS HUGEINT) AS s_all,
         CAST(sum(CAST(y AS HUGEINT) * y) OVER (PARTITION BY s, blk)
              AS HUGEINT) AS q_all
  FROM cells
),
dev AS (
  SELECT s, blk, s_all, q_all,
         CAST(ps AS DOUBLE) - pos * (CAST(s_all AS DOUBLE) / s) AS cumdev
  FROM blocks
),
rs AS (
  SELECT s, blk,
         (max(cumdev) - min(cumdev))
           / sqrt(CAST(any_value(q_all) AS DOUBLE) / s
                  - (CAST(any_value(s_all) AS DOUBLE) / s)
                    * (CAST(any_value(s_all) AS DOUBLE) / s)) AS rs
  FROM dev GROUP BY s, blk
),
per_size AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n_blocks,
         sum(rs) / count(*) AS avg_rs
  FROM rs GROUP BY s
),
fitpts AS (
  SELECT s, n_blocks, avg_rs, ln(s) AS x, ln(avg_rs) AS yv,
         count(*) OVER () AS k,
         sum(ln(s)) OVER () AS sx,
         sum(ln(avg_rs)) OVER () AS sy,
         sum(ln(s) * ln(avg_rs)) OVER () AS sxy,
         sum(ln(s) * ln(s)) OVER () AS sxx
  FROM per_size
)
SELECT s AS block_size, n_blocks,
       round(avg_rs, 6) AS avg_rescaled_range,
       round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS hurst_exponent
FROM fitpts
"""


@register("weekly_revenue_hurst", oracle=_HURST_ORACLE, tags=("timeseries", "stats"))
def weekly_revenue_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of weekly revenue by classical rescaled-range
    analysis: the series splits into blocks of 8/16/32/64 weeks, each
    block's range of cumulative mean-deviations is rescaled by its
    population std, and H is the log-log slope of the average R/S
    against block size. H ≈ 0.5 is a random walk, H > 0.5 trending
    (shocks persist), H < 0.5 mean-reverting — the process-level
    diagnostic that says whether trend-following forecasts can work
    AT ALL on this series.

    Numerics: block prefix sums and moments are HUGEINT/DECIMAL over
    exact integer dollars; cumdev/R/S/slope are identical double
    trees; ln is the documented libm exception; one 6dp rounding.

    Scale notes: one fact fold to the weekly frame; the block fan-out
    is a map-only cross with a 4-literal array; all windows run over
    the calendar-bounded (size, block) cells (~700 rows).
    """
    weekly = _weekly_dollars(spark, sf_dir)
    d38 = "decimal(38,0)"
    idx = weekly.select(
        F.col("dollars").alias("y"),
        F.row_number().over(Window.orderBy("week_start")).cast("long").alias("t"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    )
    cells = (
        idx.select(
            F.explode(F.array(*[F.lit(s).cast("long") for s in (8, 16, 32, 64)])).alias(
                "s"
            ),
            "t",
            "n",
            "y",
        )
        .filter(F.col("t") <= F.col("s") * F.floor(F.col("n") / F.col("s")))
        .select(
            "s",
            F.floor((F.col("t") - 1) / F.col("s")).cast("long").alias("blk"),
            (((F.col("t") - 1) % F.col("s")) + 1).cast("long").alias("pos"),
            "y",
        )
    )
    w_cum = (
        Window.partitionBy("s", "blk")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_blk = Window.partitionBy("s", "blk")
    blocks = cells.select(
        "s",
        "blk",
        "pos",
        "y",
        F.sum(F.col("y").cast(d38)).over(w_cum).alias("ps"),
        F.sum(F.col("y").cast(d38)).over(w_blk).alias("s_all"),
        F.sum(F.col("y").cast(d38) * F.col("y")).over(w_blk).alias("q_all"),
    )
    dev = blocks.select(
        "s",
        "blk",
        "s_all",
        "q_all",
        (
            F.col("ps").cast("double")
            - F.col("pos") * (F.col("s_all").cast("double") / F.col("s"))
        ).alias("cumdev"),
    )
    rs = dev.groupBy("s", "blk").agg(
        (
            (F.max("cumdev") - F.min("cumdev"))
            / F.sqrt(
                F.first("q_all").cast("double") / F.col("s")
                - (F.first("s_all").cast("double") / F.col("s"))
                * (F.first("s_all").cast("double") / F.col("s"))
            )
        ).alias("rs")
    )
    per_size = rs.groupBy("s").agg(
        F.count("*").cast("long").alias("n_blocks"),
        (F.sum("rs") / F.count("*")).alias("avg_rs"),
    )
    w_all = Window.partitionBy()
    fit = per_size.select(
        "s",
        "n_blocks",
        "avg_rs",
        F.count("*").over(w_all).alias("k"),
        F.sum(F.log("s")).over(w_all).alias("sx"),
        F.sum(F.log("avg_rs")).over(w_all).alias("sy"),
        F.sum(F.log("s") * F.log("avg_rs")).over(w_all).alias("sxy"),
        F.sum(F.log("s") * F.log("s")).over(w_all).alias("sxx"),
    )
    return fit.select(
        F.col("s").alias("block_size"),
        "n_blocks",
        F.round(F.col("avg_rs"), 6).alias("avg_rescaled_range"),
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("hurst_exponent"),
    )


# ---------------------------------------------------------------------------
# Lorenz-curve deciles
# ---------------------------------------------------------------------------

_LORENZ_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
dec AS (
  SELECT cents,
         ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
  FROM spend
),
per AS (
  SELECT decile,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(cents) AS HUGEINT) AS rev
  FROM dec GROUP BY decile
)
SELECT decile, n_customers,
       CAST(rev AS BIGINT) AS revenue_cents,
       round(CAST(sum(rev) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(sum(rev) OVER () AS DOUBLE), 6) AS cum_revenue_share,
       round(decile / 10.0
             - CAST(sum(rev) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST(sum(rev) OVER () AS DOUBLE), 6) AS lorenz_gap
FROM per
"""


@register("revenue_lorenz_deciles", oracle=_LORENZ_ORACLE, tags=("stats", "window"))
def revenue_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve of customer spend at decile resolution:
    customers sorted poorest-first, cumulative revenue share per
    decile, and the gap below the equality diagonal — the full
    concentration CURVE behind the nation_spend_gini scalar (the gini
    is twice the area of this gap; the curve says WHERE the
    concentration lives: a whale top-decile vs a thin long tail).

    Scale notes: one customer-grain fold, then the exact-decile global
    NTILE over the customer frame (dimension-sized — the documented
    total-order cost), then a 10-row cumulative window. Revenue sums
    carry HUGEINT/DECIMAL headroom.
    """
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    dec = spend.select(
        "cents",
        F.ntile(10).over(Window.orderBy("cents", "o_custkey")).alias("decile"),
    )
    d38 = "decimal(38,0)"
    per = dec.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum(F.col("cents").cast(d38)).alias("rev"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    share = F.sum("rev").over(w_cum).cast("double") / F.sum("rev").over(
        w_all
    ).cast("double")
    return per.select(
        "decile",
        "n_customers",
        F.col("rev").cast("long").alias("revenue_cents"),
        F.round(share, 6).alias("cum_revenue_share"),
        F.round(F.col("decile") / 10.0 - share, 6).alias("lorenz_gap"),
    )


# ---------------------------------------------------------------------------
# Price-ending audit
# ---------------------------------------------------------------------------

_ENDING_ORACLE = """
WITH e AS (
  SELECT CAST(round(p_retailprice * 100) AS BIGINT) % 100 AS ending
  FROM part
),
per AS (
  SELECT ending, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY ending
),
rk AS (
  SELECT ending, n,
         CAST(row_number() OVER (ORDER BY n DESC, ending) AS BIGINT) AS rnk,
         CAST(sum(n) OVER () AS BIGINT) AS tot
  FROM per
)
SELECT ending, n, rnk,
       round(CAST(n AS DOUBLE) / tot, 6) AS share,
       round(CAST(sum(CASE WHEN ending % 10 = 9 THEN n ELSE 0 END) OVER ()
                  AS DOUBLE) / tot, 6) AS nine_ending_share
FROM rk WHERE rnk <= 10
"""


@register("price_ending_audit", oracle=_ENDING_ORACLE, tags=("profiling", "agg"))
def price_ending_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-ending fingerprint of the part catalog: the top-10 cent
    endings (price mod 100) with shares, plus the total share of
    9-ending prices — the psychological-pricing convention audit. A
    catalog priced by humans shows .99/.95 spikes; a uniform
    distribution (as here) says prices are synthetic or
    algorithmically set — either way the audit characterizes the
    pricing process behind the data.

    Scale notes: a map-only integer mod, a <= 100-row fold, window
    totals on that frame. Nothing is row-grain past the fold.
    """
    p = _t(spark, sf_dir, "part")
    e = p.select(
        (F.round(F.col("p_retailprice") * 100).cast("long") % 100).alias("ending")
    )
    per = e.groupBy("ending").agg(F.count("*").cast("long").alias("n"))
    w_rk = Window.orderBy(F.desc("n"), F.asc("ending"))
    w_all = Window.partitionBy()
    rk = per.select(
        "ending",
        "n",
        F.row_number().over(w_rk).cast("long").alias("rnk"),
        F.sum("n").over(w_all).cast("long").alias("tot"),
        F.sum(F.when(F.col("ending") % 10 == 9, F.col("n")).otherwise(0))
        .over(w_all)
        .cast("long")
        .alias("nines"),
    )
    return rk.filter(F.col("rnk") <= 10).select(
        "ending",
        "n",
        "rnk",
        F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("share"),
        F.round(F.col("nines").cast("double") / F.col("tot"), 6).alias(
            "nine_ending_share"
        ),
    )
