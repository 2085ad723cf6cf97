"""Round-5 additions, batch 37: one-way ANOVA — the last missing leg
of the statistics family (chi-square tests categorical×categorical,
the KS test tests one numeric distribution against another; ANOVA
tests a numeric column ACROSS k groups: does mean line price differ
by return flag?).

Everything reduces to sufficient statistics (n_g, Σx, Σx²) in exact
integers: cents² crosses the BIGINT ceiling at fact scale (1.1e14 per
row × 6e8 rows ≈ 7e22), so the squared term accumulates in
DECIMAL(38,0) on the Spark side and HUGEINT (native sum(BIGINT)) in
DuckDB — the ANSI-overflow pattern from BASELINE.md. Doubles appear
only in the final closed-form F expression, written token-for-token
identically in both engines over the same exact integers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register

_ANOVA_ORACLE = """
WITH g AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS s_g,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS q_g
  FROM lineitem GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n_g) AS BIGINT) AS n,
         CAST(sum(s_g) AS DOUBLE) AS s,
         CAST(sum(q_g) AS DOUBLE) AS q,
         sum(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g) AS sb_part
  FROM g
)
SELECT k AS n_groups, n AS n_rows,
       round((sb_part - s * s / n) / 10000.0, 2) AS ss_between,
       round((q - sb_part) / 10000.0, 2) AS ss_within,
       round(((sb_part - s * s / n) / (k - 1))
             / ((q - sb_part) / (n - k)), 4) AS f_stat,
       CAST(k - 1 AS BIGINT) AS dof_between,
       CAST(n - k AS BIGINT) AS dof_within
FROM tot
"""


@register("returnflag_price_anova", oracle=_ANOVA_ORACLE, tags=("agg", "stats"))
def returnflag_price_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean line price differ across return
    flags? Emits the F statistic with its two degrees of freedom and
    the between/within sums of squares (reported in dollars²,
    /10000 from cents²) — compare F against the critical value for
    (k-1, n-k).

    Scale notes: ONE fact scan folds to k=|returnflag| sufficient-
    statistic rows with map-side partials; the cents² term sums in
    DECIMAL(38,0) (a LONG sum crosses 9.2e18 at ~8e4 rows of max-price
    lines — the ANSI-overflow trap, crash not wraparound). The final
    fold and the F expression run over k rows. This is the pattern
    for ANY moment-based statistic at 100 TB: exact integer moments,
    one float expression at the boundary.
    """
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    g = li.select(
        "l_returnflag", cents.alias("c"), (cents * cents).cast("decimal(38,0)").alias("c2")
    ).groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("c").cast("long").alias("s_g"),
        F.sum("c2").alias("q_g"),
    )
    tot = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("double").alias("s"),
        F.sum("q_g").cast("double").alias("q"),
        F.sum(F.col("s_g").cast("double") * F.col("s_g").cast("double") / F.col("n_g")).alias(
            "sb_part"
        ),
    )
    ssb = F.col("sb_part") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("sb_part")
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("n").alias("n_rows"),
        F.round(ssb / 10000.0, 2).alias("ss_between"),
        F.round(ssw / 10000.0, 2).alias("ss_within"),
        F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 4).alias(
            "f_stat"
        ),
        (F.col("k") - 1).cast("long").alias("dof_between"),
        (F.col("n") - F.col("k")).cast("long").alias("dof_within"),
    )
