"""Round-5 additions, batch 38: Benford first-digit audit — the
forensic-accounting screen (natural multi-magnitude amounts follow
log10(1+1/d); fabricated or clamped data doesn't). Distinct from the
existing drift/KS/chi2 screens: it tests a column against a FIXED
theoretical law rather than against another sample of itself.

Determinism: the first digit comes from the string form of the exact
cents BIGINT (identical rendering in both engines — no float
formatting, no log); expected shares are closed-form literals; the
single deviation statistic is one rounded float over exact counts.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register

# expected Benford share per leading digit, as exact literals shared by
# both engines (12 decimals — far below the comparison's 4dp rounding)
_BENFORD = {d: round(math.log10(1 + 1 / d), 12) for d in range(1, 10)}

_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {_BENFORD[d]:.12f}" for d in range(1, 10)
)

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                     AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM lineitem
  WHERE l_extendedprice > 0
),
counts AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n,
         sum(count(*)) OVER () AS total
  FROM digits GROUP BY digit
)
SELECT digit, n,
       round(n * 1.0 / total, 6) AS observed_share,
       CAST(CASE digit {_BENFORD_CASE} END AS DOUBLE) AS benford_share,
       round(abs(n * 1.0 / total
                 - CAST(CASE digit {_BENFORD_CASE} END AS DOUBLE)), 6)
         AS abs_dev
FROM counts
"""


@register("benford_first_digit_audit", oracle=_BENFORD_ORACLE, tags=("agg", "quality", "stats"))
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of line prices: observed vs theoretical
    first-digit shares with per-digit absolute deviation — the
    fabricated-amounts screen (TPC-H's uniform price generator FAILS
    Benford loudly, which is itself the point: the audit must report
    the deviation honestly, not assume conformity).

    Scale notes: map-only digit extraction from the exact cents
    integer's string form (no float formatting, no log), one
    map-combined fold to ≤9 rows; the grand total is a window over
    those 9 rows, so the fact scans exactly once. This is the
    fixed-law-test shape: the expected distribution is a literal, so
    the query needs no second sample and no second scan.
    """
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    counts = (
        li.select(
            F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("total", F.sum("n").over(Window.partitionBy()))
    )
    expected = F.create_map(
        *[x for d in range(1, 10) for x in (F.lit(d), F.lit(_BENFORD[d]))]
    )[F.col("digit")]
    return counts.select(
        "digit",
        "n",
        F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("observed_share"),
        expected.alias("benford_share"),
        F.round(
            F.abs(F.col("n") * 1.0 / F.col("total") - expected), 6
        ).alias("abs_dev"),
    )
