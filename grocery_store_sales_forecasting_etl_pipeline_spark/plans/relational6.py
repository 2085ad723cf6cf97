"""Relational operator queries, batch 6: full analytic-window surface,
deterministic hash sampling, and time-series gap filling.

- ``analytic_windows``: lead / ntile / percent_rank / cume_dist /
  first_value / last_value — the ranking-and-distribution window
  functions SURVEY.md §2.6 notes the reference lacks but a general
  engine must expose.
- ``hash_sample`` / ``stratified_sample``: reproducible sampling for
  training-data pipelines. ``df.sample()`` is seed-and-partitioning
  dependent (a repartition changes the sample!); hashing the KEY
  (md5 prefix threshold) gives a sample that is stable across engines,
  runs, and cluster layouts, and composes with incremental loads (a
  re-ingested row samples identically).
- ``supplier_gap_fill``: calendar densification + zero/forward fill
  (operators/timeseries.py) — the designed non-lossy alternative to the
  reference's drop-dates-without-oil-quote semantics
  (silver_processing.py.py:74, SURVEY §2.5 note).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grocery_store_sales_forecasting_etl_pipeline_spark.operators import timeseries as TS
from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Analytic window functions
# ---------------------------------------------------------------------------

_ANALYTIC_ORACLE = """
SELECT o_custkey, o_orderkey,
  round(o_totalprice, 2)                        AS price,
  round(lead(o_totalprice) OVER w, 2)           AS next_price,
  CAST(ntile(4) OVER w AS BIGINT)               AS quartile,
  round(percent_rank() OVER w, 6)               AS pct_rank,
  round(cume_dist() OVER w, 6)                  AS cdist,
  first_value(o_orderkey) OVER w                AS first_order,
  last_value(o_orderkey) OVER
    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
FROM orders
WHERE o_custkey < 1100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("analytic_windows", oracle=_ANALYTIC_ORACLE, tags=("window",))
def analytic_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead / ntile / percent_rank / cume_dist / first_value /
    last_value over each customer's order history. The ordering
    (o_orderdate, o_orderkey) is total per partition, so every function
    is tie-free deterministic.

    Scale notes: ONE shuffle on o_custkey serves all six functions —
    same-spec windows collapse into a single Window physical node;
    last_value's unbounded-following frame only changes the frame
    evaluator, not the exchange. The custkey filter pushes to the scan.
    """
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 1100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first_value("o_orderkey").over(w).alias("first_order"),
        F.last_value("o_orderkey").over(w_full).alias("last_order"),
    )


# ---------------------------------------------------------------------------
# Deterministic hash sampling
# ---------------------------------------------------------------------------

_HASH_SAMPLE_ORACLE = """
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
"""


@register("hash_sample", oracle=_HASH_SAMPLE_ORACLE, tags=("sampling",))
def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10.2% (26/256) uniform sample of orders, keyed on
    md5(o_orderkey) prefix. Unlike ``df.sample()``, membership is a pure
    function of the key: stable across runs, engines, partitionings, and
    incremental re-ingestion — the property a training-data holdout
    split actually needs.

    Scale notes: the predicate is a scalar expression inside codegen —
    no shuffle, no RNG state, trivially parallel; at 100 TB the sample
    streams out of the scan.
    """
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a"
    ).select("o_orderkey", F.round("o_totalprice", 2).alias("price"))


_STRATIFIED_ORACLE = """
SELECT lang, count(*) AS n_sampled
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      CASE lang WHEN 'en' THEN '20' ELSE '80' END
GROUP BY lang
"""


@register("stratified_sample", oracle=_STRATIFIED_ORACLE, tags=("sampling",))
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: downweight the majority language
    (en: 32/256 ≈ 12.5%) and keep half of everything else (128/256) —
    the rebalancing move of multilingual corpus construction, as a pure
    key-hash predicate (same determinism argument as hash_sample).
    """
    d = _t(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit("20")).otherwise(F.lit("80"))
    return (
        d.filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < rate)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )


# ---------------------------------------------------------------------------
# Time-series gap fill + forward fill
# ---------------------------------------------------------------------------

_GAP_FILL_ORACLE = """
WITH daily AS (
  SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS day,
         count(*) AS n_items,
         round(max(l_extendedprice), 2) AS max_price
  FROM lineitem WHERE l_suppkey <= 5
  GROUP BY 1, 2
),
span AS (SELECT suppkey, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY suppkey),
cal AS (
  SELECT suppkey, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
)
SELECT c.suppkey, c.day,
       COALESCE(d.n_items, 0) AS n_items,
       last_value(d.max_price IGNORE NULLS) OVER
         (PARTITION BY c.suppkey ORDER BY c.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_price
FROM cal c LEFT JOIN daily d ON c.suppkey = d.suppkey AND c.day = d.day
"""


@register("supplier_gap_fill", oracle=_GAP_FILL_ORACLE, tags=("timeseries",))
def supplier_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per supplier: every calendar day in the
    supplier's own observed span, shipment count zero-filled and the
    last observed max price carried forward
    (operators/timeseries.py:gap_fill). The non-lossy counterpart of
    the reference's na.drop-on-missing-oil-quote semantics.

    Scale notes: each entity's calendar comes from ITS OWN [min,max]
    span via sequence+explode — no global-calendar cross join; the fill
    join and the forward-fill window share the same per-entity
    partitioning, one shuffle each.
    """
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    daily = (
        l.select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("l_shipdate").cast("date").alias("day"),
            "l_extendedprice",
        )
        .groupBy("suppkey", "day")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )
    filled = TS.gap_fill(
        daily,
        entity_cols=("suppkey",),
        date_col="day",
        zero_fill=("n_items",),
        ffill=("max_price",),
    )
    return filled.select(
        "suppkey", "day", F.col("n_items").cast("long").alias("n_items"),
        F.col("max_price").alias("last_price"),
    )
