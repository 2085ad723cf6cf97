"""Round-5 additions, batch 32: line-number contiguity and
name-vs-key consistency — two ingestion-integrity audits over columns
the registry hadn't exercised (l_linenumber, the entity name strings).

Contiguity is the classic child-table check (are a parent's children
numbered 1..n exactly once each?); name/key consistency catches the
ETL bug where a denormalized display string drifts from its surrogate
key. Both report aggregate evidence (never empty) rather than raw
violation rows, so the contract can hash them at any data quality.

Determinism: categories from exact integer min/max/count comparisons;
parsed keys via the same regex class in both engines; outputs are
counts plus deterministic example keys (min).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Order line-number contiguity audit
# ---------------------------------------------------------------------------

_CONTIG_ORACLE = """
WITH g AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(count(DISTINCT l_linenumber) AS BIGINT) AS n_distinct,
         CAST(min(l_linenumber) AS BIGINT) AS mn,
         CAST(max(l_linenumber) AS BIGINT) AS mx
  FROM lineitem GROUP BY l_orderkey
),
c AS (
  SELECT l_orderkey, n_lines,
         CASE WHEN n_distinct < n_lines THEN 'duplicated'
              WHEN mn = 1 AND mx = n_lines THEN 'contiguous'
              ELSE 'gapped' END AS category
  FROM g
)
SELECT category,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(n_lines) AS BIGINT) AS n_lines,
       CAST(min(l_orderkey) AS BIGINT) AS example_orderkey
FROM c GROUP BY category
"""


@register("order_lines_contiguity_audit", oracle=_CONTIG_ORACLE, tags=("agg", "quality"))
def order_lines_contiguity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Child-table integrity: are an order's line numbers exactly
    1..n, each once? Orders classify as contiguous, gapped (distinct
    but holes or offset), or duplicated (a line number repeats — the
    worst case, double-counted quantity); each class reports order and
    line counts plus a deterministic example key.

    Scale notes: the distinct-count is a BITMASK aggregate, not
    countDistinct — line numbers are a small-domain sequence (1..7
    here; guarded to [0,62]), so ``bit_count(bit_or(1 << ln))`` gives
    the exact distinct count as a plain aggregate. countDistinct
    planned through planAggregateWithOneDistinct, whose partial phase
    keys by (orderkey, linenumber) — the fact shuffles nearly
    unreduced; the bitmask form combines map-side to one row per
    order before the single exchange (paired in-session A/B at sf10,
    alternating runs: 8.0s vs 12.3s median). Out-of-domain line
    numbers raise loudly instead of wrapping the shift. The classification is a map-only CASE and
    the rollup is 3 rows. This is the audit shape for ANY
    parent/child sequence column with a bounded domain; beyond 63
    values, fall back to countDistinct or a bitmap sketch.
    """
    li = _t(spark, sf_dir, "lineitem")
    # SQL form: the Python shiftleft() wrapper only takes a literal
    # shift, but the underlying expression shifts by a column.
    mask_row = F.expr(
        "shiftleft(CAST(1 AS BIGINT), "
        "CASE WHEN l_linenumber BETWEEN 0 AND 62 THEN l_linenumber "
        "ELSE CAST(raise_error(concat("
        "'order_lines_contiguity_audit: l_linenumber outside [0,62]: ', "
        "CAST(l_linenumber AS STRING))) AS INT) END)"
    )
    g = li.groupBy("l_orderkey").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.bit_count(F.bit_or(mask_row)).cast("long").alias("n_distinct"),
        F.min("l_linenumber").cast("long").alias("mn"),
        F.max("l_linenumber").cast("long").alias("mx"),
    )
    c = g.select(
        "l_orderkey",
        "n_lines",
        F.when(F.col("n_distinct") < F.col("n_lines"), F.lit("duplicated"))
        .when((F.col("mn") == 1) & (F.col("mx") == F.col("n_lines")), F.lit("contiguous"))
        .otherwise(F.lit("gapped"))
        .alias("category"),
    )
    return c.groupBy("category").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("n_lines").cast("long").alias("n_lines"),
        F.min("l_orderkey").cast("long").alias("example_orderkey"),
    )


# ---------------------------------------------------------------------------
# Name vs surrogate-key consistency audit
# ---------------------------------------------------------------------------

_NAMEKEY_ORACLE = """
WITH c AS (
  SELECT 'customer' AS entity, c_custkey AS key,
         TRY_CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS parsed
  FROM customer
  UNION ALL
  SELECT 'supplier', s_suppkey,
         TRY_CAST(regexp_extract(s_name, '([0-9]+)$', 1) AS BIGINT)
  FROM supplier
)
SELECT entity,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN parsed IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unparsed,
       CAST(sum(CASE WHEN parsed = key THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       CAST(sum(CASE WHEN parsed IS NOT NULL AND parsed <> key THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mismatch,
       CAST(min(CASE WHEN parsed IS NOT NULL AND parsed <> key THEN key END)
            AS BIGINT) AS example_mismatch_key
FROM c GROUP BY entity
"""


@register("name_key_consistency_audit", oracle=_NAMEKEY_ORACLE, tags=("agg", "quality"))
def name_key_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denormalization-drift audit: the numeric suffix embedded in each
    entity's display name ('Customer#000000042') must equal its
    surrogate key — the ETL regression where a re-keyed dimension keeps
    stale display strings. Per entity: parsed/matched/mismatched counts
    and a deterministic example key (NULL when the audit is clean).

    Scale notes: map-only regex extraction (same POSIX class in both
    engines), one |entities|-row rollup per table, unioned — no joins,
    no shuffles wider than the two-row output's partials.
    """
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("entity"),
        F.col("c_custkey").alias("key"),
        F.expr("TRY_CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)").alias("parsed"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("entity"),
        F.col("s_suppkey").alias("key"),
        F.expr("TRY_CAST(regexp_extract(s_name, '([0-9]+)$', 1) AS BIGINT)").alias("parsed"),
    )
    u = c.unionByName(s)
    mism = F.col("parsed").isNotNull() & (F.col("parsed") != F.col("key"))
    return u.groupBy("entity").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("parsed").isNull(), F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_unparsed"),
        F.sum(F.when(F.col("parsed") == F.col("key"), F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_match"),
        F.sum(F.when(mism, F.lit(1)).otherwise(F.lit(0))).cast("long").alias("n_mismatch"),
        F.min(F.when(mism, F.col("key"))).cast("long").alias("example_mismatch_key"),
    )
