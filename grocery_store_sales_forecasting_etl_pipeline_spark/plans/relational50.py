"""Round-6 additions, batch 50: the schema-inference / profiling
completions — the audits a data platform runs when a NEW table lands
and nothing about it can be trusted yet: value-mask pattern profiling
(the regex-class fingerprint that spots mixed formats in a column),
primary-key candidate auditing (which column sets are actually
unique), a functional-dependency screen (which "obvious" FDs the data
actually satisfies — the prerequisite for normalization and for the
`first()`-carry aggregations this repo uses), and a money-precision
audit (do DOUBLE-typed money columns really carry exact cents — the
assumption every cents-integer kernel in this repo rests on, here
made checkable).

Determinism discipline: all counts are BIGINT folds; pattern masks
come from the same two regex substitutions on both engines; shares
are single divisions of integers rounded 6dp; the precision audit
compares round(x*100) to x*100 on the same doubles both engines read
from parquet, so the comparison outcome is bit-identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Value-mask pattern profiling
# ---------------------------------------------------------------------------

_PATTERN_ORACLE = """
WITH vals AS (
  SELECT 'customer.c_name' AS column_name, c_name AS v FROM customer
  UNION ALL
  SELECT 'part.p_name', p_name FROM part
  UNION ALL
  SELECT 'orders.o_orderpriority', o_orderpriority FROM orders
),
masked AS (
  SELECT column_name,
         regexp_replace(regexp_replace(v, '[A-Za-z]', 'a', 'g'),
                        '[0-9]', '9', 'g') AS pattern
  FROM vals
),
per AS (
  SELECT column_name, pattern,
         CAST(count(*) AS BIGINT) AS n
  FROM masked GROUP BY 1, 2
),
rk AS (
  SELECT *,
         CAST(row_number() OVER (PARTITION BY column_name
              ORDER BY n DESC, pattern) AS BIGINT) AS rnk,
         CAST(sum(n) OVER (PARTITION BY column_name) AS BIGINT) AS tot
  FROM per
)
SELECT column_name, pattern, n, rnk,
       round(CAST(n AS DOUBLE) / tot, 6) AS share
FROM rk WHERE rnk <= 5
"""


@register("value_pattern_profile", oracle=_PATTERN_ORACLE, tags=("profiling", "agg"))
def value_pattern_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mask-pattern profile of three string columns: every letter maps
    to 'a', every digit to '9' (punctuation/spaces kept), and the top-5
    masks per column are reported with their share — the classic
    profiling fingerprint that reveals mixed formats (two date styles,
    embedded IDs, stray whitespace) before any parser is written.
    Deterministic top-k: ties broken by pattern text.

    Scale notes: masking is a map-only projection on each scan; the
    fold is (column, pattern)-keyed and map-side combinable — pattern
    cardinality is format-bounded, not row-bounded. The three scans
    union BEFORE the fold so Spark pipelines them in one stage each.
    """
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer.c_name").alias("column_name"), F.col("c_name").alias("v")
    )
    p = _t(spark, sf_dir, "part").select(
        F.lit("part.p_name").alias("column_name"), F.col("p_name").alias("v")
    )
    o = _t(spark, sf_dir, "orders").select(
        F.lit("orders.o_orderpriority").alias("column_name"),
        F.col("o_orderpriority").alias("v"),
    )
    vals = c.unionByName(p).unionByName(o)
    masked = vals.select(
        "column_name",
        F.regexp_replace(
            F.regexp_replace(F.col("v"), "[A-Za-z]", "a"), "[0-9]", "9"
        ).alias("pattern"),
    )
    per = masked.groupBy("column_name", "pattern").agg(
        F.count("*").cast("long").alias("n")
    )
    w_rk = Window.partitionBy("column_name").orderBy(F.desc("n"), F.asc("pattern"))
    w_tot = Window.partitionBy("column_name")
    rk = per.select(
        "column_name",
        "pattern",
        "n",
        F.row_number().over(w_rk).cast("long").alias("rnk"),
        F.sum("n").over(w_tot).cast("long").alias("tot"),
    )
    return rk.filter(F.col("rnk") <= 5).select(
        "column_name",
        "pattern",
        "n",
        "rnk",
        F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("share"),
    )


# ---------------------------------------------------------------------------
# Primary-key candidate audit
# ---------------------------------------------------------------------------

_PK_ORACLE = """
WITH k1 AS (
  SELECT 'o_orderkey' AS candidate,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS unique_keys,
         CAST(count(*) AS BIGINT) - CAST(count(*) FILTER (WHERE c = 1) AS BIGINT)
           AS duplicated_keys,
         CAST(max(c) AS BIGINT) AS max_multiplicity
  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
),
k2 AS (
  SELECT 'o_custkey,o_orderdate',
         CAST(count(*) AS BIGINT),
         CAST(count(*) FILTER (WHERE c = 1) AS BIGINT),
         CAST(count(*) AS BIGINT) - CAST(count(*) FILTER (WHERE c = 1) AS BIGINT),
         CAST(max(c) AS BIGINT)
  FROM (SELECT count(*) AS c FROM orders GROUP BY o_custkey, o_orderdate)
),
k3 AS (
  SELECT 'o_totalprice',
         CAST(count(*) AS BIGINT),
         CAST(count(*) FILTER (WHERE c = 1) AS BIGINT),
         CAST(count(*) AS BIGINT) - CAST(count(*) FILTER (WHERE c = 1) AS BIGINT),
         CAST(max(c) AS BIGINT)
  FROM (SELECT count(*) AS c FROM orders GROUP BY o_totalprice)
)
SELECT candidate,
       n_rows AS n_key_values,
       unique_keys,
       duplicated_keys,
       max_multiplicity,
       CAST(CASE WHEN duplicated_keys = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_key
FROM (SELECT * FROM k1 UNION ALL SELECT * FROM k2 UNION ALL SELECT * FROM k3)
"""


@register("pk_candidate_audit", oracle=_PK_ORACLE, tags=("profiling", "agg"))
def pk_candidate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key candidate audit over orders: for each candidate key
    set (the declared key, a plausible composite, and a known non-key),
    the number of distinct key values, how many are unique vs
    duplicated, and the worst multiplicity — the screen that validates
    a declared key before anything downstream relies on it.

    Scale notes: each candidate is its own keyed fold (map-side
    combinable) to a per-key-multiplicity frame, then a tiny summary
    agg — the countDistinct-fusion trap (one agg computing several
    DISTINCTs) is deliberately avoided; the three audits are
    independent scans that union at 3 rows. No global sort, no windows.
    """
    o = _t(spark, sf_dir, "orders")

    def audit(name: str, keys: list) -> DataFrame:
        per = o.groupBy(*keys).agg(F.count("*").alias("c"))
        return per.agg(
            F.lit(name).alias("candidate"),
            F.count("*").cast("long").alias("n_key_values"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("unique_keys"),
            (F.count("*") - F.sum(F.when(F.col("c") == 1, 1).otherwise(0)))
            .cast("long")
            .alias("duplicated_keys"),
            F.max("c").cast("long").alias("max_multiplicity"),
        ).select(
            "candidate",
            "n_key_values",
            "unique_keys",
            "duplicated_keys",
            "max_multiplicity",
            F.when(F.col("duplicated_keys") == 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("is_key"),
        )

    return (
        audit("o_orderkey", ["o_orderkey"])
        .unionByName(audit("o_custkey,o_orderdate", ["o_custkey", "o_orderdate"]))
        .unionByName(audit("o_totalprice", ["o_totalprice"]))
    )


# ---------------------------------------------------------------------------
# Functional-dependency screen
# ---------------------------------------------------------------------------

_FD_ORACLE = """
WITH fd1 AS (
  SELECT 'part: p_brand -> p_type' AS fd,
         CAST(count(*) AS BIGINT) AS n_determinants,
         CAST(count(*) FILTER (WHERE k > 1) AS BIGINT) AS violating,
         CAST(max(k) AS BIGINT) AS max_dependents
  FROM (SELECT p_brand, count(DISTINCT p_type) AS k FROM part GROUP BY p_brand)
),
fd2 AS (
  SELECT 'nation: n_nationkey -> n_regionkey',
         CAST(count(*) AS BIGINT),
         CAST(count(*) FILTER (WHERE k > 1) AS BIGINT),
         CAST(max(k) AS BIGINT)
  FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS k
        FROM nation GROUP BY n_nationkey)
),
fd3 AS (
  SELECT 'orders: o_custkey -> o_orderpriority',
         CAST(count(*) AS BIGINT),
         CAST(count(*) FILTER (WHERE k > 1) AS BIGINT),
         CAST(max(k) AS BIGINT)
  FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS k
        FROM orders GROUP BY o_custkey)
)
SELECT fd, n_determinants, violating, max_dependents,
       CAST(CASE WHEN violating = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
FROM (SELECT * FROM fd1 UNION ALL SELECT * FROM fd2 UNION ALL SELECT * FROM fd3)
"""


@register("fd_violation_audit", oracle=_FD_ORACLE, tags=("profiling", "agg"))
def fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency screen: for three candidate FDs (a
    dimension hierarchy expected to hold, a key-based FD that holds
    trivially, and a behavioral FD expected to FAIL), count determinant
    values whose dependent is not unique. An FD that holds licenses the
    first()-carry aggregation pattern (see fd_first_agg); one that
    fails forbids it — this audit is how a pipeline finds out which.

    Scale notes: each FD is one two-level fold — (determinant,
    dependent) distinct pairs, then per-determinant counts — both
    map-side combinable; no countDistinct fusion (each FD is its own
    scan; the distinct is the first fold's key). Union at 3 rows.
    """
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")

    def screen(name: str, df: DataFrame, det: str, dep: str) -> DataFrame:
        pairs = df.select(det, dep).distinct()
        per = pairs.groupBy(det).agg(F.count("*").alias("k"))
        return per.agg(
            F.lit(name).alias("fd"),
            F.count("*").cast("long").alias("n_determinants"),
            F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
            .cast("long")
            .alias("violating"),
            F.max("k").cast("long").alias("max_dependents"),
        ).select(
            "fd",
            "n_determinants",
            "violating",
            "max_dependents",
            F.when(F.col("violating") == 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("holds"),
        )

    return (
        screen("part: p_brand -> p_type", part, "p_brand", "p_type")
        .unionByName(
            screen(
                "nation: n_nationkey -> n_regionkey",
                nation,
                "n_nationkey",
                "n_regionkey",
            )
        )
        .unionByName(
            screen(
                "orders: o_custkey -> o_orderpriority",
                orders,
                "o_custkey",
                "o_orderpriority",
            )
        )
    )


# ---------------------------------------------------------------------------
# Money-precision audit
# ---------------------------------------------------------------------------

_MONEY_ORACLE = """
WITH cols AS (
  SELECT 'lineitem.l_extendedprice' AS column_name, l_extendedprice AS x
  FROM lineitem
  UNION ALL
  SELECT 'orders.o_totalprice', o_totalprice FROM orders
  UNION ALL
  SELECT 'part.p_retailprice', p_retailprice FROM part
)
SELECT column_name,
       CAST(count(*) AS BIGINT) AS n_values,
       CAST(sum(CASE WHEN x * 100 = round(x * 100) THEN 0 ELSE 1 END) AS BIGINT)
         AS sub_cent_values,
       CAST(sum(CASE WHEN x <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS non_positive,
       CAST(min(round(x * 100)) AS BIGINT) AS min_cents,
       CAST(max(round(x * 100)) AS BIGINT) AS max_cents
FROM cols
GROUP BY column_name
"""


@register("money_precision_audit", oracle=_MONEY_ORACLE, tags=("profiling", "agg"))
def money_precision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money-precision audit of the DOUBLE-typed price columns: how
    many values are NOT exact cents (x*100 differs from round(x*100)
    as a double — the comparison both engines evaluate on the identical
    parquet doubles), plus non-positive counts and the cent-range. This
    is the audit that justifies (or falsifies) the cents-integer
    arithmetic every money kernel in this repo uses.

    Scale notes: a map-only projection per scan, one (column)-keyed
    fold with map-side partials, three output rows. The unioned scans
    pipeline independently; no shuffle carries row-grain data.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        F.lit("lineitem.l_extendedprice").alias("column_name"),
        F.col("l_extendedprice").alias("x"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.lit("orders.o_totalprice").alias("column_name"),
        F.col("o_totalprice").alias("x"),
    )
    p = _t(spark, sf_dir, "part").select(
        F.lit("part.p_retailprice").alias("column_name"),
        F.col("p_retailprice").alias("x"),
    )
    cols = li.unionByName(o).unionByName(p)
    return cols.groupBy("column_name").agg(
        F.count("*").cast("long").alias("n_values"),
        F.sum(
            F.when(F.col("x") * 100 == F.round(F.col("x") * 100), 0).otherwise(1)
        )
        .cast("long")
        .alias("sub_cent_values"),
        F.sum(F.when(F.col("x") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("non_positive"),
        F.min(F.round(F.col("x") * 100)).cast("long").alias("min_cents"),
        F.max(F.round(F.col("x") * 100)).cast("long").alias("max_cents"),
    )
