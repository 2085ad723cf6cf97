"""Round-5 relational additions: Markov event transitions, activity
streaks (gaps-and-islands), blocked fuzzy entity matching, and exact
Pareto concentration — analytic shapes a warehouse layer needs beyond
the reference's aggregate/window core (SURVEY.md §2.4/§2.6 extensions).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Markov transition matrix over the event stream
# ---------------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
c AS (
  SELECT prev_type, event_type, count(*) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type,
       CAST(n_trans AS BIGINT) AS n_trans,
       round(CAST(n_trans AS DOUBLE)
             / sum(n_trans) OVER (PARTITION BY prev_type), 4) AS prob
FROM c
"""


@register("event_transitions", oracle=_TRANSITIONS_ORACLE, tags=("window", "agg"))
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    each (previous event type → event type) pair per user timeline, the
    transition count and conditional probability — the session-model
    statistic behind journey analysis and next-event prediction
    (generalizes the reference's window family,
    ``notebooks/gold_feature.py.py:27-38``, from lagged VALUES to
    lagged CATEGORIES).

    Scale notes: ONE shuffle on user_id for the lag window; the
    transition aggregate reduces to |types|² rows, so the probability
    window runs on a micro-frame. Per-user ordering is (ts, event_id)
    — a deterministic total order, replay-stable.
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", "event_type").agg(
        F.count("*").cast("long").alias("n_trans")
    )
    tot = Window.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "event_type",
        "n_trans",
        F.round(
            F.col("n_trans").cast("double") / F.sum("n_trans").over(tot), 4
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Longest consecutive-day activity streaks (gaps-and-islands)
# ---------------------------------------------------------------------------

_STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
isl AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, count(*) AS len
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(sum(len) AS BIGINT)  AS n_active_days,
       CAST(count(*) AS BIGINT)  AS n_streaks,
       CAST(max(len) AS BIGINT)  AS longest_streak
FROM streaks GROUP BY user_id
"""


@register("user_active_streaks", oracle=_STREAKS_ORACLE, tags=("window", "agg"))
def user_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-day activity streaks via gaps-and-islands:
    distinct active days, minus a row_number ramp, groups each run of
    consecutive dates under one island key — the retention/engagement
    statistic (daily-grain cousin of ``cohort_retention``).

    Scale notes: the distinct-day reduce and both windows all key on
    user_id, so Catalyst reuses ONE exchange for the whole chain; state
    after the distinct is |users|×|days| ≪ |events|. All-integer
    output — no float parity surface at all.
    """
    e = _t(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("island"),
    )
    streaks = isl.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy entity matching (edit-distance record linkage)
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
SELECT a.c_nationkey                       AS nationkey,
       a.c_custkey                         AS custkey_1,
       b.c_custkey                         AS custkey_2,
       a.c_name                            AS name_1,
       b.c_name                            AS name_2,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


@register("fuzzy_name_pairs", oracle=_FUZZY_ORACLE, tags=("join", "dedup"))
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs: customers in the same nation
    whose names are within edit distance 1 — the blocked fuzzy
    self-join of a record-linkage pipeline (block on an exact key,
    score the within-block pairs with codegen'd ``F.levenshtein``).

    Scale notes: the equi-key block bounds the pair space to
    Σ|block|² instead of n²; the distance threshold caps the
    levenshtein dynamic program early (JVM whole-stage codegen, no
    Python). At 100 TB, nation-sized blocks are too coarse — compose
    with the q-gram/MinHash banding in operators/dedup.py to generate
    blocks, then reuse this exact scoring join unchanged; the
    same-block self-join shape here is what that composition executes
    per band.
    """
    c = _t(spark, sf_dir, "customer")
    # FastSS deletion-neighborhood blocking (Bocek et al., 2007),
    # COMPLETE for lev <= 1: two strings within one edit share at least
    # one member of their deletion neighborhoods (the string itself
    # plus every single-character deletion) — a substitution matches
    # after deleting the edited position from both, an insert/delete
    # after deleting the extra character. Candidates therefore come
    # from an equi-join on (nationkey, variant) whose fan-out is
    # Σ variant-bucket² (near-linear), not Σ nation-block² (600²·25 ≈
    # 9M pairs at sf0.1 — the naive shape measured 12.8s; this one
    # ~1s). The capped 3-arg levenshtein then verifies survivors with
    # an early-abandon DP and returns the true distance. The oracle
    # keeps the plain quadratic block join — same rows, which is the
    # point: blocking is a plan choice, not a semantics choice.
    dels = F.expr(
        "array_distinct(array_union(array(c_name), "
        "transform(sequence(1, length(c_name)), "
        "j -> concat(substr(c_name, 1, j - 1), "
        "substr(c_name, j + 1, length(c_name))))))"
    )
    keyed = c.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.explode_outer(dels).alias("variant"),
    )
    a = keyed.select(
        "nationkey",
        F.col("custkey").alias("custkey_1"),
        F.col("name").alias("name_1"),
        "variant",
    )
    b = keyed.select(
        F.col("nationkey").alias("nationkey_b"),
        F.col("custkey").alias("custkey_2"),
        F.col("name").alias("name_2"),
        F.col("variant").alias("variant_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("nationkey") == F.col("nationkey_b"))
            & (F.col("variant") == F.col("variant_b"))
            & (F.col("custkey_1") < F.col("custkey_2")),
        )
        .select("nationkey", "custkey_1", "custkey_2", "name_1", "name_2")
        .dropDuplicates(["custkey_1", "custkey_2"])
    )
    lev = F.levenshtein("name_1", "name_2", 1)
    return cand.filter(lev >= 0).select(
        "nationkey",
        "custkey_1",
        "custkey_2",
        "name_1",
        "name_2",
        lev.cast("long").alias("lev"),
    )


# ---------------------------------------------------------------------------
# Exact Pareto concentration (80/20 analysis per nation)
# ---------------------------------------------------------------------------

# All comparisons happen in EXACT decimal arithmetic (5*cum vs 4*total),
# so the 80% cut is engine-independent; only the reported share is a
# (rounded) double.
_PARETO_ORACLE = """
WITH rev AS (
  SELECT c.c_nationkey AS nationkey, c.c_custkey AS custkey,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
           AS revenue
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey, c.c_custkey
),
ranked AS (
  SELECT nationkey, custkey, revenue,
         sum(revenue) OVER (PARTITION BY nationkey
                            ORDER BY revenue DESC, custkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
         sum(revenue) OVER (PARTITION BY nationkey)   AS total
  FROM rev
)
SELECT nationkey,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN 5 * (cum - revenue) < 4 * total THEN 1 ELSE 0 END)
            AS BIGINT) AS pareto_n,
       round(CAST(max(revenue) AS DOUBLE) / CAST(max(total) AS DOUBLE), 4)
         AS top1_share
FROM ranked GROUP BY nationkey
"""


@register("nation_revenue_pareto", oracle=_PARETO_ORACLE, tags=("window", "agg"))
def nation_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation: how many top customers (by
    exact decimal revenue, ties broken by custkey) cover 80% of the
    nation's revenue, plus the single-largest customer's share — the
    Pareto/ABC analysis behind account segmentation.

    Numerics: the 80% membership test is ``5·(cum − rev) < 4·total``
    in EXACT decimal arithmetic — no float enters the cut decision, so
    the count is engine-exact; only the reported top1_share divides as
    (identically computed) doubles.

    Scale notes: the per-customer reduce shuffles once on custkey; the
    ranking windows and final aggregate all key on nationkey and reuse
    one exchange. Cumulative-sum frames stay exact because decimal
    addition is associative — no float running-sum drift.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_custkey").alias("custkey"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("revenue")
        )
    )
    wcum = (
        Window.partitionBy("nationkey")
        .orderBy(F.col("revenue").desc(), F.col("custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("nationkey")
    ranked = rev.select(
        "nationkey",
        "custkey",
        "revenue",
        F.sum("revenue").over(wcum).alias("cum"),
        F.sum("revenue").over(wtot).alias("total"),
    )
    needed = (F.lit(5) * (F.col("cum") - F.col("revenue"))) < (
        F.lit(4) * F.col("total")
    )
    return ranked.groupBy("nationkey").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum(F.when(needed, 1).otherwise(0)).cast("long").alias("pareto_n"),
        F.round(
            F.max("revenue").cast("double") / F.max("total").cast("double"), 4
        ).alias("top1_share"),
    )
