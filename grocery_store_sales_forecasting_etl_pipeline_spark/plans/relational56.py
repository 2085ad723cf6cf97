"""Round-6 additions, batch 56: sparse-vector retrieval and decision
statistics — TF-IDF weighted cosine document pairs (the sparse
dot-product similarity that complements set-Jaccard and query-BM25),
a capture-recapture population estimate (the Lincoln-Petersen /
Chapman estimator — how many customers exist that we HAVEN'T seen),
a Gini split-gain screen (the CART split criterion over candidate
features, as a query), and a daily runs test (Wald-Wolfowitz — is the
daily return-majority sequence random or regime-like).

Determinism discipline: TF-IDF uses the repo's log-free tf*N/df
weighting over a df-capped vocabulary (weights are exact rationals
of integers; per-doc norm sums carry the documented ~1e-13 double
noise against 4dp rounding); Chapman and Gini reduce to single
double trees over BIGINT counts; the runs test statistic is closed
form over exact run/flag counts on a calendar-bounded daily frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register
from grocery_store_sales_forecasting_etl_pipeline_spark.operators.sizing import (
    gated_broadcast as _gbcast,
)

# ---------------------------------------------------------------------------
# TF-IDF cosine document pairs (df-capped sparse vectors)
# ---------------------------------------------------------------------------

_TFIDF_COS_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, token
),
dfreq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df
  FROM tf GROUP BY token HAVING count(*) <= 25
),
nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
w AS (
  SELECT tf.doc_id, tf.token,
         CAST(tf.tf * nn.n AS DOUBLE) / dfreq.df AS wt
  FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN nn
),
nrm AS (
  SELECT doc_id, sqrt(sum(wt * wt)) AS nm FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS id_1, b.doc_id AS id_2, sum(a.wt * b.wt) AS dot
  FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d.id_1, d.id_2,
       round(d.dot / (n1.nm * n2.nm), 4) AS tfidf_cosine
FROM dots d
JOIN nrm n1 ON d.id_1 = n1.doc_id
JOIN nrm n2 ON d.id_2 = n2.doc_id
ORDER BY tfidf_cosine DESC, id_1, id_2
LIMIT 20
"""


@register("tfidf_cosine_pairs", oracle=_TFIDF_COS_ORACLE, tags=("text", "similarity"))
def tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 document pairs by TF-IDF weighted cosine over a
    df-capped vocabulary (df <= 25): the sparse-vector similarity that
    ranks pairs by shared RARE vocabulary mass — the third leg of the
    near-dup stack (set-overlap: doc_ngram_jaccard; dense:
    embedding_dup_pairs; sparse-weighted: this). The df cap is the
    operator's contract, not an approximation: high-df tokens carry
    ~zero IDF weight and excluding them from weights AND norms is the
    standard stopword-free formulation — it is also exactly what
    bounds the pair-generation cost (Σ df² over capped tokens).

    Numerics: weights are the repo's log-free tf·N/df rationals of
    exact integers; per-doc norm and per-pair dot sums carry the
    documented ~1e-13 double-order noise against 4dp rounding (the
    price-index precedent); ties in the top-20 break on the pair key.

    Scale notes: token postings fold map-side; the df cap bounds the
    self-join fan-out per token (the doc_ngram_jaccard discipline);
    norms are doc-grain and broadcast into the final scoring join;
    top-k is TakeOrderedAndProject.
    """
    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    tok = d.select(
        "doc_id", F.explode_outer(F.split(F.trim("text"), r"\s+")).alias("token")
    ).filter(F.col("token").isNotNull())
    tf = tok.groupBy("doc_id", "token").agg(
        F.count("*").cast("long").alias("tf")
    ).localCheckpoint(eager=False)
    dfreq = (
        tf.groupBy("token")
        .agg(F.count("*").cast("long").alias("df"))
        .filter(F.col("df") <= 25)
    )
    nn = tf.select("doc_id").distinct().agg(
        F.count("*").cast("long").alias("n")
    )
    w = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "token",
            ((F.col("tf") * F.col("n")).cast("double") / F.col("df")).alias("wt"),
        )
        .localCheckpoint(eager=False)
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nm")
    )
    a = w.select(F.col("doc_id").alias("id_1"), "token", F.col("wt").alias("w1"))
    b = w.select(F.col("doc_id").alias("id_2"), "token", F.col("wt").alias("w2"))
    dots = (
        a.join(b, "token")
        .filter(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    n1 = nrm.select(F.col("doc_id").alias("id_1"), F.col("nm").alias("nm1"))
    n2 = nrm.select(F.col("doc_id").alias("id_2"), F.col("nm").alias("nm2"))
    scored = (
        dots.join(_gbcast(n1), "id_1")
        .join(_gbcast(n2), "id_2")
        .select(
            "id_1",
            "id_2",
            F.round(F.col("dot") / (F.col("nm1") * F.col("nm2")), 4).alias(
                "tfidf_cosine"
            ),
        )
    )
    return scored.orderBy(F.desc("tfidf_cosine"), "id_1", "id_2").limit(20)


# ---------------------------------------------------------------------------
# Capture-recapture population estimate
# ---------------------------------------------------------------------------

_CAPTURE_ORACLE = """
WITH s1 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate < TIMESTAMP '1996-07-01'
),
s2 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-07-01'
),
c AS (
  SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n1,
         CAST((SELECT count(*) FROM s2) AS BIGINT) AS n2,
         CAST((SELECT count(*) FROM s1 JOIN s2 USING (o_custkey)) AS BIGINT)
           AS m
)
SELECT n1, n2, m,
       round(CAST(n1 AS DOUBLE) * n2 / m, 2) AS lincoln_petersen,
       round((CAST(n1 + 1 AS DOUBLE)) * (n2 + 1) / (m + 1) - 1, 2) AS chapman,
       round(sqrt((CAST(n1 + 1 AS DOUBLE)) * (n2 + 1) * (n1 - m) * (n2 - m)
                  / ((CAST(m + 1 AS DOUBLE)) * (m + 1) * (m + 2))), 2)
         AS chapman_se
FROM c
"""


@register("customer_capture_recapture", oracle=_CAPTURE_ORACLE, tags=("stats",))
def customer_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture estimate of the active customer population:
    the first half-period is the marking survey, the second the
    recapture; Lincoln-Petersen N̂ = n1·n2/m and the bias-corrected
    Chapman estimator with its standard error. The ecology estimator
    is exactly the right tool for "how many customers exist that we
    never see in any one window" — market-size estimation from two
    overlapping observation windows.

    Scale notes: two distinct folds (map-side combinable,
    customer-grain) and one key-join for the overlap count m — the
    overlap is computed as a count over the co-keyed join, never a
    collected set. All arithmetic is scalar on one row.
    """
    o = _t(spark, sf_dir, "orders")
    cut = F.lit("1996-07-01 00:00:00").cast("timestamp")
    s1 = o.filter(F.col("o_orderdate") < cut).select("o_custkey").distinct()
    s2 = o.filter(F.col("o_orderdate") >= cut).select("o_custkey").distinct()
    n1 = s1.agg(F.count("*").cast("long").alias("n1"))
    n2 = s2.agg(F.count("*").cast("long").alias("n2"))
    m = s1.join(s2, "o_custkey").agg(F.count("*").cast("long").alias("m"))
    c = n1.crossJoin(n2).crossJoin(m)
    lp = F.col("n1").cast("double") * F.col("n2") / F.col("m")
    chap = (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (
        F.col("m") + 1
    ) - 1
    se = F.sqrt(
        (F.col("n1") + 1).cast("double")
        * (F.col("n2") + 1)
        * (F.col("n1") - F.col("m"))
        * (F.col("n2") - F.col("m"))
        / (
            (F.col("m") + 1).cast("double")
            * (F.col("m") + 1)
            * (F.col("m") + 2)
        )
    )
    return c.select(
        "n1",
        "n2",
        "m",
        F.round(lp, 2).alias("lincoln_petersen"),
        F.round(chap, 2).alias("chapman"),
        F.round(se, 2).alias("chapman_se"),
    )


# ---------------------------------------------------------------------------
# Gini split-gain screen (CART criterion)
# ---------------------------------------------------------------------------

_SPLIT_GAIN_ORACLE = """
WITH lab AS (
  SELECT o.o_orderkey, o.o_orderpriority AS prio, c.c_mktsegment AS seg,
         n.n_name AS nat,
         CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS pos
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
             WHERE l_returnflag = 'R') r
    ON o.o_orderkey = r.l_orderkey
),
feats AS (
  SELECT 'o_orderpriority' AS feature, prio AS v, pos FROM lab
  UNION ALL
  SELECT 'c_mktsegment', seg, pos FROM lab
  UNION ALL
  SELECT 'customer_nation', nat, pos FROM lab
),
per AS (
  SELECT feature, v,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS p
  FROM feats GROUP BY feature, v
),
t AS (
  SELECT feature, v, n, p,
         CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS n_all,
         CAST(sum(p) OVER (PARTITION BY feature) AS BIGINT) AS p_all
  FROM per
),
g AS (
  SELECT feature,
         CAST(count(*) AS BIGINT) AS n_levels,
         any_value(2.0 * (CAST(p_all AS DOUBLE) / n_all)
                   * (1 - CAST(p_all AS DOUBLE) / n_all)) AS gini_parent,
         sum((CAST(n AS DOUBLE) / n_all)
             * (2.0 * (CAST(p AS DOUBLE) / n) * (1 - CAST(p AS DOUBLE) / n)))
           AS gini_children
  FROM t GROUP BY feature
)
SELECT feature, n_levels,
       round(gini_parent, 6) AS gini_parent,
       round(gini_children, 6) AS gini_children,
       round(gini_parent - gini_children, 6) AS gini_gain
FROM g
"""


@register("split_gain_screen", oracle=_SPLIT_GAIN_ORACLE, tags=("ml-eval", "stats"))
def split_gain_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CART split criterion as a query: for each candidate
    categorical feature (priority, segment, customer nation), the Gini
    impurity of the has-return label before and after a full multiway
    split, and the gain — the exact quantity a decision-tree trainer
    maximizes at its root, computable as three keyed folds without any
    tree library. The feature ranking this emits is the first thing a
    feature-selection pass checks.

    Numerics: all cells are BIGINT counts; gini = 2p(1-p) trees are
    identical rationals of integers; the children sum has <= 25 terms
    before a 6dp rounding (price-index noise bound).

    Scale notes: ONE labeled fact frame feeds a 3-way feature unpivot
    (map-only) into a (feature, level)-keyed fold — level cardinality
    is feature-bounded; window marginals run on the <= 35-row frame.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    ret = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
        .withColumn("pos1", F.lit(1))
    )
    lab = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == F.col("n_nationkey"))
        .join(ret, o.o_orderkey == ret.l_orderkey, "left")
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.col("c_mktsegment").alias("seg"),
            F.col("n_name").alias("nat"),
            F.coalesce(F.col("pos1"), F.lit(0)).alias("pos"),
        )
    )
    feats = lab.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_orderpriority").alias("feature"),
                    F.col("prio").alias("v"),
                ),
                F.struct(F.lit("c_mktsegment").alias("feature"), F.col("seg").alias("v")),
                F.struct(
                    F.lit("customer_nation").alias("feature"), F.col("nat").alias("v")
                ),
            )
        ).alias("f"),
        "pos",
    ).select("f.feature", "f.v", "pos")
    per = feats.groupBy("feature", "v").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
    )
    wf = Window.partitionBy("feature")
    t = per.select(
        "feature",
        "v",
        "n",
        "p",
        F.sum("n").over(wf).cast("long").alias("n_all"),
        F.sum("p").over(wf).cast("long").alias("p_all"),
    )
    p_parent = F.col("p_all").cast("double") / F.col("n_all")
    child = (F.col("n").cast("double") / F.col("n_all")) * (
        F.lit(2.0)
        * (F.col("p").cast("double") / F.col("n"))
        * (1 - F.col("p").cast("double") / F.col("n"))
    )
    g = t.groupBy("feature").agg(
        F.count("*").cast("long").alias("n_levels"),
        F.first(F.lit(2.0) * p_parent * (1 - p_parent)).alias("gini_parent"),
        F.sum(child).alias("gini_children"),
    )
    return g.select(
        "feature",
        "n_levels",
        F.round(F.col("gini_parent"), 6).alias("gini_parent"),
        F.round(F.col("gini_children"), 6).alias("gini_children"),
        F.round(F.col("gini_parent") - F.col("gini_children"), 6).alias(
            "gini_gain"
        ),
    )


# ---------------------------------------------------------------------------
# Daily runs test (Wald-Wolfowitz)
# ---------------------------------------------------------------------------

_RUNS_ORACLE = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CASE WHEN sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 2
                   > count(*) THEN 1 ELSE 0 END AS hi
  FROM lineitem GROUP BY 1
),
seq AS (
  SELECT d, hi,
         lag(hi) OVER (ORDER BY d) AS prev
  FROM daily
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(hi) AS BIGINT) AS n1,
         CAST(count(*) - sum(hi) AS BIGINT) AS n0,
         CAST(1 + sum(CASE WHEN prev IS NOT NULL AND hi <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM seq
),
z AS (
  SELECT n, n1, n0, runs,
         1.0 + 2.0 * n1 * n0 / n AS mu,
         (2.0 * n1 * n0) * (2.0 * n1 * n0 - n)
           / (CAST(n AS DOUBLE) * n * (n - 1)) AS var
  FROM st
)
SELECT n AS n_days, n1 AS n_high_days, runs,
       round(mu, 4) AS expected_runs,
       CASE WHEN var > 0 THEN round((runs - mu) / sqrt(var), 6) END AS z_runs
FROM z
"""


@register("daily_return_runs_test", oracle=_RUNS_ORACLE, tags=("stats", "timeseries"))
def daily_return_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily return-majority sequence:
    each ship-day is flagged high/low by whether returned lines
    outnumber kept ones, and the number of RUNS of consecutive equal
    flags is compared to its randomness expectation
    μ = 1 + 2·n1·n0/n. Too few runs ⇒ regimes (the flag sticks); too
    many ⇒ oscillation — either way the i.i.d. assumption behind every
    daily-grain test in this repo is violated, which is exactly what
    this screen is for.

    Numerics: flags come from an integer cross-multiplication
    (2·returns > lines — no rate float); runs/counts are exact; μ, σ²
    and z are one identical double tree, NULL-guarded for degenerate
    all-one-flag sequences.

    Scale notes: one fact fold to the calendar-bounded daily frame;
    the lag window and the closed-form statistic run on ~hundreds of
    rows regardless of fact size.
    """
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.when(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)) * 2
            > F.count("*"),
            1,
        )
        .otherwise(0)
        .alias("hi")
    )
    seq = daily.select(
        "d", "hi", F.lag("hi").over(Window.orderBy("d")).alias("prev")
    )
    st = seq.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("hi").cast("long").alias("n1"),
        (F.count("*") - F.sum("hi")).cast("long").alias("n0"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("hi") != F.col("prev")), 1
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("runs"),
    )
    mu = F.lit(1.0) + F.lit(2.0) * F.col("n1") * F.col("n0") / F.col("n")
    var = (
        (F.lit(2.0) * F.col("n1") * F.col("n0"))
        * (F.lit(2.0) * F.col("n1") * F.col("n0") - F.col("n"))
        / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
    )
    z = st.select(
        "n", "n1", "n0", "runs", mu.alias("mu"), var.alias("var")
    )
    return z.select(
        F.col("n").alias("n_days"),
        F.col("n1").alias("n_high_days"),
        "runs",
        F.round(F.col("mu"), 4).alias("expected_runs"),
        F.when(
            F.col("var") > 0,
            F.round((F.col("runs") - F.col("mu")) / F.sqrt(F.col("var")), 6),
        ).alias("z_runs"),
    )
