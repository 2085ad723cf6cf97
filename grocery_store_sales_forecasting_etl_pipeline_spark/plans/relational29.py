"""Round-5 additions, batch 29: dedup cluster representatives,
ratio-to-parent revenue hierarchy, diagonal-Mahalanobis vector
outliers, and supplier revenue concentration (HHI).

Representative selection is the pipeline stage after clustering (WHICH
duplicate survives: the longest text, not the lowest id); the revenue
hierarchy is the OLAP ratio-to-parent read (share of region, share of
total); the Mahalanobis screen is per-vector outlier detection against
the per-dimension moment profile (the vector sibling of the MAD/z-score
family); HHI is the concentration measure procurement actually uses
(Σ share² — Gini's market-power counterpart, already-covered Gini
measures inequality, HHI measures dominance).

Determinism: cluster membership from the existing CC operator; all
moments from exact integer micro/cent sums (squared terms in
DECIMAL(38,0)/HUGEINT per the overflow rule); the Mahalanobis fold
runs in ARRAY ORDER on both engines (a grouped float sum would be
order-nondeterministic); single closed-form divisions at the boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

import grocery_store_sales_forecasting_etl_pipeline_spark.operators.dedup as dd
from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register
from grocery_store_sales_forecasting_etl_pipeline_spark.operators.sizing import (
    gated_broadcast as _gbcast,
)

# ---------------------------------------------------------------------------
# Dedup cluster representatives (keep the longest member)
# ---------------------------------------------------------------------------

_REP_ORACLE = """
WITH RECURSIVE
t AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
sh AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(range(1, len(tk)),
                i -> tk[i] || ' ' || tk[i + 1]))) AS shingle
  FROM t
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS inter
  FROM sh a JOIN sh b
    ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_1, id_2
  FROM inter
  JOIN sizes s1 ON id_1 = s1.doc_id
  JOIN sizes s2 ON id_2 = s2.doc_id
  WHERE round(inter * 1.0 / (s1.sz + s2.sz - inter), 4) >= 0.08
),
edges AS (
  SELECT id_1 AS u, id_2 AS v FROM pairs
  UNION
  SELECT id_2, id_1 FROM pairs
),
nodes AS (SELECT DISTINCT u AS node FROM edges),
walk(node, reach) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach
),
cc AS (SELECT node AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY node),
m AS (
  SELECT cc.cluster_id, cc.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY cc.cluster_id
                            ORDER BY d.n_chars DESC, cc.doc_id) AS rn
  FROM cc JOIN documents d ON d.doc_id = cc.doc_id
)
SELECT cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(min(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS rep_id,
       CAST(min(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS rep_n_chars,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_dropped
FROM m GROUP BY cluster_id
"""


@register("dedup_cluster_representatives", oracle=_REP_ORACLE, tags=("text", "dedup", "graph"))
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-survivor selection: for every near-duplicate cluster
    (the dedup_components CC over source-blocked Jaccard pairs), keep
    the LONGEST member (ties to the lowest id) and account for the
    bytes the dedup pass saves — the keep-the-best policy production
    curation uses instead of dedup_components' min-id placeholder.

    Scale notes: clusters come from the O(log n) large/small-star CC
    (never the oracle's O(diameter) walk); member metadata joins back
    on doc_id (cluster frame is component-grain, far smaller than the
    corpus); the argmax is one window over the cluster partition. The
    oracle states the same spec as a recursive CTE + rank.
    """
    from grocery_store_sales_forecasting_etl_pipeline_spark.operators import graph as G

    d = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs(
        d, id_col="doc_id", text_col="text", k=2, threshold=0.08, block_cols=("source",)
    )
    cc = G.dedup_clusters(pairs, src="id_1", dst="id_2").select("doc_id", "cluster_id")
    m = cc.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    r = m.select("cluster_id", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
    return r.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("n_members"),
        F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).cast("long").alias("rep_id"),
        F.min(F.when(F.col("rn") == 1, F.col("n_chars"))).cast("long").alias("rep_n_chars"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.when(F.col("rn") > 1, F.col("n_chars")).otherwise(F.lit(0)))
        .cast("long")
        .alias("chars_dropped"),
    )


# ---------------------------------------------------------------------------
# Ratio-to-parent revenue hierarchy
# ---------------------------------------------------------------------------

_HIERARCHY_ORACLE = """
WITH n AS (
  SELECT r.r_name AS region, na.n_name AS nation,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS nation_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation na ON c.c_nationkey = na.n_nationkey
  JOIN region r ON na.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
t AS (
  SELECT region, nation, nation_cents,
         CAST(sum(nation_cents) OVER (PARTITION BY region) AS BIGINT)
           AS region_cents,
         CAST(sum(nation_cents) OVER () AS BIGINT) AS total_cents
  FROM n
)
SELECT region, nation, nation_cents, region_cents, total_cents,
       round(nation_cents * 1.0 / region_cents, 4) AS share_of_region,
       round(nation_cents * 1.0 / total_cents, 4) AS share_of_total
FROM t
"""


@register("ratio_to_parent_hierarchy", oracle=_HIERARCHY_ORACLE, tags=("agg", "window"))
def ratio_to_parent_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent OLAP read: every nation's revenue with its share
    of the parent region and of the grand total — the two-level
    ratio_to_report that drill-down dashboards are built from.

    Scale notes: ONE shuffle folds orders to the |nations|-row grain
    (the three dims broadcast onto the fact); both parent totals are
    windows over that constant-size frame, so no second fact pass and
    no float accumulation wider than one exact-integer sum per level.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region")
    dim = (
        c.select("c_custkey", "c_nationkey")
        .join(F.broadcast(na.select("n_nationkey", "n_regionkey", F.col("n_name").alias("nation"))),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re.select("r_regionkey", F.col("r_name").alias("region"))),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "nation", "region")
    )
    n = (
        o.select("o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
        .join(_gbcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("region", "nation")
        .agg(F.sum("cents").cast("long").alias("nation_cents"))
    )
    w_r = Window.partitionBy("region")
    w_all = Window.partitionBy()
    t = n.select(
        "region",
        "nation",
        "nation_cents",
        F.sum("nation_cents").over(w_r).cast("long").alias("region_cents"),
        F.sum("nation_cents").over(w_all).cast("long").alias("total_cents"),
    )
    return t.select(
        "region",
        "nation",
        "nation_cents",
        "region_cents",
        "total_cents",
        F.round(F.col("nation_cents") * 1.0 / F.col("region_cents"), 4).alias("share_of_region"),
        F.round(F.col("nation_cents") * 1.0 / F.col("total_cents"), 4).alias("share_of_total"),
    )


# ---------------------------------------------------------------------------
# Diagonal-Mahalanobis vector outliers
# ---------------------------------------------------------------------------

_MAHA_TOPK = 20

_MAHA_ORACLE = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vm
  FROM embeddings
),
x AS (
  SELECT vec_id, unnest(vm) AS v, unnest(range(0, len(vm))) AS dim FROM e
),
st AS (
  SELECT dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS s,
         sum(CAST(v AS HUGEINT) * v) AS ss
  FROM x GROUP BY dim
),
mv AS (
  SELECT dim,
         s * 1.0 / n AS mu,
         (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n AS var
  FROM st
),
arrs AS (
  SELECT list(mu ORDER BY dim) AS mus, list(var ORDER BY dim) AS vars FROM mv
),
scored AS (
  SELECT e.vec_id,
         list_reduce(
           list_prepend(0.0,
             list_transform(range(1, len(e.vm) + 1),
               i -> CASE WHEN arrs.vars[i] > 0.0
                         THEN (e.vm[i] - arrs.mus[i]) * (e.vm[i] - arrs.mus[i])
                              / arrs.vars[i]
                         ELSE 0.0 END)),
           (a, b) -> a + b
         ) AS score
  FROM e, arrs
)
SELECT vec_id, round(score, 4) AS maha_sq
FROM scored
ORDER BY score DESC, vec_id
LIMIT {_MAHA_TOPK}
"""


@register("embedding_maha_outliers", oracle=_MAHA_ORACLE, tags=("similarity", "stats"))
def embedding_maha_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-level outlier screen: the diagonal Mahalanobis distance
    of every embedding against the corpus's per-dimension mean/variance
    profile, top-20 — the multivariate sibling of the MAD/z-score
    screens that catches corrupted or out-of-distribution vectors
    before they poison an ANN index or training batch.

    Determinism: per-dim moments come from exact integer micro sums
    (HUGEINT/DECIMAL squares); the per-vector score folds the
    dimension sequence IN ORDER on both engines (F.aggregate /
    list_reduce) — a grouped float sum would be shuffle-order-
    nondeterministic, the fold is not. Zero-variance dims contribute 0.

    Scale notes: the moment profile is one posexplode + dim-keyed fold
    (|dims| rows), broadcast back as two ordered arrays; scoring is
    map-only over the vectors; the top-k is TakeOrderedAndProject.
    """
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1000000).cast("long"),
        ).alias("vm"),
    )
    x = e.select("vec_id", F.posexplode("vm").alias("dim", "v"))
    st = x.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v").cast("decimal(19,0)") * F.col("v").cast("decimal(19,0)")).alias("ss"),
    )
    mv = st.select(
        "dim",
        (F.col("s") * 1.0 / F.col("n")).alias("mu"),
        (
            (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n"))
            / F.col("n")
        ).alias("var"),
    )
    arrs = mv.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "mu"))), lambda s: s["mu"]
        ).alias("mus"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "var"))), lambda s: s["var"]
        ).alias("vars"),
    )
    scored = e.crossJoin(F.broadcast(arrs)).select(
        "vec_id",
        F.aggregate(
            F.sequence(F.lit(1), F.size("vm")),
            F.lit(0.0),
            lambda a, i: a
            + F.when(
                F.element_at(F.col("vars"), i) > 0.0,
                (F.element_at(F.col("vm"), i) - F.element_at(F.col("mus"), i))
                * (F.element_at(F.col("vm"), i) - F.element_at(F.col("mus"), i))
                / F.element_at(F.col("vars"), i),
            ).otherwise(F.lit(0.0)),
        ).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(_MAHA_TOPK)
        .select("vec_id", F.round("score", 4).alias("maha_sq"))
    )


# ---------------------------------------------------------------------------
# Supplier revenue concentration (HHI)
# ---------------------------------------------------------------------------

_HHI_ORACLE = """
WITH sr AS (
  SELECT n.n_name AS nation, l.l_suppkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT nation,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       round(CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
             / (CAST(sum(cents) AS DOUBLE) * sum(cents)), 6) AS hhi,
       round(CAST(max(cents) AS DOUBLE) / sum(cents), 4) AS top_share
FROM sr GROUP BY nation
"""


@register("nation_supplier_hhi", oracle=_HHI_ORACLE, tags=("agg", "stats"))
def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration read: the Herfindahl-Hirschman index of
    supplier revenue within each nation (Σ share² — 1/n for perfect
    competition, 1.0 for monopoly) plus the top supplier's share — the
    dominance measure next to the already-covered Gini inequality
    (nation_spend_gini measures spread, HHI measures market power).

    Determinism: supplier revenues are exact cent sums; Σ cents² is
    HUGEINT/DECIMAL(38,0) (cents ~1e9 squares past BIGINT immediately);
    HHI is one float division of two exact accumulators, identical op
    order both engines.

    Scale notes: ONE shuffle folds the fact to (nation, supplier)
    grain (supplier/nation dims broadcast); the HHI rollup reduces
    that |suppliers|-row frame to |nations| rows with map-side
    partials.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    dim = s.select("s_suppkey", "s_nationkey").join(
        F.broadcast(na.select("n_nationkey", F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    sr = (
        li.select("l_suppkey", F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"))
        .join(_gbcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", "l_suppkey")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    dec = "decimal(19,0)"
    return sr.groupBy("nation").agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.round(
            F.sum(F.col("cents").cast(dec) * F.col("cents").cast(dec)).cast("double")
            / (F.sum("cents").cast("double") * F.sum("cents")),
            6,
        ).alias("hhi"),
        F.round(F.max("cents").cast("double") / F.sum("cents"), 4).alias("top_share"),
    )
