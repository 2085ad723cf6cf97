"""Round-6 additions, batch 89: cluster validity without a model,
stratified confounding control, weighted set overlap, and factorial
variance decomposition — the Calinski-Harabasz and Davies-Bouldin
validity indices of the embedding label clustering (CH: between/within
variance ratio, higher better; DB: mean worst-pair
(spread_i+spread_j)/centroid-distance, lower better — together the
standard "are these labels real clusters" scorecard, complementing
embedding_centroid_silhouette's per-point view with exact moment
arithmetic and no pairwise point distances), the Mantel-Haenszel
common odds ratio + Cochran-MH test for deep-discount → return
association STRATIFIED BY NATION (the epidemiology workhorse that
stops a nation-mix confound from manufacturing a fake association —
the stratified upgrade of discount_return_auc's pooled view), the
weighted Jaccard (Ružička) similarity between segment brand-quantity
vectors (Σmin/Σmax on exact integer counts — the overlap measure JS
divergence approximates from above), and a two-way ANOVA of line
quantity on discount × tax (main effects and interaction F ratios —
is the quantity response to discount modulated by tax band?).

Determinism discipline: every cell/stratum/cluster moment is an exact
integer (HUGEINT/DECIMAL(38,0) squares); CH/DB/MH/F ratios are
identical closed-form double trees over those integers; weighted
Jaccard never leaves integers until one division; strict zero-guards
on every stratum denominator; one rounding per output float.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register
from grocery_store_sales_forecasting_etl_pipeline_spark.operators.sizing import (
    gated_broadcast as _gbcast,
)

_DEC = "decimal(38,0)"

_QDIM_L = """
  SELECT vec_id, label, CAST(u AS BIGINT) AS dim,
         CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS q
  FROM (
    SELECT vec_id, label,
           unnest(embedding) AS v,
           unnest(range(0, len(embedding))) AS u
    FROM embeddings
  )
"""


def _qdim_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "v"),
    ).select(
        "vec_id",
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("v").cast("double") * 1_000_000).cast("long").alias("q"),
    )


# ---------------------------------------------------------------------------
# Calinski-Harabasz + Davies-Bouldin cluster validity
# ---------------------------------------------------------------------------

_VALIDITY_ORACLE = f"""
WITH qd AS ({_QDIM_L}),
per AS (
  SELECT label, dim,
         CAST(sum(CAST(q AS HUGEINT)) AS DECIMAL(38,0)) AS s
  FROM qd GROUP BY label, dim
),
cl AS (
  SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT) AS n_i,
         CAST(sum(CAST(q AS HUGEINT) * q) AS DECIMAL(38,0)) AS ssq_i
  FROM qd GROUP BY label
),
cnorm AS (
  SELECT label, CAST(sum(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS DECIMAL(38,0)) AS s2
  FROM per GROUP BY label
),
cstat AS (
  SELECT cl.label, cl.n_i, cl.ssq_i, cnorm.s2,
         CAST(cl.ssq_i AS DOUBLE) - CAST(cnorm.s2 AS DOUBLE) / cl.n_i AS w_i
  FROM cl JOIN cnorm ON cl.label = cnorm.label
),
gstat AS (
  SELECT CAST(sum(n_i) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k,
         sum(CAST(ssq_i AS DOUBLE)) AS ssq,
         sum(CAST(s2 AS DOUBLE) / n_i) AS cterm,
         sum(w_i) AS w
  FROM cstat
),
gnorm AS (
  SELECT CAST(sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)) AS DECIMAL(38,0)) AS g2
  FROM (SELECT dim, CAST(sum(CAST(s AS HUGEINT)) AS HUGEINT) AS t
        FROM per GROUP BY dim)
),
pairs AS (
  SELECT a.label AS la, b.label AS lb,
         sqrt(sum((CAST(a.s AS DOUBLE) / ca.n_i - CAST(b.s AS DOUBLE) / cb.n_i)
                  * (CAST(a.s AS DOUBLE) / ca.n_i - CAST(b.s AS DOUBLE) / cb.n_i)))
           AS d_ij,
         sqrt(max(ca.w) / max(ca.n_i2)) + sqrt(max(cb.w) / max(cb.n_i2)) AS ss
  FROM per a
  JOIN per b ON a.dim = b.dim AND a.label < b.label
  JOIN (SELECT label, n_i, n_i AS n_i2, w_i AS w FROM cstat) ca ON ca.label = a.label
  JOIN (SELECT label, n_i, n_i AS n_i2, w_i AS w FROM cstat) cb ON cb.label = b.label
  GROUP BY a.label, b.label
),
ratios AS (
  SELECT la AS label, ss / d_ij AS r FROM pairs
  UNION ALL
  SELECT lb AS label, ss / d_ij AS r FROM pairs
),
db AS (
  SELECT sum(mx) / count(*) AS db_index
  FROM (SELECT label, max(r) AS mx FROM ratios GROUP BY label)
)
SELECT gstat.n AS n_vectors, gstat.k AS n_clusters,
       round((gstat.cterm - CAST(gnorm.g2 AS DOUBLE) / gstat.n) / (gstat.k - 1)
             / (gstat.w / (gstat.n - gstat.k)), 4) AS calinski_harabasz,
       round(db.db_index, 4) AS davies_bouldin
FROM gstat CROSS JOIN gnorm CROSS JOIN db
"""


@register("embedding_cluster_validity", oracle=_VALIDITY_ORACLE, tags=("similarity", "ml"))
def embedding_cluster_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski-Harabasz and Davies-Bouldin validity indices of the
    embedding label clustering, from MOMENTS only (no pairwise point
    distances): within-cluster scatter Wᵢ = Σ‖x‖² − ‖Sᵢ‖²/nᵢ, between
    scatter B = Σ‖Sᵢ‖²/nᵢ − ‖S‖²/n, CH = (B/(k−1))/(W/(n−k)) — higher
    means labels explain geometry; DB = meanᵢ maxⱼ (sᵢ+sⱼ)/d(cᵢ,cⱼ)
    with sᵢ = √(Wᵢ/nᵢ) — lower means compact, well-separated. The
    dataset-level scorecard beside embedding_centroid_silhouette's
    per-point diagnosis.

    Determinism: on the q = round(v·1e6) grid, per-cluster dim sums,
    squared norms, and the global sum vector are exact integers
    (HUGEINT→DECIMAL(38,0)); all scatters and centroid distances are
    identical closed-form double trees; 4dp rounding absorbs the
    ≤1e-12 relative fold noise of the ≤64-term double sums.

    Scale notes: two map-side folds onto (labels × dims) and (labels)
    frames; the centroid pair join is (k² × d) rows — label-bounded,
    never point-bounded.
    """
    qd = _qdim_spark(spark, sf_dir).localCheckpoint(eager=False)
    per = qd.groupBy("label", "dim").agg(F.sum(F.col("q").cast(_DEC)).alias("s"))
    cl = qd.groupBy("label").agg(
        F.countDistinct("vec_id").cast("long").alias("n_i"),
        F.sum(F.col("q").cast(_DEC) * F.col("q").cast(_DEC)).cast(_DEC).alias("ssq_i"),
    )
    cnorm = per.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).cast(_DEC).alias("s2")
    )
    cstat = (
        cl.join(cnorm, "label")
        .select(
            "label",
            "n_i",
            "ssq_i",
            "s2",
            (
                F.col("ssq_i").cast("double")
                - F.col("s2").cast("double") / F.col("n_i")
            ).alias("w_i"),
        )
        .localCheckpoint(eager=False)
    )
    glob = cstat.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
        F.sum(F.col("s2").cast("double") / F.col("n_i")).alias("cterm"),
        F.sum("w_i").alias("w"),
    )
    gnorm = (
        per.groupBy("dim")
        .agg(F.sum("s").cast(_DEC).alias("t"))
        .agg(F.sum(F.col("t") * F.col("t")).cast(_DEC).alias("g2"))
    )
    a = per.alias("a")
    b = per.alias("b")
    ca = cstat.select(
        F.col("label").alias("la_key"), F.col("n_i").alias("na"), F.col("w_i").alias("wa")
    )
    cb = cstat.select(
        F.col("label").alias("lb_key"), F.col("n_i").alias("nb"), F.col("w_i").alias("wb")
    )
    diff = F.col("a.s").cast("double") / F.col("na") - F.col("b.s").cast("double") / F.col("nb")
    pairs = (
        a.join(b, (F.col("a.dim") == F.col("b.dim")) & (F.col("a.label") < F.col("b.label")))
        .join(F.broadcast(ca), F.col("a.label") == F.col("la_key"))
        .join(F.broadcast(cb), F.col("b.label") == F.col("lb_key"))
        .groupBy(F.col("a.label").alias("la"), F.col("b.label").alias("lb"))
        .agg(
            F.sqrt(F.sum(diff * diff)).alias("d_ij"),
            (
                F.sqrt(F.max("wa") / F.max("na")) + F.sqrt(F.max("wb") / F.max("nb"))
            ).alias("ss"),
        )
    )
    ratios = pairs.select(
        F.col("la").alias("label"), (F.col("ss") / F.col("d_ij")).alias("r")
    ).unionAll(
        pairs.select(F.col("lb").alias("label"), (F.col("ss") / F.col("d_ij")).alias("r"))
    )
    db = (
        ratios.groupBy("label")
        .agg(F.max("r").alias("mx"))
        .agg((F.sum("mx") / F.count("*")).alias("db_index"))
    )
    return (
        glob.crossJoin(F.broadcast(gnorm))
        .crossJoin(F.broadcast(db))
        .select(
            F.col("n").alias("n_vectors"),
            F.col("k").alias("n_clusters"),
            F.round(
                (F.col("cterm") - F.col("g2").cast("double") / F.col("n"))
                / (F.col("k") - 1)
                / (F.col("w") / (F.col("n") - F.col("k"))),
                4,
            ).alias("calinski_harabasz"),
            F.round("db_index", 4).alias("davies_bouldin"),
        )
    )


# ---------------------------------------------------------------------------
# Mantel-Haenszel: deep discount -> return, stratified by nation
# ---------------------------------------------------------------------------

_MH_ORACLE = """
WITH base AS (
  SELECT n.n_name AS nation,
         CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END AS exp_,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
strata AS (
  SELECT nation,
         CAST(sum(exp_ * ret) AS BIGINT) AS a,
         CAST(sum(exp_ * (1 - ret)) AS BIGINT) AS b,
         CAST(sum((1 - exp_) * ret) AS BIGINT) AS c,
         CAST(sum((1 - exp_) * (1 - ret)) AS BIGINT) AS d
  FROM base GROUP BY nation
),
terms AS (
  SELECT CAST(count(*) AS BIGINT) AS n_strata,
         CAST(sum(a + b + c + d) AS BIGINT) AS n_lines,
         CAST(sum(a) AS BIGINT) AS sum_a,
         sum(CAST(a AS DOUBLE) * d / (a + b + c + d)) AS s_ad,
         sum(CAST(b AS DOUBLE) * c / (a + b + c + d)) AS s_bc,
         sum(CAST(a + b AS DOUBLE) * (a + c) / (a + b + c + d)) AS s_e,
         sum(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
             / (CAST(a + b + c + d AS DOUBLE) * (a + b + c + d)
                * (a + b + c + d - 1))) AS s_v
  FROM strata
)
SELECT n_strata, n_lines, sum_a AS exposed_returns,
       round(s_ad / s_bc, 6) AS mh_odds_ratio,
       round((sum_a - s_e) * (sum_a - s_e) / s_v, 6) AS cmh_chi2
FROM terms
"""


@register("return_discount_mantel_haenszel", oracle=_MH_ORACLE, tags=("stats",))
def return_discount_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel common odds ratio and Cochran-MH χ² for the
    deep-discount (≥ 5%) → return association, stratified by customer
    nation: OR_MH = Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ), CMH = (Σaᵢ − ΣE[aᵢ])²/
    ΣVar[aᵢ] with hypergeometric stratum moments. Stratification is
    the point: if nations differ in both discount policy AND return
    propensity, the pooled 2×2 (discount_return_auc's view)
    manufactures an association that vanishes — or reverses
    (Simpson) — within every nation. One df, directly comparable to
    the pooled test.

    Determinism: stratum cells are exact integers off one fact pass;
    each stratum's ad/n, bc/n, expectation and variance are identical
    rational double trees (25 terms summed — fold noise 1e-15 against
    6dp rounding); two divisions at the boundary.

    Scale notes: fact joins shuffle on orderkey/custkey (nation
    broadcast); the stratum fold is map-side onto 25 groups;
    everything after is 25 rows.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_discount", "l_returnflag")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("exp_"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
        )
    )
    strata = base.groupBy("nation").agg(
        F.sum(F.col("exp_") * F.col("ret")).cast("long").alias("a"),
        F.sum(F.col("exp_") * (1 - F.col("ret"))).cast("long").alias("b"),
        F.sum((1 - F.col("exp_")) * F.col("ret")).cast("long").alias("c"),
        F.sum((1 - F.col("exp_")) * (1 - F.col("ret"))).cast("long").alias("d"),
    )
    nn = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    terms = strata.agg(
        F.count("*").cast("long").alias("n_strata"),
        F.sum(nn).cast("long").alias("n_lines"),
        F.sum("a").cast("long").alias("sum_a"),
        F.sum(F.col("a").cast("double") * F.col("d") / nn).alias("s_ad"),
        F.sum(F.col("b").cast("double") * F.col("c") / nn).alias("s_bc"),
        F.sum(
            (F.col("a") + F.col("b")).cast("double") * (F.col("a") + F.col("c")) / nn
        ).alias("s_e"),
        F.sum(
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("c") + F.col("d"))
            * (F.col("a") + F.col("c"))
            * (F.col("b") + F.col("d"))
            / (nn.cast("double") * nn * (nn - 1))
        ).alias("s_v"),
    )
    dev = F.col("sum_a") - F.col("s_e")
    return terms.select(
        "n_strata",
        "n_lines",
        F.col("sum_a").alias("exposed_returns"),
        F.round(F.col("s_ad") / F.col("s_bc"), 6).alias("mh_odds_ratio"),
        F.round(dev * dev / F.col("s_v"), 6).alias("cmh_chi2"),
    )


# ---------------------------------------------------------------------------
# Weighted Jaccard (Ruzicka) similarity of segment brand-quantity vectors
# ---------------------------------------------------------------------------

_WJACCARD_ORACLE = """
WITH base AS (
  SELECT c.c_mktsegment AS seg, p.p_brand AS brand,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY seg, brand
),
dense AS (
  SELECT s.seg, b.brand, coalesce(x.q, 0) AS q
  FROM (SELECT DISTINCT seg FROM base) s
  CROSS JOIN (SELECT DISTINCT brand FROM base) b
  LEFT JOIN base x ON x.seg = s.seg AND x.brand = b.brand
),
pairs AS (
  SELECT a.seg AS seg_a, b.seg AS seg_b,
         CAST(sum(least(a.q, b.q)) AS BIGINT) AS s_min,
         CAST(sum(greatest(a.q, b.q)) AS BIGINT) AS s_max
  FROM dense a JOIN dense b ON a.brand = b.brand AND a.seg < b.seg
  GROUP BY seg_a, seg_b
)
SELECT seg_a, seg_b, s_min AS sum_min_qty, s_max AS sum_max_qty,
       round(CAST(s_min AS DOUBLE) / s_max, 6) AS weighted_jaccard
FROM pairs
"""


@register("segment_brand_weighted_jaccard", oracle=_WJACCARD_ORACLE, tags=("stats", "dedup"))
def segment_brand_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Jaccard (Ružička) similarity between every pair of
    customer segments' brand-QUANTITY vectors: Σ_b min(qₐ,q_b) /
    Σ_b max(qₐ,q_b). The magnitude-aware overlap the set-Jaccard
    family (supplier_overlap_jaccard, minhash dedup) collapses to 0/1
    membership, and the exact quantity twin of
    segment_brand_js_divergence's distributional distance — JS says
    the MIXES differ, this says by how much of the actual volume.

    Determinism: brand quantity totals are exact integers on the
    densified segment × brand frame (zero-filled so max() sees
    one-sided brands); min/max sums stay integer; one division.

    Scale notes: same join spine as the JS query (orderkey/custkey
    shuffles, broadcast part), map-side fold onto 125 cells, 10-row
    pair join.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(_gbcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("p_brand").alias("brand"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
        .localCheckpoint(eager=False)
    )
    dense = (
        base.select("seg").distinct()
        .crossJoin(base.select("brand").distinct())
        .join(base, ["seg", "brand"], "left")
        .select("seg", "brand", F.coalesce(F.col("q"), F.lit(0)).alias("q"))
    )
    a = dense.alias("a")
    b = dense.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.brand") == F.col("b.brand")) & (F.col("a.seg") < F.col("b.seg")),
        )
        .groupBy(F.col("a.seg").alias("seg_a"), F.col("b.seg").alias("seg_b"))
        .agg(
            F.sum(F.least(F.col("a.q"), F.col("b.q"))).cast("long").alias("s_min"),
            F.sum(F.greatest(F.col("a.q"), F.col("b.q"))).cast("long").alias("s_max"),
        )
    )
    return pairs.select(
        "seg_a",
        "seg_b",
        F.col("s_min").alias("sum_min_qty"),
        F.col("s_max").alias("sum_max_qty"),
        F.round(F.col("s_min").cast("double") / F.col("s_max"), 6).alias(
            "weighted_jaccard"
        ),
    )


# ---------------------------------------------------------------------------
# Two-way ANOVA: quantity on discount x tax
# ---------------------------------------------------------------------------

_TWOWAY_ORACLE = """
WITH base AS (
  SELECT CAST(round(l_discount * 100) AS BIGINT) AS da,
         CAST(round(l_tax * 100) AS BIGINT) AS tb,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
),
cells AS (
  SELECT da, tb, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS syy
  FROM base GROUP BY da, tb
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(sy) AS BIGINT) AS sy,
         CAST(sum(syy) AS DECIMAL(38,0)) AS syy,
         CAST(count(*) AS BIGINT) AS n_cells
  FROM cells
),
ra AS (
  SELECT da, CAST(sum(n) AS BIGINT) AS n, CAST(sum(sy) AS BIGINT) AS sy
  FROM cells GROUP BY da
),
rb AS (
  SELECT tb, CAST(sum(n) AS BIGINT) AS n, CAST(sum(sy) AS BIGINT) AS sy
  FROM cells GROUP BY tb
),
ss AS (
  SELECT
    (SELECT CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n FROM tot) AS sst,
    (SELECT sum(CAST(sy AS DOUBLE) * sy / n) FROM ra)
      - (SELECT CAST(sy AS DOUBLE) * sy / n FROM tot) AS ssa,
    (SELECT sum(CAST(sy AS DOUBLE) * sy / n) FROM rb)
      - (SELECT CAST(sy AS DOUBLE) * sy / n FROM tot) AS ssb,
    (SELECT sum(CAST(sy AS DOUBLE) * sy / n) FROM cells)
      - (SELECT CAST(sy AS DOUBLE) * sy / n FROM tot) AS ss_cells,
    (SELECT CAST(syy AS DOUBLE) FROM tot)
      - (SELECT sum(CAST(sy AS DOUBLE) * sy / n) FROM cells) AS sse,
    (SELECT CAST(count(*) AS BIGINT) FROM ra) AS ka,
    (SELECT CAST(count(*) AS BIGINT) FROM rb) AS kb,
    (SELECT n_cells FROM tot) AS n_cells,
    (SELECT n FROM tot) AS n
)
SELECT n AS n_lines, ka AS n_discount_levels, kb AS n_tax_levels,
       round(ssa, 2) AS ss_discount,
       round(ssb, 2) AS ss_tax,
       round(ss_cells - ssa - ssb, 2) AS ss_interaction,
       round(sse, 2) AS ss_error,
       round((ssa / (ka - 1)) / (sse / (n - n_cells)), 6) AS f_discount,
       round((ssb / (kb - 1)) / (sse / (n - n_cells)), 6) AS f_tax,
       round(((ss_cells - ssa - ssb) / ((ka - 1.0) * (kb - 1)))
             / (sse / (n - n_cells)), 6) AS f_interaction
FROM ss
"""


@register("discount_tax_twoway_anova", oracle=_TWOWAY_ORACLE, tags=("stats",))
def discount_tax_twoway_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA of line quantity on discount level × tax level:
    main-effect and interaction F ratios from the weighted (cell-
    means) decomposition — SS_A and SS_B from marginal means,
    SS_AB = SS_cells − SS_A − SS_B, error from within-cell scatter.
    The interaction F is the new information: does the quantity
    response to a discount DEPEND on the tax band (a pricing-policy
    coupling no one-way ANOVA — weekday_revenue_anova — can see)?
    Weighted decomposition on unbalanced counts (the classical
    sequential form; components need not be orthogonal — documented).

    Determinism: per-cell n, Σy, Σy² are exact integers
    (HUGEINT/DECIMAL(38,0)); marginals are integer folds of the ~99
    cells; every SS is an identical rational double tree; F ratios
    round once.

    Scale notes: ONE fact scan folding map-side onto the ≤ 11×9 cell
    frame; marginals and SS terms are cell-frame arithmetic.
    """
    base = _t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("long").alias("da"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tb"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    cells = base.groupBy("da", "tb").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y").cast(_DEC) * F.col("y").cast(_DEC)).cast(_DEC).alias("syy"),
    ).localCheckpoint(eager=False)
    tot = cells.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sy").cast("long").alias("sy"),
        F.sum("syy").cast(_DEC).alias("syy"),
        F.count("*").cast("long").alias("n_cells"),
    )
    ra = cells.groupBy("da").agg(
        F.sum("n").cast("long").alias("n"), F.sum("sy").cast("long").alias("sy")
    )
    rb = cells.groupBy("tb").agg(
        F.sum("n").cast("long").alias("n"), F.sum("sy").cast("long").alias("sy")
    )
    mean_term = F.col("sy").cast("double") * F.col("sy") / F.col("n")
    ra_s = ra.agg(
        F.sum(mean_term).alias("sa"), F.count("*").cast("long").alias("ka")
    )
    rb_s = rb.agg(
        F.sum(mean_term).alias("sb"), F.count("*").cast("long").alias("kb")
    )
    cells_s = cells.agg(F.sum(mean_term).alias("sc"))
    g = (
        tot.crossJoin(F.broadcast(ra_s))
        .crossJoin(F.broadcast(rb_s))
        .crossJoin(F.broadcast(cells_s))
    )
    grand = F.col("sy").cast("double") * F.col("sy") / F.col("n")
    ssa = F.col("sa") - grand
    ssb = F.col("sb") - grand
    ss_cells = F.col("sc") - grand
    sse = F.col("syy").cast("double") - F.col("sc")
    mse = sse / (F.col("n") - F.col("n_cells"))
    return g.select(
        F.col("n").alias("n_lines"),
        F.col("ka").alias("n_discount_levels"),
        F.col("kb").alias("n_tax_levels"),
        F.round(ssa, 2).alias("ss_discount"),
        F.round(ssb, 2).alias("ss_tax"),
        F.round(ss_cells - ssa - ssb, 2).alias("ss_interaction"),
        F.round(sse, 2).alias("ss_error"),
        F.round((ssa / (F.col("ka") - 1)) / mse, 6).alias("f_discount"),
        F.round((ssb / (F.col("kb") - 1)) / mse, 6).alias("f_tax"),
        F.round(
            ((ss_cells - ssa - ssb) / ((F.col("ka") - F.lit(1.0)) * (F.col("kb") - 1)))
            / mse,
            6,
        ).alias("f_interaction"),
    )
