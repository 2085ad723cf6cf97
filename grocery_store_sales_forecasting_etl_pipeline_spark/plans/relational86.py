"""Round-6 additions, batch 86: series complexity, forensic digits,
robust effect size, and spectral flatness — sample entropy of weekly
revenue (the template-matching regularity measure: how predictable is
next week given the last two, with a data-driven integer tolerance —
the complement of permutation entropy, which sees only ORDER
patterns), the Benford SECOND-digit audit of order values (the
forensic test auditors actually use for price-setting/rounding
manipulation — first digits survive many manipulations that second
digits don't), the Hodges-Lehmann estimator of the year-over-year
weekly revenue shift (the median of Walsh averages — the EFFECT SIZE
companion to batch 83's Wilcoxon signed-rank TEST, robust to any
outlier week), and the spectral entropy of weekly revenue (how
concentrated the periodogram is: 0 = one pure cycle, 1 = white noise
— the single-number summary of weekly_revenue_periodogram's table).

Determinism discipline: the sample-entropy tolerance is the exact
lower median of consecutive |changes| (integer order statistic);
template match counts are exact integers off an integer-indexed
self-join; second digits come from string position 2 of the integer
cents (no float log10 binning); Walsh medians select integer order
statistics on doubled sums; trig/ln terms follow the documented
libm-exception policy with one rounding per output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register

_WEEKLY_CTE = """
WITH weekly AS (
  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS dollars
  FROM orders GROUP BY week_start
)"""


def _weekly_dollars(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("week_start")
        .agg(F.expr("sum(cents) DIV 100").alias("dollars"))
    )


# ---------------------------------------------------------------------------
# Sample entropy (m = 2) of weekly revenue
# ---------------------------------------------------------------------------

_SAMPEN_ORACLE = _WEEKLY_CTE + """,
idx AS (
  SELECT dollars AS x,
         CAST(row_number() OVER (ORDER BY week_start) AS BIGINT) AS i,
         lead(dollars, 1) OVER (ORDER BY week_start) AS x1,
         lead(dollars, 2) OVER (ORDER BY week_start) AS x2
  FROM weekly
),
dv AS (
  SELECT abs(x1 - x) AS ad, CAST(count(*) AS BIGINT) AS c
  FROM idx WHERE x1 IS NOT NULL GROUP BY ad
),
dcw AS (
  SELECT ad,
         CAST(sum(c) OVER (ORDER BY ad
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(c) OVER () AS BIGINT) AS m
  FROM dv
),
tol AS (SELECT min(CASE WHEN 2 * cum >= m THEN ad END) AS r FROM dcw),
tpl AS (SELECT i, x, x1, x2 FROM idx WHERE x2 IS NOT NULL),
cnt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tpl,
         CAST(sum(CASE WHEN greatest(abs(a.x - b.x), abs(a.x1 - b.x1)) <= t.r
                  THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt,
         CAST(sum(CASE WHEN greatest(abs(a.x - b.x), abs(a.x1 - b.x1),
                                     abs(a.x2 - b.x2)) <= t.r
                  THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt
  FROM tpl a JOIN tpl b ON a.i < b.i CROSS JOIN tol t
)
SELECT (SELECT max(m) FROM dcw) + 1 AS n_weeks,
       (SELECT r FROM tol) AS tolerance_dollars,
       c.b_cnt AS m2_matches, c.a_cnt AS m3_matches,
       round(-ln(CAST(c.a_cnt AS DOUBLE) / c.b_cnt), 6) AS sample_entropy
FROM cnt c
"""


@register("weekly_revenue_sample_entropy", oracle=_SAMPEN_ORACLE, tags=("timeseries", "stats"))
def weekly_revenue_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample entropy (m = 2) of weekly revenue: count template pairs
    whose 2-week patterns stay within tolerance r (Chebyshev), count
    how many of those remain matched at 3 weeks, and report
    −ln(A/B) — low SampEn = the series repeats its own patterns
    (predictable), high = each window is novel. The tolerance is the
    exact lower median of consecutive |weekly changes|, so the
    statistic is self-scaling and fully reproducible (no 0.2·σ float
    convention). Complements weekly_revenue_permutation_entropy: that
    sees only rank ORDER, this sees magnitudes.

    Determinism: r is an integer order statistic off the |Δ|
    value-count frame; both match counts are exact integers over the
    i<j indexed self-join (both template sets truncated to i ≤ n−2 so
    A ⊆ B and SampEn ≥ 0 exactly); one ln at the boundary.

    Scale notes: the weekly fold is map-side; the O(n²) template join
    runs on the calendar-bounded frame (hundreds of rows), never the
    fact table.
    """
    weekly = _weekly_dollars(spark, sf_dir)
    w = Window.orderBy("week_start")
    idx = weekly.select(
        F.col("dollars").alias("x"),
        F.row_number().over(w).cast("long").alias("i"),
        F.lead("dollars", 1).over(w).alias("x1"),
        F.lead("dollars", 2).over(w).alias("x2"),
    ).localCheckpoint(eager=False)
    dv = (
        idx.filter(F.col("x1").isNotNull())
        .select(F.abs(F.col("x1") - F.col("x")).alias("ad"))
        .groupBy("ad")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w_cum = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    dcw = dv.select(
        "ad",
        F.sum("c").over(w_cum).cast("long").alias("cum"),
        F.sum("c").over(w_all).cast("long").alias("m"),
    ).localCheckpoint(eager=False)
    tol = dcw.agg(
        F.min(F.when(F.lit(2) * F.col("cum") >= F.col("m"), F.col("ad"))).alias("r")
    )
    nw = dcw.agg((F.max("m") + 1).cast("long").alias("n_weeks"))
    tpl = idx.filter(F.col("x2").isNotNull())
    a = tpl.alias("a")
    b = tpl.alias("b")
    m2 = F.greatest(
        F.abs(F.col("a.x") - F.col("b.x")), F.abs(F.col("a.x1") - F.col("b.x1"))
    )
    m3 = F.greatest(
        F.abs(F.col("a.x") - F.col("b.x")),
        F.abs(F.col("a.x1") - F.col("b.x1")),
        F.abs(F.col("a.x2") - F.col("b.x2")),
    )
    cnt = (
        a.join(b, F.col("a.i") < F.col("b.i"))
        .crossJoin(F.broadcast(tol))
        .agg(
            F.sum(F.when(m2 <= F.col("r"), 1).otherwise(0)).cast("long").alias("b_cnt"),
            F.sum(F.when(m3 <= F.col("r"), 1).otherwise(0)).cast("long").alias("a_cnt"),
            F.max("r").alias("r"),
        )
    )
    return cnt.crossJoin(F.broadcast(nw)).select(
        "n_weeks",
        F.col("r").alias("tolerance_dollars"),
        F.col("b_cnt").alias("m2_matches"),
        F.col("a_cnt").alias("m3_matches"),
        F.round(
            -F.log(F.col("a_cnt").cast("double") / F.col("b_cnt")), 6
        ).alias("sample_entropy"),
    )


# ---------------------------------------------------------------------------
# Benford second-digit audit of order values
# ---------------------------------------------------------------------------

_BENFORD2_ORACLE = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
  WHERE round(o_totalprice * 100) >= 10
),
obs AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 2, 1) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM c GROUP BY d
),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
digits AS (SELECT unnest(range(0, 10)) AS d),
ks AS (SELECT unnest(range(1, 10)) AS k),
expected AS (
  SELECT digits.d,
         sum(ln(1.0 + 1.0 / (10.0 * ks.k + digits.d)) / ln(10.0)) AS p
  FROM digits CROSS JOIN ks GROUP BY digits.d
),
j AS (
  SELECT e.d, coalesce(o.n_obs, 0) AS n_obs, e.p, t.n
  FROM expected e LEFT JOIN obs o ON o.d = e.d CROSS JOIN tot t
)
SELECT d AS digit, n_obs,
       round(p, 6) AS expected_share,
       round(CAST(n_obs AS DOUBLE) / n, 6) AS observed_share,
       round((n_obs - n * p) * (n_obs - n * p) / (n * p), 6) AS chi2_contrib
FROM j
"""


@register("order_value_benford_second_digit", oracle=_BENFORD2_ORACLE, tags=("audit", "stats"))
def order_value_benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford SECOND-digit audit of order values in cents: observed
    vs expected share for digits 0–9, where P(d) = Σ_{k=1..9}
    log₁₀(1 + 1/(10k+d)) — a gently decreasing 12%→8.5% profile.
    Second digits are the forensic auditor's workhorse: price points
    and psychological endings distort them in ways that leave first
    digits (benford_first_digit_audit) untouched. Each row carries its
    χ² contribution; Σ over the 10 rows tests at 9 df.

    Determinism: the second digit is character 2 of the integer cents
    rendered as a string — no float log binning; expected shares are
    the same 9-term ln-ratio fold on both engines (libm-exception
    policy, 6dp); counts exact, three divisions per row.

    Scale notes: one orders scan folding map-side onto ≤ 10 groups;
    the expected-share frame is constant-size.
    """
    c = (
        _t(spark, sf_dir, "orders")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
        .filter(F.col("cents") >= 10)
    )
    obs = c.select(
        F.substring(F.col("cents").cast("string"), 2, 1).cast("long").alias("d")
    ).groupBy("d").agg(F.count("*").cast("long").alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    digits = spark.range(0, 10).select(F.col("id").alias("d"))
    ks = spark.range(1, 10).select(F.col("id").alias("k"))
    expected = (
        digits.crossJoin(ks)
        .groupBy("d")
        .agg(
            F.sum(
                F.log(F.lit(1.0) + F.lit(1.0) / (F.lit(10.0) * F.col("k") + F.col("d")))
                / F.log(F.lit(10.0))
            ).alias("p")
        )
    )
    j = (
        expected.join(obs, "d", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "d",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
            "p",
            "n",
        )
    )
    dev = F.col("n_obs") - F.col("n") * F.col("p")
    return j.select(
        F.col("d").alias("digit"),
        "n_obs",
        F.round("p", 6).alias("expected_share"),
        F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias("observed_share"),
        F.round(dev * dev / (F.col("n") * F.col("p")), 6).alias("chi2_contrib"),
    )


# ---------------------------------------------------------------------------
# Hodges-Lehmann estimator of the YoY weekly revenue shift
# ---------------------------------------------------------------------------

_HL_ORACLE = _WEEKLY_CTE + """,
diffs AS (
  SELECT b.dollars - a.dollars AS d,
         CAST(row_number() OVER (ORDER BY a.week_start) AS BIGINT) AS i
  FROM weekly a JOIN weekly b ON b.week_start = a.week_start + INTERVAL 364 DAY
),
walsh AS (
  SELECT a.d + b.d AS w2
  FROM diffs a JOIN diffs b ON a.i <= b.i
),
v AS (SELECT w2, CAST(count(*) AS BIGINT) AS c FROM walsh GROUP BY w2),
cw AS (
  SELECT w2,
         CAST(sum(c) OVER (ORDER BY w2
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(c) OVER () AS BIGINT) AS m
  FROM v
),
med AS (
  SELECT min(CASE WHEN 2 * cum >= m THEN w2 END) AS hl2, max(m) AS n_walsh
  FROM cw
),
pos AS (
  SELECT CAST(count(*) AS BIGINT) AS n_diffs,
         CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
  FROM diffs
)
SELECT pos.n_diffs, med.n_walsh, pos.n_pos,
       round(med.hl2 / 2.0, 1) AS hl_shift_dollars
FROM med CROSS JOIN pos
"""


@register("weekly_yoy_hodges_lehmann", oracle=_HL_ORACLE, tags=("stats",))
def weekly_yoy_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann estimator of the year-over-year weekly revenue
    shift: the median of all Walsh averages (dᵢ+dⱼ)/2 over the YoY
    paired differences (week vs week+364 days). THE robust effect
    size that goes with batch 83's Wilcoxon signed-rank test — it
    estimates the same location the test tests, with 95.5% Gaussian
    efficiency and total immunity to a single promo-week outlier that
    would drag the plain mean shift arbitrarily.

    Determinism: Walsh sums stay doubled integers (dᵢ+dⱼ — never /2
    per pair); the median is the exact lower order statistic off the
    doubled-sum value-count frame; one /2.0 at the boundary.

    Scale notes: the O(n²) Walsh join runs on the calendar-bounded
    diff frame (hundreds of rows → tens of thousands of pairs); the
    fact table is touched once, map-side.
    """
    weekly = _weekly_dollars(spark, sf_dir).localCheckpoint(eager=False)
    a = weekly.alias("a")
    b = weekly.alias("b")
    w = Window.orderBy("aws")
    diffs = (
        a.join(b, F.col("b.week_start") == F.date_add(F.col("a.week_start"), 364))
        .select(
            (F.col("b.dollars") - F.col("a.dollars")).alias("d"),
            F.col("a.week_start").alias("aws"),
        )
        .select("d", F.row_number().over(w).cast("long").alias("i"))
        .localCheckpoint(eager=False)
    )
    da = diffs.alias("da")
    db = diffs.alias("db")
    walsh = da.join(db, F.col("da.i") <= F.col("db.i")).select(
        (F.col("da.d") + F.col("db.d")).alias("w2")
    )
    v = walsh.groupBy("w2").agg(F.count("*").cast("long").alias("c"))
    w_cum = Window.orderBy("w2").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    cw = v.select(
        "w2",
        F.sum("c").over(w_cum).cast("long").alias("cum"),
        F.sum("c").over(w_all).cast("long").alias("m"),
    )
    med = cw.agg(
        F.min(F.when(F.lit(2) * F.col("cum") >= F.col("m"), F.col("w2"))).alias("hl2"),
        F.max("m").alias("n_walsh"),
    )
    pos = diffs.agg(
        F.count("*").cast("long").alias("n_diffs"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast("long").alias("n_pos"),
    )
    return med.crossJoin(F.broadcast(pos)).select(
        "n_diffs",
        "n_walsh",
        "n_pos",
        F.round(F.col("hl2") / F.lit(2.0), 1).alias("hl_shift_dollars"),
    )


# ---------------------------------------------------------------------------
# Spectral entropy of weekly revenue
# ---------------------------------------------------------------------------

_SPECENT_ORACLE = _WEEKLY_CTE + """,
idx AS (
  SELECT dollars,
         CAST(row_number() OVER (ORDER BY week_start) AS BIGINT) - 1 AS t,
         CAST(count(*) OVER () AS BIGINT) AS n,
         CAST(sum(dollars) OVER () AS HUGEINT) AS s_all
  FROM weekly
),
ks AS (SELECT unnest(range(1, 27)) AS k),
terms AS (
  SELECT ks.k, idx.n,
         (CAST(idx.dollars AS DOUBLE) - CAST(idx.s_all AS DOUBLE) / idx.n)
           * cos(2 * pi() * ks.k * idx.t / idx.n) AS ct,
         (CAST(idx.dollars AS DOUBLE) - CAST(idx.s_all AS DOUBLE) / idx.n)
           * sin(2 * pi() * ks.k * idx.t / idx.n) AS st
  FROM idx CROSS JOIN ks
),
power AS (
  SELECT k, any_value(n) AS n, sum(ct) AS c, sum(st) AS s
  FROM terms GROUP BY k
),
rel AS (
  SELECT k, n,
         (c * c + s * s) / sum(c * c + s * s) OVER () AS share
  FROM power
),
ent AS (
  SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS kk,
         sum(CASE WHEN share > 0 THEN -share * ln(share) ELSE 0.0 END) AS h,
         max(share) AS max_share
  FROM rel
)
SELECT n AS n_weeks, kk AS n_harmonics,
       round(h, 4) AS spectral_entropy_nats,
       round(h / ln(CAST(kk AS DOUBLE)), 4) AS spectral_flatness,
       round(max_share, 4) AS dominant_share
FROM ent
"""


@register("weekly_revenue_spectral_entropy", oracle=_SPECENT_ORACLE, tags=("timeseries",))
def weekly_revenue_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy of weekly revenue over harmonics k = 1…26
    (periods down to two weeks): the Shannon entropy of the normalized
    periodogram, scaled by ln K into a 0–1 flatness score. Near 0 =
    revenue is one clean cycle (the dominant_share row says which
    share it holds); near 1 = white-noise-flat spectrum with nothing
    to forecast from seasonality. The single-number summary of
    weekly_revenue_periodogram's 8-row table, over a wider band —
    what a forecast-method router reads to choose seasonal vs plain
    models.

    Determinism: trig terms use libm cos/sin on exact integer
    arguments (the relational58 periodogram convention and its
    documented libm-exception policy); shares normalize once; the
    entropy fold rounds at 4dp where cross-engine fold noise (1e-16)
    is invisible.

    Scale notes: the weekly fold is map-side; the K×n term frame is
    calendar-bounded (26 × hundreds of rows).
    """
    weekly = _weekly_dollars(spark, sf_dir)
    w_ord = Window.orderBy("week_start")
    w_all = Window.partitionBy()
    idx = weekly.select(
        "dollars",
        (F.row_number().over(w_ord) - 1).cast("long").alias("t"),
        F.count("*").over(w_all).cast("long").alias("n"),
        F.sum("dollars").over(w_all).cast("decimal(38,0)").alias("s_all"),
    )
    ks = spark.range(1, 27).select(F.col("id").alias("k"))
    centered = F.col("dollars").cast("double") - F.col("s_all").cast("double") / F.col("n")
    ang = (
        F.lit(2.0)
        * F.lit(3.141592653589793)
        * F.col("k")
        * F.col("t")
        / F.col("n")
    )
    terms = idx.crossJoin(F.broadcast(ks)).select(
        "k",
        "n",
        (centered * F.cos(ang)).alias("ct"),
        (centered * F.sin(ang)).alias("st"),
    )
    power = terms.groupBy("k").agg(
        F.any_value(F.col("n")).alias("n"),
        F.sum("ct").alias("c"),
        F.sum("st").alias("s"),
    )
    w_norm = Window.partitionBy()
    pw = F.col("c") * F.col("c") + F.col("s") * F.col("s")
    rel = power.select(
        "k", "n", (pw / F.sum(pw).over(w_norm)).alias("share")
    )
    ent = rel.agg(
        F.max("n").alias("n"),
        F.count("*").cast("long").alias("kk"),
        F.sum(
            F.when(F.col("share") > 0, -F.col("share") * F.log(F.col("share"))).otherwise(
                0.0
            )
        ).alias("h"),
        F.max("share").alias("max_share"),
    )
    return ent.select(
        F.col("n").alias("n_weeks"),
        F.col("kk").alias("n_harmonics"),
        F.round("h", 4).alias("spectral_entropy_nats"),
        F.round(F.col("h") / F.log(F.col("kk").cast("double")), 4).alias(
            "spectral_flatness"
        ),
        F.round("max_share", 4).alias("dominant_share"),
    )
