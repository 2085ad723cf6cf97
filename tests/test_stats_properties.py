"""Seeded randomized cross-checks for the statistical-audit queries:
each Spark closed-form result is recomputed from first principles
(numpy / brute force) on small random frames — the same style as
tests/test_graph_properties.py."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Window


def test_gini_matches_mean_absolute_difference_definition(spark):
    """The rank-sum Gini formula equals the canonical MAD definition
    Σ|xi−xj| / (2n²μ) on random integer data (3 seeds)."""
    for seed in (7, 19, 23):
        rng = np.random.default_rng(seed)
        xs = rng.integers(0, 10_000, size=rng.integers(3, 40)).tolist()
        df = spark.createDataFrame(
            [(1, i, int(x)) for i, x in enumerate(xs)],
            "nationkey int, custkey int, cents long",
        )
        w = Window.partitionBy("nationkey").orderBy("cents", "custkey")
        ranked = df.select("cents", F.row_number().over(w).cast("long").alias("rnk"))
        s = ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total"),
            F.sum(F.col("rnk") * F.col("cents")).alias("weighted"),
        ).first()
        got = (2.0 * s["weighted"] - (s["n"] + 1.0) * s["total"]) / (s["n"] * s["total"])

        arr = np.array(xs, dtype=np.float64)
        mad = np.abs(arr[:, None] - arr[None, :]).sum()
        want = mad / (2.0 * len(arr) ** 2 * arr.mean())
        assert abs(got - want) < 1e-9, (seed, got, want)


def test_acf_matches_numpy_corrcoef(spark, sf_oracle):
    """The integer-sufficient-statistics ACF equals numpy's Pearson r
    on the same weekly series."""
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational15 import (
        weekly_revenue_acf,
    )
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t

    got = {r["lag"]: r["acf"] for r in weekly_revenue_acf(spark, sf_oracle).collect()}

    o = _t(spark, sf_oracle, "orders")
    weekly = (
        o.select(
            F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("week_start")
        .agg(F.expr("sum(cents) DIV 100").alias("dollars"))
        .orderBy("week_start")
        .collect()
    )
    series = np.array([r["dollars"] for r in weekly], dtype=np.float64)
    for k in (1, 2, 3, 4):
        want = np.corrcoef(series[:-k], series[k:])[0, 1]
        assert abs(got[k] - round(want, 6)) <= 1e-6, (k, got[k], want)


def test_independence_devn_is_scaled_chisq_numerator(spark, sf_oracle):
    """Reconstructing chi-square from the integer dev_n output equals
    scipy-free direct computation from the observed table."""
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational15 import (
        priority_status_independence,
    )

    rows = priority_status_independence(spark, sf_oracle).collect()
    n = sum(r["observed"] for r in rows)
    chi_from_devn = sum(
        (r["dev_n"] / n) ** 2 / (r["row_total"] * r["col_total"] / n)
        for r in rows
    )
    chi_direct = sum(
        (r["observed"] - r["row_total"] * r["col_total"] / n) ** 2
        / (r["row_total"] * r["col_total"] / n)
        for r in rows
    )
    assert abs(chi_from_devn - chi_direct) < 1e-9


def test_cusum_windows_equal_sequential_fold(spark, sf_oracle):
    """The two-window closed form S_t = P_t - min(0, min_j P_j) must
    reproduce the textbook sequential clamp S_t = max(0, S_{t-1}+d_t)
    exactly (integers, so equality is bitwise)."""
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational15 import (
        weekly_revenue_cusum,
    )

    rows = sorted(
        weekly_revenue_cusum(spark, sf_oracle).collect(), key=lambda r: r["week_start"]
    )
    dollars = [r["dollars"] for r in rows]
    mu = sum(dollars) // len(dollars)
    k = mu // 20
    s_up = s_dn = 0
    for r, x in zip(rows, dollars):
        s_up = max(0, s_up + (x - mu - k))
        s_dn = max(0, s_dn + (mu - k - x))
        assert r["cusum_up"] == s_up and r["cusum_down"] == s_dn, r
        assert r["alarm"] == (s_up > mu // 2 or s_dn > mu // 2), r
