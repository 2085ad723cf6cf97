"""Invariant tests for batch 62: the 2-iteration EM replayed in python
from the same init, Hill/Weibull/VaR-ES against direct order-statistic
recomputes, plus the distributional laws each estimator must obey."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _order_cents(spark):
    return [
        r["v"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("v"))
        .collect()
    ]


def test_gmm_em_replay(spark):
    row = plans.REGISTRY["price_gmm2_em"].build(spark, SF).collect()[0]
    vs = sorted(_order_cents(spark))
    n = len(vs)
    import statistics

    mu1 = float(vs[(n + 3) // 4 - 1])  # min v with 4*cum >= n
    mu2 = float(vs[(3 * n + 3) // 4 - 1])
    sg = statistics.stdev(vs)
    pi1, sg1, sg2 = 0.5, sg, sg

    for it in range(2):
        n1 = s1 = q1 = n2 = s2 = q2 = 0.0
        for v in vs:
            w1 = pi1 * math.exp(-((v - mu1) ** 2) / (2 * sg1 * sg1)) / sg1
            w2 = (1 - pi1) * math.exp(-((v - mu2) ** 2) / (2 * sg2 * sg2)) / sg2
            r = w1 / (w1 + w2)
            n1 += r
            s1 += r * v
            q1 += r * v * v
            n2 += 1 - r
            s2 += (1 - r) * v
            q2 += (1 - r) * v * v
        pi1 = n1 / n
        mu1, mu2 = s1 / n1, s2 / n2
        sg1 = math.sqrt(q1 / n1 - mu1 * mu1)
        sg2 = math.sqrt(q2 / n2 - mu2 * mu2)
    assert row["n_orders"] == n
    assert abs(row["pi_1"] - pi1) < 1e-4
    assert abs(row["mu_1_dollars"] - mu1 / 100) < 0.05
    assert abs(row["mu_2_dollars"] - mu2 / 100) < 0.05
    assert abs(row["sigma_1_dollars"] - sg1 / 100) < 0.05
    assert abs(row["sigma_2_dollars"] - sg2 / 100) < 0.05
    # mixture laws: weights in (0,1), component 1 sits below component 2
    assert 0 < row["pi_1"] < 1
    assert row["mu_1_dollars"] < row["mu_2_dollars"]


def test_hill_estimator_replay(spark):
    row = plans.REGISTRY["price_hill_tail_index"].build(spark, SF).collect()[0]
    vs = sorted(_order_cents(spark), reverse=True)
    top = vs[:100]
    thresh = vs[100]
    h = sum(math.log(v) for v in top) / 100 - math.log(thresh)
    assert abs(row["hill_h"] - h) < 1e-5
    assert abs(row["tail_alpha"] - 1 / h) < 1e-2
    assert row["hill_h"] > 0


def test_weibull_fit_replay(spark):
    row = plans.REGISTRY["order_gap_weibull_fit"].build(spark, SF).collect()[0]
    o = sorted(
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey", F.col("o_orderdate").cast("date").alias("d"), "o_orderkey")
        .collect(),
        key=lambda r: (r["o_custkey"], r["d"], r["o_orderkey"]),
    )
    gaps = []
    prev = None
    for r in o:
        if prev is not None and prev["o_custkey"] == r["o_custkey"]:
            g = (r["d"] - prev["d"]).days
            if g >= 1:
                gaps.append(g)
        prev = r
    gaps.sort()
    n = len(gaps)
    xs = [math.log(g) for g in gaps]
    ys = [math.log(-math.log(1 - (i + 1) / (n + 1))) for i in range(n)]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    k = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    icept = (sy - k * sx) / n
    assert row["n_gaps"] == n
    assert abs(row["weibull_shape"] - k) < 1e-4
    assert abs(row["weibull_scale_days"] - math.exp(-icept / k)) < 0.05
    assert row["weibull_shape"] > 0 and row["weibull_scale_days"] > 0


def test_var_es_replay(spark):
    row = plans.REGISTRY["order_value_var_es"].build(spark, SF).collect()[0]
    vs = sorted(_order_cents(spark))
    n = len(vs)
    var_rank = (95 * n + 99) // 100
    var95 = vs[var_rank - 1]
    tail = vs[var_rank:]
    assert row["n_orders"] == n
    assert row["var95_cents"] == var95
    assert row["tail_n"] == len(tail)
    es = sum(tail) / len(tail)
    assert abs(row["es95_dollars"] - es / 100) < 0.02
    assert abs(row["es_to_var_ratio"] - es / var95) < 1e-5
    # coherence: ES >= VaR always
    assert row["es_to_var_ratio"] >= 1
