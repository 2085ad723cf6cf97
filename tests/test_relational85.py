"""Invariant tests for batch 85: Fano/Allan vs a densified Counter
replay, extremal index vs a direct cluster scan, Lorenz asymmetry vs
sorted replay, gamma/Somers vs an O(cells^2) pair count."""

from __future__ import annotations

from collections import Counter, defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans
from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import events as _events

SF = "/root/testdata/sf0.01"


def _daily_dollars(spark):
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) as bigint)) DIV 100"
            ).alias("dollars")
        )
        .collect()
    )
    return sorted((r["d"], r["dollars"]) for r in rows)


def test_fano_allan_replay(spark):
    rows = plans.REGISTRY["hourly_event_dispersion"].build(spark, SF).collect()
    ev = (
        _events(spark, SF)
        .select(
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp)) DIV 3600000000").alias("h"),
        )
        .collect()
    )
    h0 = min(r["h"] for r in ev)
    h1 = max(r["h"] for r in ev)
    per = defaultdict(Counter)
    for r in ev:
        per[r["event_type"]][r["h"]] += 1
    assert len(rows) == len(per)
    for row in rows:
        cs = [per[row["event_type"]].get(h, 0) for h in range(h0, h1 + 1)]
        n = len(cs)
        tot = sum(cs)
        mean = tot / n
        var = (n * sum(c * c for c in cs) - tot * tot) / (n * (n - 1))
        allan = sum(
            (cs[i + 1] - cs[i]) ** 2 for i in range(n - 1)
        ) / (2.0 * (n - 1))
        assert row["n_hours"] == n
        assert row["n_events"] == tot
        assert abs(row["fano_factor"] - var / mean) < 1e-4
        assert abs(row["allan_ratio"] - allan / mean) < 1e-4
        assert row["fano_factor"] > 0


def test_extremal_index_replay(spark):
    row = plans.REGISTRY["daily_revenue_extremal_index"].build(spark, SF).collect()[0]
    daily = _daily_dollars(spark)
    vals = sorted(v for _, v in daily)
    n = len(vals)
    import math

    u = vals[math.ceil(0.95 * n) - 1]
    exc = [d for d, v in daily if v > u]
    clusters = sum(
        1
        for i, d in enumerate(exc)
        if i == 0 or (d - exc[i - 1]).days > 2
    )
    assert row["n_days"] == n
    assert row["threshold_dollars"] == u
    assert row["n_exceed"] == len(exc)
    assert row["n_clusters"] == clusters
    assert abs(row["extremal_index"] - clusters / len(exc)) < 1e-5
    assert 0 < row["extremal_index"] <= 1


def test_lorenz_asymmetry_replay(spark):
    row = (
        plans.REGISTRY["customer_spend_lorenz_asymmetry"].build(spark, SF).collect()[0]
    )
    cents = [
        r["cents"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "cast(sum(cast(round(o_totalprice * 100) as bigint)) as long)"
            ).alias("cents")
        )
        .collect()
    ]
    n = len(cents)
    total = sum(cents)
    below = [c for c in cents if c * n < total]
    s = len(below) / n + sum(below) / total
    assert row["n_customers"] == n
    assert row["total_cents"] == total
    assert row["n_below_mean"] == len(below)
    assert abs(row["lorenz_asymmetry"] - s) < 1e-5
    assert 0 < row["lorenz_asymmetry"] < 2


def test_ordinal_assoc_replay(spark):
    row = (
        plans.REGISTRY["priority_discount_ordinal_assoc"].build(spark, SF).collect()[0]
    )
    raw = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet").select(
                "o_orderkey", "o_orderpriority"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "o_orderpriority",
            F.round(F.col("l_discount") * 100).cast("long").alias("y"),
        )
        .collect()
    )
    cells: Counter = Counter((r["o_orderpriority"], r["y"]) for r in raw)
    items = list(cells.items())
    c2 = d2 = tx2 = 0
    for (x1, y1), n1 in items:
        for (x2, y2), n2 in items:
            if (x1 < x2 and y1 < y2) or (x1 > x2 and y1 > y2):
                c2 += n1 * n2
            elif (x1 < x2 and y1 > y2) or (x1 > x2 and y1 < y2):
                d2 += n1 * n2
            elif x1 == x2 and y1 != y2:
                tx2 += n1 * n2
    gamma = (c2 - d2) / (c2 + d2)
    somers = (c2 - d2) / (c2 + d2 + tx2)
    assert int(row["concordant_x2"]) == c2
    assert int(row["discordant_x2"]) == d2
    assert int(row["tied_x_only_x2"]) == tx2
    assert abs(row["gk_gamma"] - gamma) < 1e-5
    assert abs(row["somers_d_y_given_x"] - somers) < 1e-5
    assert -1 <= row["gk_gamma"] <= 1
    assert abs(row["somers_d_y_given_x"]) <= abs(row["gk_gamma"]) + 1e-9
