"""Invariant tests for batch 59: baseline forecasts replayed from the
raw weekly series (MASE of naive == 1 by construction), Hurst R/S
against a python block replay + sanity bounds, Lorenz laws (monotone,
convex, ends at 1), and price endings against a python mod fold."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _weekly_dollars(spark):
    return [
        r["d"]
        for r in sorted(
            spark.read.parquet(f"{SF}/orders.parquet")
            .groupBy(F.date_trunc("week", "o_orderdate").cast("date").alias("w"))
            .agg(
                (
                    F.floor(
                        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100
                    )
                ).alias("d")
            )
            .collect(),
            key=lambda r: r["w"],
        )
    ]


def test_baselines_replay_and_mase_law(spark):
    rows = {r["method"]: r for r in
            plans.REGISTRY["weekly_forecast_baselines"].build(spark, SF).collect()}
    ys = _weekly_dollars(spark)
    n = len(ys)
    evals = {m: [] for m in ("naive", "seasonal_naive_4", "drift")}
    for t in range(5, n + 1):
        y = ys[t - 1]
        y1, y4 = ys[t - 2], ys[t - 5]
        drift = y1 + (y1 - ys[0]) / (t - 2)
        evals["naive"].append(abs(y - y1))
        evals["seasonal_naive_4"].append(abs(y - y4))
        evals["drift"].append(abs(y - drift))
    for m, errs in evals.items():
        r = rows[m]
        assert r["n_evals"] == len(errs)
        assert abs(r["mae"] - sum(errs) / len(errs)) < 0.01
    # MASE of the naive itself is exactly 1
    assert abs(rows["naive"]["mase_vs_naive"] - 1.0) < 1e-9
    for r in rows.values():
        assert r["rmse"] >= r["mae"] - 1e-9  # QM >= AM on |e|


def test_hurst_block_replay(spark):
    rows = sorted(
        plans.REGISTRY["weekly_revenue_hurst"].build(spark, SF).collect(),
        key=lambda r: r["block_size"],
    )
    ys = _weekly_dollars(spark)
    n = len(ys)
    import statistics

    pts = []
    for s in (8, 16, 32, 64):
        nb = n // s
        rss = []
        for b in range(nb):
            blk = ys[b * s : (b + 1) * s]
            mu = sum(blk) / s
            cum, dev = 0.0, []
            for v in blk:
                cum += v - mu
                dev.append(cum)
            rng = max(dev) - min(dev)
            sd = math.sqrt(sum((v - mu) ** 2 for v in blk) / s)
            rss.append(rng / sd)
        pts.append((s, nb, sum(rss) / len(rss)))
    got = {r["block_size"]: r for r in rows}
    for s, nb, avg in pts:
        assert got[s]["n_blocks"] == nb
        assert abs(got[s]["avg_rescaled_range"] - avg) < 1e-4
    xs = [math.log(s) for s, _, _ in pts]
    yv = [math.log(a) for _, _, a in pts]
    k = len(xs)
    slope = (k * sum(x * y for x, y in zip(xs, yv)) - sum(xs) * sum(yv)) / (
        k * sum(x * x for x in xs) - sum(xs) ** 2
    )
    assert abs(rows[0]["hurst_exponent"] - slope) < 1e-4
    assert len({r["hurst_exponent"] for r in rows}) == 1
    # R/S Hurst estimates live in (0, 1.2) for any real series
    assert 0 < rows[0]["hurst_exponent"] < 1.2


def test_lorenz_laws(spark):
    rows = sorted(
        plans.REGISTRY["revenue_lorenz_deciles"].build(spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["cum_revenue_share"] for r in rows]
    # monotone, below the diagonal, ends at 1
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) < 1e-9
    for r in rows:
        assert r["cum_revenue_share"] <= r["decile"] / 10 + 1e-9
        assert abs(
            r["lorenz_gap"] - (r["decile"] / 10 - r["cum_revenue_share"])
        ) < 2e-6
    # convexity: increments non-decreasing (poorest decile adds least)
    inc = [b - a for a, b in zip([0.0] + shares, shares)]
    assert all(x <= y + 1e-6 for x, y in zip(inc, inc[1:]))


def test_price_endings_replay(spark):
    rows = plans.REGISTRY["price_ending_audit"].build(spark, SF).collect()
    p = (
        spark.read.parquet(f"{SF}/part.parquet")
        .select(
            (F.round(F.col("p_retailprice") * 100).cast("long") % 100).alias("e")
        )
        .collect()
    )
    cnt: dict = {}
    for r in p:
        cnt[r["e"]] = cnt.get(r["e"], 0) + 1
    tot = len(p)
    nines = sum(v for k, v in cnt.items() if k % 10 == 9)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = sorted(rows, key=lambda r: r["rnk"])
    assert [(r["ending"], r["n"]) for r in got] == top
    for r in rows:
        assert abs(r["share"] - r["n"] / tot) < 1e-6
        assert abs(r["nine_ending_share"] - nines / tot) < 1e-6
