"""Invariant tests for batch 54: cadence stats replayed from raw event
gaps, the sign-sketch audit checked against numpy-free python folds,
assortativity recomputed from the raw edge list, and the dispersion
screen checked against statistics.variance plus the zero-line law."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_cadence_replay(spark):
    rows = plans.REGISTRY["event_cadence_regularity"].build(spark, SF).collect()
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"]))
    got = {r["user_id"]: r for r in rows}
    import statistics

    checked = 0
    for u, evs in by_user.items():
        evs.sort()
        gaps = [
            (b[0] - a[0]).total_seconds() * 1e6 for a, b in zip(evs, evs[1:])
        ]
        if len(gaps) < 5:
            assert u not in got
            continue
        r = got[u]
        assert r["n_gaps"] == len(gaps)
        mu = statistics.mean(gaps)
        sd = statistics.stdev(gaps)
        assert abs(r["mean_gap_s"] - mu / 1e6) < 1e-3
        assert abs(r["cv_gap"] - sd / mu) < 1e-3
        assert abs(r["burstiness"] - (sd - mu) / (sd + mu)) < 1e-3
        if r["gap_lag1_autocorr"] is not None and len(gaps) >= 6:
            xs, ys = gaps[:-1], gaps[1:]
            n = len(xs)
            num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
            den = (n * sum(x * x for x in xs) - sum(xs) ** 2) * (
                n * sum(y * y for y in ys) - sum(ys) ** 2
            )
            if den > 0:
                assert abs(r["gap_lag1_autocorr"] - num / math.sqrt(den)) < 1e-3
        checked += 1
    assert checked > 10


def test_sign_sketch_audit(spark):
    rows = plans.REGISTRY["sign_sketch_hamming_audit"].build(spark, SF).collect()
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        if r["vec_id"] % 25 in (0, 7)
    }
    assert len(rows) > 100
    corr_vals = {r["hamming_cosine_corr"] for r in rows}
    assert len(corr_vals) == 1
    # negative correlation: more sign flips -> lower cosine
    assert rows[0]["hamming_cosine_corr"] < -0.5
    for r in rows[:50]:
        a, b = emb[r["id_1"]], emb[r["id_2"]]
        ham = sum(1 for x, y in zip(a, b) if (x > 0) != (y > 0))
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        assert r["hamming"] == ham
        assert abs(r["cosine_sim"] - dot / (na * nb)) < 5e-4
        assert abs(r["sketch_estimate"] - math.cos(math.pi * ham / 64)) < 5e-4


def test_assortativity_from_edges(spark):
    row = plans.REGISTRY["supplier_part_assortativity"].build(spark, SF).collect()[0]
    ed = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .collect()
    )
    ds: dict = {}
    dp: dict = {}
    for r in ed:
        ds[r["l_suppkey"]] = ds.get(r["l_suppkey"], 0) + 1
        dp[r["l_partkey"]] = dp.get(r["l_partkey"], 0) + 1
    xs = [ds[r["l_suppkey"]] for r in ed]
    ys = [dp[r["l_partkey"]] for r in ed]
    n = len(xs)
    assert row["n_edges"] == n
    assert abs(row["mean_supplier_degree"] - sum(xs) / n) < 1e-3
    assert abs(row["mean_part_degree"] - sum(ys) / n) < 1e-3
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = (n * sum(x * x for x in xs) - sum(xs) ** 2) * (
        n * sum(y * y for y in ys) - sum(ys) ** 2
    )
    assert abs(row["degree_assortativity"] - num / math.sqrt(den)) < 1e-6
    assert -1 <= row["degree_assortativity"] <= 1


def test_dispersion_includes_zero_line_orders(spark):
    rows = plans.REGISTRY["order_linecount_dispersion"].build(spark, SF).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    import statistics

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_orderkey")
        .count()
        .collect()
    )
    per_order = {r["l_orderkey"]: r["count"] for r in li}
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .collect()
    )
    by_prio: dict = {}
    for r in o:
        by_prio.setdefault(r["o_orderpriority"], []).append(
            per_order.get(r["o_orderkey"], 0)
        )
    for r in rows:
        vals = by_prio[r["priority"]]
        assert r["n_orders"] == len(vals)
        assert abs(r["mean_lines"] - statistics.mean(vals)) < 1e-3
        assert abs(r["var_lines"] - statistics.variance(vals)) < 1e-3
        assert abs(r["vmr"] - statistics.variance(vals) / statistics.mean(vals)) < 1e-3
