"""Invariant tests for batch 84: anisotropy + participation ratio vs
numpy eigen/pair replays, Inclan-Tiao vs a direct scan, Cucconi vs a
rank replay (plus scipy-free moment checks)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _q_matrix(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    return np.array(
        [[round(float(v) * 1_000_000) for v in r["embedding"]] for r in rows],
        dtype=np.float64,
    )


def test_anisotropy_replay(spark):
    row = plans.REGISTRY["embedding_anisotropy_audit"].build(spark, SF).collect()[0]
    q = _q_matrix(spark)
    n, d = q.shape
    s = q.sum(axis=0)
    t = (q * q).sum()
    u2 = (s * s).sum()
    aniso = (u2 - t) / ((n - 1.0) * t)
    # independent check: mean pairwise dot via the identity == direct numpy
    direct = (q @ q.T).sum() - np.einsum("ij,ij->", q, q)
    assert abs((u2 - t) - direct) < 1e-3 * abs(direct)
    assert row["n_vectors"] == n
    assert row["n_dims"] == d
    assert int(row["sum_sq_norms"]) == int(t)
    assert int(row["sum_vector_norm_sq"]) == int(u2)
    assert abs(row["anisotropy"] - aniso) < 1e-5
    assert abs(row["mean_direction_share"] - u2 / (n * t)) < 1e-5


def test_participation_ratio_replay(spark):
    row = plans.REGISTRY["embedding_participation_ratio"].build(spark, SF).collect()[0]
    q = _q_matrix(spark)
    n, d = q.shape
    m = n * (q.T @ q) - np.outer(q.sum(axis=0), q.sum(axis=0))
    tr = np.trace(m)
    frob2 = (m * m).sum()
    pr = tr * tr / frob2
    # eigen check: PR equals (sum lam)^2 / sum lam^2 of the covariance
    lam = np.linalg.eigvalsh(m)
    pr_eig = lam.sum() ** 2 / (lam * lam).sum()
    assert abs(pr - pr_eig) < 1e-6 * pr
    assert row["n_vectors"] == n
    assert row["n_dims"] == d
    assert abs(float(row["trace_scaled"]) - tr) < 1e-3 * abs(tr)
    assert abs(row["participation_ratio"] - pr) < 1e-3
    assert 1 <= row["participation_ratio"] <= d
    assert abs(row["effective_dim_share"] - pr / d) < 1e-5


def test_variance_changepoint_replay(spark):
    row = (
        plans.REGISTRY["daily_revenue_variance_changepoint"].build(spark, SF).collect()[0]
    )
    rows_d = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) as bigint)) DIV 100"
            ).alias("dollars")
        )
        .collect()
    )
    srt = sorted(rows_d, key=lambda r: r["d"])
    xs = [
        (srt[i]["d"], srt[i]["dollars"] - srt[i - 1]["dollars"])
        for i in range(1, len(srt))
    ]
    n = len(xs)
    cn = sum(x * x for _, x in xs)
    best = None
    ck = 0
    for k, (day, x) in enumerate(xs, start=1):
        ck += x * x
        absd = abs(ck / cn - k / n)
        if best is None or absd > best[0] + 1e-15:
            best = (absd, day, k)
    assert row["n_diffs"] == n
    assert row["changepoint_day"] == best[1]
    assert row["changepoint_k"] == best[2]
    assert abs(row["max_abs_d"] - best[0]) < 1e-5
    assert abs(row["it_stat"] - best[0] * math.sqrt(n / 2.0)) < 1e-4


def test_cucconi_replay(spark):
    row = plans.REGISTRY["segment_value_cucconi"].build(spark, SF).collect()[0]
    raw = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
        .select(
            "c_mktsegment",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    pooled = sorted(r["cents"] for r in raw)
    nn = len(pooled)
    first = {}
    cnt = defaultdict(int)
    for i, v in enumerate(pooled):
        if v not in first:
            first[v] = i + 1
        cnt[v] += 1
    sr2 = sc2 = 0
    n1 = 0
    for r in raw:
        if r["c_mktsegment"] != "AUTOMOBILE":
            continue
        n1 += 1
        r2 = 2 * first[r["cents"]] + cnt[r["cents"]] - 1
        sr2 += r2 * r2
        c2 = 2 * (nn + 1) - r2
        sc2 += c2 * c2
    mean = n1 * (nn + 1) * (2.0 * nn + 1)
    den = math.sqrt(n1 * (nn - n1) * (nn + 1) * (2.0 * nn + 1) * (8.0 * nn + 11) / 5.0)
    u = (6.0 * sr2 / 4.0 - mean) / den
    v = (6.0 * sc2 / 4.0 - mean) / den
    rho = 2.0 * (nn * float(nn) - 4.0) / ((2.0 * nn + 1) * (8.0 * nn + 11.0)) - 1.0
    cstat = (u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho))
    assert row["n_total"] == nn
    assert row["n_auto"] == n1
    assert row["n_house"] == nn - n1
    assert abs(row["u_stat"] - u) < 1e-4
    assert abs(row["v_stat"] - v) < 1e-4
    assert abs(row["rho"] - rho) < 1e-6
    assert abs(row["cucconi_c"] - cstat) < 1e-3
    assert row["cucconi_c"] >= 0
    assert -1 < row["rho"] < 0
