"""Invariant tests for batch 76: all four embedding-eval queries
replayed in numpy on the same 1e-6 quantized grid."""

from __future__ import annotations

import numpy as np

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _load(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    q = np.array(
        [[round(float(v) * 1_000_000) for v in r["embedding"]] for r in rows],
        dtype=np.int64,
    )
    return ids, labels, q


def test_1nn_accuracy_replay(spark):
    rows = plans.REGISTRY["embedding_1nn_label_accuracy"].build(spark, SF).collect()
    ids, labels, q = _load(spark)
    n = len(ids)
    d2 = ((q[:, None, :].astype(object) - q[None, :, :]) ** 2).sum(axis=2)
    correct = {}
    count = {}
    for i in range(n):
        best = None
        for j in range(n):
            if j == i:
                continue
            key = (d2[i][j], ids[j])
            if best is None or key < best[0]:
                best = (key, labels[j])
        count[labels[i]] = count.get(labels[i], 0) + 1
        if best[1] == labels[i]:
            correct[labels[i]] = correct.get(labels[i], 0) + 1
    assert len(rows) == len(count)
    for r in rows:
        lab = r["label"]
        assert r["n_vectors"] == count[lab]
        assert r["n_correct"] == correct.get(lab, 0)
        assert abs(r["loo_1nn_accuracy"] - correct.get(lab, 0) / count[lab]) < 1e-5


def test_fisher_screen_replay(spark):
    rows = plans.REGISTRY["embedding_fisher_screen"].build(spark, SF).collect()
    _, labels, q = _load(spark)
    n, dims = q.shape
    klabels = sorted(set(labels))
    kk = len(klabels)
    stats = {}
    for d in range(dims):
        col = q[:, d].astype(float)
        gm = col.mean()
        within = sum(
            ((col[labels == k] - col[labels == k].mean()) ** 2).sum()
            for k in klabels
        )
        between = sum(
            (labels == k).sum() * (col[labels == k].mean() - gm) ** 2
            for k in klabels
        )
        f = (between / (kk - 1)) / (within / (n - kk)) if within > 0 else None
        stats[d] = (between, within, f)
    ranked = sorted(
        stats.items(),
        key=lambda kv: (-(kv[1][2] if kv[1][2] is not None else -1e18), kv[0]),
    )[:10]
    assert len(rows) == 10
    by_rank = {r["rnk"]: r for r in rows}
    for i, (d, (between, within, f)) in enumerate(ranked, 1):
        r = by_rank[i]
        assert r["dim"] == d
        assert abs(r["between_ss"] - between) < max(1.0, between * 1e-6)
        assert abs(r["within_ss"] - within) < max(1.0, within * 1e-6)
        if f is not None:
            assert abs(r["fisher_f"] - f) < max(1e-3, f * 1e-4)


def test_centroid_silhouette_replay(spark):
    rows = plans.REGISTRY["embedding_centroid_silhouette"].build(spark, SF).collect()
    _, labels, q = _load(spark)
    klabels = sorted(set(labels))
    cents = {k: q[labels == k].mean(axis=0) for k in klabels}
    sil = {k: [] for k in klabels}
    for i in range(len(labels)):
        a2 = float(((q[i] - cents[labels[i]]) ** 2).sum())
        b2 = min(
            float(((q[i] - cents[k]) ** 2).sum())
            for k in klabels
            if k != labels[i]
        )
        sil[labels[i]].append((b2 - a2) / max(a2, b2))
    assert len(rows) == len(klabels)
    for r in rows:
        vals = sil[r["label"]]
        assert r["n_vectors"] == len(vals)
        assert abs(r["centroid_silhouette"] - sum(vals) / len(vals)) < 1e-3
        assert -1.0 <= r["centroid_silhouette"] <= 1.0


def test_power_iteration_replay(spark):
    rows = plans.REGISTRY["embedding_power_iteration"].build(spark, SF).collect()
    _, _, q = _load(spark)
    rowsum = q.sum(axis=1)
    v1 = (q.astype(object) * rowsum[:, None].astype(object)).sum(axis=0)
    order = sorted(range(len(v1)), key=lambda d: (-abs(v1[d]), d))[:10]
    xv = (q.astype(float) @ np.array([float(w) for w in v1]))
    lam = float((xv * xv).sum()) / float(sum(float(w) * float(w) for w in v1))
    assert len(rows) == 10
    by_rank = {r["rnk"]: r for r in rows}
    for i, d in enumerate(order, 1):
        r = by_rank[i]
        assert r["dim"] == d
        assert r["component"] == v1[d]
        assert abs(r["rayleigh_lambda"] - lam) < abs(lam) * 1e-6
    # Rayleigh quotient bounds the dominant eigenvalue from below and is
    # positive for a nonzero Gram matrix
    assert rows[0]["rayleigh_lambda"] > 0
