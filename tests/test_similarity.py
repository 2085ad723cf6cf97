"""LSH ANN quality checks: determinism + recall against the exact
all-pairs baseline (rows-only queries can't be oracle-checked, so their
semantics are pinned here)."""

from __future__ import annotations

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark.operators import similarity as sim
from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t


def test_lsh_buckets_deterministic(spark, sf_smoke):
    emb = _t(spark, sf_smoke, "embeddings")
    b1 = {r.vec_id: r.bucket for r in sim.lsh_sign_buckets(emb, n_planes=8).collect()}
    b2 = {r.vec_id: r.bucket for r in sim.lsh_sign_buckets(emb, n_planes=8).collect()}
    assert b1 == b2
    assert all(0 <= v < 256 for v in b1.values())


def test_lsh_candidates_subset_of_exact_pairs(spark, sf_smoke):
    emb = _t(spark, sf_smoke, "embeddings")
    exact = {
        (r.id_1, r.id_2)
        for r in sim.cosine_dup_pairs(emb, threshold=0.4).collect()
    }
    approx = {
        (r.id_1, r.id_2)
        for r in sim.lsh_ann_candidates(emb, n_planes=4, threshold=0.4, n_tables=4).collect()
    }
    # candidates pass the same cosine threshold, so they must be a subset
    assert approx <= exact
    # sign-LSH with few planes must keep decent recall on 0.4+ pairs
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.3, f"LSH recall too low: {recall:.2f} ({len(approx)}/{len(exact)})"


def test_knn_self_excluded_and_k_bounded(spark, sf_smoke):
    emb = _t(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    knn = sim.brute_force_knn(emb, queries, k=4).collect()
    by_q: dict[int, list] = {}
    for r in knn:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r.cosine_sim)
    assert set(by_q) == {0, 1, 2}
    for sims in by_q.values():
        assert len(sims) == 4
        assert sims == sorted(sims, reverse=True)


def test_ivf_exact_when_probing_all_lists(spark, sf_smoke):
    # nprobe = n_centroids degenerates to brute force: every query sees
    # every list, so the top-k must equal the exact baseline
    emb = _t(spark, sf_smoke, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    ivf = sim.ivf_search(emb, q, k=5, nprobe=4, n_centroids=4, n_iter=3)
    exact = sim.brute_force_knn(emb, q, k=5)
    got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    want = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    assert got == want


def test_ivf_partial_probe_recall(spark, sf_smoke):
    emb = _t(spark, sf_smoke, "embeddings")
    q = emb.filter(F.col("vec_id") < 16)
    ivf = sim.ivf_search(emb, q, k=5, nprobe=4, n_centroids=8, n_iter=5)
    exact = sim.brute_force_knn(emb, q, k=5)
    got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    want = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    # approximate results must be real corpus pairs with >= 60% recall@5
    assert got, "IVF returned nothing"
    recall = len(got & want) / len(want)
    assert recall >= 0.6, f"IVF recall too low: {recall:.2f}"


def test_ivf_train_deterministic(spark, sf_smoke):
    import numpy as np

    emb = _t(spark, sf_smoke, "embeddings")
    c1 = sim.ivf_train(emb, n_centroids=4, n_iter=2)
    c2 = sim.ivf_train(emb, n_centroids=4, n_iter=2)
    assert np.allclose(c1, c2, atol=0)


def test_blocked_gemm_equals_broadcast_gemm(spark, sf_smoke):
    # the distributed block-triangle path must reproduce the broadcast
    # kernel exactly (same normalize/GEMM/round float shape), for any
    # block count — including blocks larger than the corpus hash range
    emb = _t(spark, sf_smoke, "embeddings")
    want = {
        (r.id_1, r.id_2, r.cosine_sim)
        for r in sim.cosine_dup_pairs_gemm(emb, threshold=0.4, round_to=4).collect()
    }
    for nb in (1, 3, 8):
        got = {
            (r.id_1, r.id_2, r.cosine_sim)
            for r in sim.cosine_dup_pairs_blocked(
                emb, threshold=0.4, round_to=4, n_blocks=nb
            ).collect()
        }
        assert got == want, f"n_blocks={nb}: {len(got)} vs {len(want)} pairs"
