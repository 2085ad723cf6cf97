"""Invariant tests for batch 29 (relational29): cluster
representatives, ratio-to-parent, Mahalanobis outliers, HHI —
first-principles recomputes independent of the oracle SQL."""

from __future__ import annotations

import math

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_cluster_representatives_are_longest(spark):
    """Every representative is its cluster's longest member (ties to
    lowest id), members reconcile with dedup_components, and dropped
    chars = total - representative."""
    reps = {r["cluster_id"]: r for r in plans.REGISTRY["dedup_cluster_representatives"].build(spark, SF).collect()}
    cc = plans.REGISTRY["dedup_components"].build(spark, SF).collect()
    chars = {d["doc_id"]: d["n_chars"] for d in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    members: dict[int, list[int]] = {}
    for r in cc:
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    assert set(reps) == set(members)
    for cid, docs in members.items():
        r = reps[cid]
        assert r["n_members"] == len(docs)
        best = min(docs, key=lambda d: (-chars[d], d))
        assert r["rep_id"] == best and r["rep_n_chars"] == chars[best]
        assert r["total_chars"] == sum(chars[d] for d in docs)
        assert r["chars_dropped"] == r["total_chars"] - chars[best]


def test_hierarchy_shares_fold_up(spark):
    """Nation cents sum to region cents within each region; region
    shares sum to 1 per region; total is consistent."""
    rows = plans.REGISTRY["ratio_to_parent_hierarchy"].build(spark, SF).collect()
    total = rows[0]["total_cents"]
    assert all(r["total_cents"] == total for r in rows)
    assert sum(r["nation_cents"] for r in rows) == total
    regions: dict[str, list] = {}
    for r in rows:
        regions.setdefault(r["region"], []).append(r)
    for reg, rs in regions.items():
        rc = rs[0]["region_cents"]
        assert all(r["region_cents"] == rc for r in rs)
        assert sum(r["nation_cents"] for r in rs) == rc
        assert abs(sum(r["share_of_region"] for r in rs) - 1.0) < 0.01


def test_maha_outliers_match_python(spark):
    """Top-20 scores replay from an exact-moment Python recompute with
    the same ordered dimension fold."""
    rows = plans.REGISTRY["embedding_maha_outliers"].build(spark, SF).collect()
    embs = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vms = {
        e["vec_id"]: [
            math.floor(abs(float(x)) * 1e6 + 0.5) * (1 if float(x) >= 0 else -1)
            for x in e["embedding"]
        ]
        for e in embs
    }
    dims = len(next(iter(vms.values())))
    n = len(vms)
    mu, var = [], []
    for d in range(dims):
        s = sum(v[d] for v in vms.values())
        ss = sum(v[d] * v[d] for v in vms.values())
        mu.append(s / n)
        var.append((ss - s * s / n) / n)
    scores = {}
    for vid, v in vms.items():
        sc = 0.0
        for d in range(dims):
            if var[d] > 0:
                sc += (v[d] - mu[d]) * (v[d] - mu[d]) / var[d]
        scores[vid] = sc
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [r["vec_id"] for r in rows] == [vid for vid, _ in expect]
    for r, (vid, sc) in zip(rows, expect):
        assert abs(r["maha_sq"] - sc) < 1e-3


def test_hhi_bounds_and_exact_counts(spark):
    """HHI lies in [1/n, 1]; supplier revenue reconciles; top_share is
    the max supplier's fraction."""
    rows = plans.REGISTRY["nation_supplier_hhi"].build(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_suppkey", "l_extendedprice").collect()
    sup = {r["s_suppkey"]: r["s_nationkey"] for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()}
    nat = {r["n_nationkey"]: r["n_name"] for r in spark.read.parquet(f"{SF}/nation.parquet").collect()}
    rev: dict[str, dict[int, int]] = {}
    for l in li:
        nation = nat[sup[l["l_suppkey"]]]
        d = rev.setdefault(nation, {})
        d[l["l_suppkey"]] = d.get(l["l_suppkey"], 0) + round(l["l_extendedprice"] * 100)
    for r in rows:
        d = rev[r["nation"]]
        assert r["n_suppliers"] == len(d)
        assert r["total_cents"] == sum(d.values())
        tot = sum(d.values())
        hhi = sum(c * c for c in d.values()) / (tot * tot)
        assert abs(r["hhi"] - hhi) < 1e-5
        assert 1.0 / len(d) - 1e-9 <= r["hhi"] <= 1.0
        assert abs(r["top_share"] - round(max(d.values()) / tot, 4)) < 1e-9
