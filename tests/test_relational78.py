"""Invariant tests for batch 78: contrastive pairs vs a ring replay,
label-noise consensus vs a numpy k-NN, repeat share vs a dict replay,
bigram entropy vs a Counter replay."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_contrastive_pairs_replay(spark):
    rows = plans.REGISTRY["contrastive_pair_sampler"].build(spark, SF).collect()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    )
    ring = sorted(
        ((hashlib.md5(str(r["doc_id"]).encode()).hexdigest(), r["doc_id"], r["lang"])
         for r in docs)
    )
    lang_of = {r["doc_id"]: r["lang"] for r in docs}
    expect = {}
    for i, (_, did, lang) in enumerate(ring):
        pos = neg = None
        for off in range(1, 21):
            if i + off >= len(ring):
                break
            _, cid, clang = ring[i + off]
            if clang == lang and pos is None:
                pos = (cid, off)
            if clang != lang and neg is None:
                neg = (cid, off)
        if pos and neg:
            expect[did] = (lang, pos, neg)
    assert len(rows) == len(expect)
    for r in rows:
        lang, (pid, poff), (nid, noff) = expect[r["doc_id"]]
        assert r["lang"] == lang
        assert (r["positive_id"], r["pos_off"]) == (pid, poff)
        assert (r["negative_id"], r["neg_off"]) == (nid, noff)
        assert lang_of[r["positive_id"]] == lang
        assert lang_of[r["negative_id"]] != lang


def test_label_noise_replay(spark):
    import numpy as np

    rows = plans.REGISTRY["embedding_label_noise_screen"].build(spark, SF).collect()
    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    emb.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in emb]
    labels = np.array([r["label"] for r in emb])
    q = np.array(
        [[round(float(v) * 1_000_000) for v in r["embedding"]] for r in emb],
        dtype=np.int64,
    )
    n = len(ids)
    suspect = defaultdict(int)
    agree_sum = defaultdict(int)
    count = defaultdict(int)
    for i in range(n):
        d2 = ((q - q[i]) ** 2).sum(axis=1)
        order = sorted((int(d2[j]), ids[j], labels[j]) for j in range(n) if j != i)
        top5 = order[:5]
        agree = sum(1 for _, _, lb in top5 if lb == labels[i])
        count[labels[i]] += 1
        agree_sum[labels[i]] += agree
        if agree <= 1:
            suspect[labels[i]] += 1
    assert len(rows) == len(count)
    for r in rows:
        lab = r["label"]
        assert r["n_vectors"] == count[lab]
        assert r["n_suspect"] == suspect.get(lab, 0)
        assert abs(r["mean_consensus"] - agree_sum[lab] / (5 * count[lab])) < 1e-3


def test_brand_repeat_replay(spark):
    rows = plans.REGISTRY["brand_repeat_share"].build(spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_brand", "o_custkey", "l_orderkey")
        .collect()
    )
    orders = defaultdict(set)
    for r in li:
        orders[(r["p_brand"], r["o_custkey"])].add(r["l_orderkey"])
    per = defaultdict(list)
    for (brand, _), oks in orders.items():
        per[brand].append(len(oks))
    assert len(rows) == len(per)
    for r in rows:
        counts = per[r["brand"]]
        rep = sum(1 for c in counts if c >= 2)
        assert r["n_customers"] == len(counts)
        assert r["n_repeat"] == rep
        assert abs(r["repeat_share"] - rep / len(counts)) < 1e-5
        assert abs(r["avg_orders_per_customer"] - sum(counts) / len(counts)) < 1e-3


def test_bigram_entropy_replay(spark):
    row = plans.REGISTRY["token_bigram_entropy_rate"].build(spark, SF).collect()[0]
    texts = (
        spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    )
    uni: Counter = Counter()
    big: Counter = Counter()
    for r in texts:
        toks = [t for t in r["text"].strip().split() if t]
        for a, b in zip(toks, toks[1:]):
            uni[a] += 1
            big[(a, b)] += 1
    n = sum(uni.values())

    def h(cnt):
        return math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n

    h1, h2 = h(uni), h(big)
    assert row["n_bigrams"] == n
    assert row["vocab_unigram"] == len(uni)
    assert row["vocab_bigram"] == len(big)
    assert abs(row["h_unigram"] - h1) < 1e-3
    assert abs(row["entropy_rate"] - (h2 - h1)) < 1e-3
    assert abs(row["redundancy"] - (1 - (h2 - h1) / h1)) < 1e-3
    assert 0 <= row["entropy_rate"] <= row["h_unigram"] + 1e-9
