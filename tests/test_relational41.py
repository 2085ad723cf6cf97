"""Invariant tests for batch 41: first-principles recomputes — the
bootstrap replayed with hashlib + the literal threshold ladder, Zipf
and surprisal with python math, TTR with collections.Counter."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational41 import (
    _B,
    _POIS_T,
)

SF = "/root/testdata/sf0.01"


def _pois_weight(u6: str) -> int:
    # thresholds are lowercase 6-hex-char strings; lexicographic compare
    # equals numeric compare for fixed-width lowercase hex
    for k, t in enumerate(_POIS_T):
        if u6 < t:
            return k
    return 8


def test_bootstrap_replays_with_hashlib(spark):
    row = plans.REGISTRY["order_mean_bootstrap"].build(spark, SF).collect()[0]
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .collect()
    )
    cents = [(r["o_orderkey"], r["c"]) for r in orders]
    n = len(cents)
    tot = sum(c for _, c in cents)
    means = []
    for b in range(_B):
        g, j = divmod(b, 4)
        swx = sw = 0
        for k, c in cents:
            u6 = hashlib.md5(f"{k}-{g}".encode()).hexdigest()[6 * j : 6 * j + 6]
            wgt = _pois_weight(u6)
            swx += wgt * c
            sw += wgt
        means.append(swx / sw)
    sm = sum(means)
    smm = sum(m * m for m in means)
    se = math.sqrt((smm - sm * sm / _B) / (_B - 1))
    point = tot / n
    assert row["n_orders"] == n and row["n_replicates"] == _B
    assert abs(row["point_mean_cents"] - point) < 1e-3
    assert abs(row["boot_se_cents"] - se) < 1e-3
    assert abs(row["ci_lo_cents"] - (point - 1.96 * se)) < 1e-3
    assert abs(row["ci_hi_cents"] - (point + 1.96 * se)) < 1e-3
    # the bootstrap SE of a mean must be in the right ballpark of
    # sigma/sqrt(n) (within 3x either way)
    var = sum((c - point) ** 2 for _, c in cents) / (n - 1)
    classical = math.sqrt(var / n)
    assert classical / 3 < se < classical * 3


def _corpus_tokens(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", "text")
        .collect()
    )
    return [(r["doc_id"], r["source"], r["text"].split(" ")) for r in docs]


def test_zipf_slope_replays(spark):
    row = plans.REGISTRY["zipf_slope_audit"].build(spark, SF).collect()[0]
    cnt = Counter()
    for _, _, tk in _corpus_tokens(spark):
        cnt.update(tk)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    xs = [math.log(r + 1) for r in range(len(top))]
    ys = [math.log(c) for _, c in top]
    k = len(top)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert row["k_tokens"] == k
    assert row["top_count"] == top[0][1]
    assert abs(row["zipf_slope"] - slope) < 1e-3
    assert abs(row["zipf_intercept"] - (sy - slope * sx) / k) < 1e-3
    # a frequency-ranked curve must slope downward
    assert row["zipf_slope"] < 0


def test_surprisal_replays_and_orders_docs_sanely(spark):
    rows = {r["doc_id"]: r for r in plans.REGISTRY["doc_unigram_surprisal"].build(spark, SF).collect()}
    corpus = _corpus_tokens(spark)
    cnt = Counter()
    for _, _, tk in corpus:
        cnt.update(tk)
    n = sum(cnt.values())
    v = len(cnt)
    for doc_id, _, tk in corpus[:50]:
        s = sum(-math.log2((cnt[t] + 1) / (n + v)) for t in tk)
        r = rows[doc_id]
        assert r["n_tokens"] == len(tk)
        assert abs(r["mean_surprisal_bits"] - s / len(tk)) < 1e-3
    assert len(rows) == len(corpus)
    # surprisal is positive and bounded by log2(N+V)
    for r in rows.values():
        assert 0 < r["mean_surprisal_bits"] < math.log2(n + v)


def test_type_token_stats_replays(spark):
    rows = {r["source"]: r for r in plans.REGISTRY["source_type_token_stats"].build(spark, SF).collect()}
    corpus = _corpus_tokens(spark)
    per: dict[str, Counter] = {}
    docs: dict[str, int] = {}
    for _, src, tk in corpus:
        per.setdefault(src, Counter()).update(tk)
        docs[src] = docs.get(src, 0) + 1
    assert set(rows) == set(per)
    for src, c in per.items():
        r = rows[src]
        assert r["n_docs"] == docs[src]
        assert r["n_tokens"] == sum(c.values())
        assert r["vocab_size"] == len(c)
        hapax = sum(1 for v in c.values() if v == 1)
        assert r["hapax_count"] == hapax
        assert abs(r["ttr"] - len(c) / sum(c.values())) < 1e-5
        assert abs(r["hapax_share"] - hapax / len(c)) < 1e-5
