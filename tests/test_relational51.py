"""Invariant tests for batch 51: bigram surprisal recomputed from a
python bigram LM, supplier Jaccard recomputed from raw sets, diversity
indices from first principles, and PACF checked against the
Durbin-Levinson recursion over independently computed ACF values."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_bigram_surprisal_replays(spark):
    rows = plans.REGISTRY["doc_bigram_surprisal"].build(spark, SF).collect()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select("doc_id", "text")
        .collect()
    )
    import re

    toks = {r["doc_id"]: re.split(r"\s+", r["text"].strip()) for r in docs}
    ucnt: dict = {}
    bcnt: dict = {}
    for tk in toks.values():
        for w in tk:
            ucnt[w] = ucnt.get(w, 0) + 1
        for a, b in zip(tk, tk[1:]):
            bcnt[(a, b)] = bcnt.get((a, b), 0) + 1
    v = len(ucnt)
    got = {r["doc_id"]: r for r in rows}
    # only docs with >= 2 tokens appear
    assert set(got) == {d for d, tk in toks.items() if len(tk) >= 2}
    for doc_id, tk in list(toks.items())[:100]:
        if len(tk) < 2:
            continue
        terms = [
            -math.log2((bcnt[(a, b)] + 1) / (ucnt[a] + v))
            for a, b in zip(tk, tk[1:])
        ]
        r = got[doc_id]
        assert r["n_bigrams"] == len(terms)
        assert abs(r["mean_bigram_surprisal_bits"] - sum(terms) / len(terms)) < 1e-3


def test_supplier_jaccard_from_raw_sets(spark):
    rows = plans.REGISTRY["supplier_overlap_jaccard"].build(spark, SF).collect()
    sp = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .collect()
    )
    sets: dict = {}
    for r in sp:
        sets.setdefault(r["l_suppkey"], set()).add(r["l_partkey"])
    assert len(rows) == 20
    prev = None
    for r in rows:
        a, b = sets[r["s1"]], sets[r["s2"]]
        inter = len(a & b)
        assert r["n_shared"] == inter
        assert r["n_parts_1"] == len(a) and r["n_parts_2"] == len(b)
        jac = inter / len(a | b)
        assert abs(r["jaccard"] - jac) < 1e-6
        if prev is not None:
            assert r["jaccard"] <= prev + 1e-12
        prev = r["jaccard"]


def test_diversity_indices_first_principles(spark):
    rows = plans.REGISTRY["nation_brand_diversity"].build(spark, SF).collect()
    for r in rows:
        # bounds: Simpson in [0,1], Shannon in [0, ln(n_brands)],
        # effective count in [1, n_brands]
        assert 0 <= r["simpson"] <= 1
        assert -1e-9 <= r["shannon"] <= math.log(r["n_brands"]) + 1e-9
        assert 1 - 1e-6 <= r["effective_brands"] <= r["n_brands"] + 1e-6
        assert abs(r["effective_brands"] - math.exp(r["shannon"])) < 5e-3


def test_pacf_durbin_levinson_consistency(spark):
    row = plans.REGISTRY["weekly_revenue_pacf"].build(spark, SF).collect()[0]
    # lag-1 PACF equals lag-1 ACF by definition
    assert row["pacf1"] == row["acf1"]
    r1, r2, r3 = row["acf1"], row["acf2"], row["acf3"]
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    assert abs(row["pacf2"] - phi2) < 5e-6
    a21 = r1 - phi2 * r1
    phi3 = (r3 - a21 * r2 - phi2 * r1) / (1 - a21 * r1 - phi2 * r2)
    assert abs(row["pacf3"] - phi3) < 5e-5
    # consistency with the registered ACF query at the shared lags
    acf = {
        r["lag"]: r["acf"]
        for r in plans.REGISTRY["weekly_revenue_acf"].build(spark, SF).collect()
    }
    for k, col in ((1, "acf1"), (2, "acf2"), (3, "acf3")):
        assert abs(acf[k] - row[col]) < 2e-6
