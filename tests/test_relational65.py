"""Invariant tests for batch 65: LLR vs a python contingency replay,
Chao1 vs abundance counts, blocking audit vs exhaustive pair count,
top-k stability vs set replay."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _lang_tokens(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select("lang", "text")
        .collect()
    )
    tl: Counter = Counter()
    for r in docs:
        for w in re.split(r"\s+", r["text"].strip()):
            tl[(r["lang"], w)] += 1
    return tl


def test_llr_keywords_replay(spark):
    rows = plans.REGISTRY["lang_llr_keywords"].build(spark, SF).collect()
    tl = _lang_tokens(spark)
    tot = sum(tl.values())
    lang_tot: Counter = Counter()
    tok_tot: Counter = Counter()
    for (lang, w), c in tl.items():
        lang_tot[lang] += c
        tok_tot[w] += c
    assert rows, "expected keyword rows"
    langs = {r["lang"] for r in rows}
    assert len(langs) >= 3
    for r in rows:
        a = tl[(r["lang"], r["token"])]
        b = tok_tot[r["token"]] - a
        big_a = lang_tot[r["lang"]]
        big_b = tot - big_a
        assert r["cf_in"] == a and r["cf_out"] == b
        assert a * big_b > b * big_a  # overrepresentation gate
        g2 = 2.0 * (
            (a * math.log(a * tot / (big_a * (a + b))) if a > 0 else 0.0)
            + (b * math.log(b * tot / (big_b * (a + b))) if b > 0 else 0.0)
        )
        assert abs(r["llr_g2"] - g2) < 1e-3
        assert r["llr_g2"] >= 0
    # per-lang ranks are 1..k contiguous
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r["rnk"])
    for rnk_list in by_lang.values():
        assert sorted(rnk_list) == list(range(1, len(rnk_list) + 1))


def test_chao1_replay(spark):
    rows = plans.REGISTRY["lang_vocab_chao1"].build(spark, SF).collect()
    tl = _lang_tokens(spark)
    per_lang: dict = defaultdict(Counter)
    for (lang, w), c in tl.items():
        per_lang[lang][w] = c
    assert len(rows) == len(per_lang)
    for r in rows:
        cf = per_lang[r["lang"]]
        f1 = sum(1 for c in cf.values() if c == 1)
        f2 = sum(1 for c in cf.values() if c == 2)
        n = sum(cf.values())
        assert r["v_obs"] == len(cf) and r["f1"] == f1 and r["f2"] == f2
        assert r["n_tokens"] == n
        chao1 = len(cf) + f1 * (f1 - 1) / (2.0 * (f2 + 1))
        assert abs(r["chao1"] - chao1) < 0.02
        assert r["chao1"] >= r["v_obs"]  # estimator never below observed
        assert abs(r["good_turing_coverage"] - (1.0 - f1 / n)) < 1e-6


def test_blocking_audit_replay(spark):
    row = plans.REGISTRY["blocking_quality_audit"].build(spark, SF).collect()[0]
    c = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_nationkey", "c_mktsegment")
        .collect()
    )
    blocks = Counter((r["c_nationkey"], r["c_mktsegment"]) for r in c)
    n = len(c)
    cand = sum(b * (b - 1) // 2 for b in blocks.values())
    assert row["n_records"] == n
    assert row["n_blocks"] == len(blocks)
    assert int(row["candidate_pairs"]) == cand
    assert int(row["total_pairs"]) == n * (n - 1) // 2
    assert abs(row["reduction_ratio"] - (1 - cand / (n * (n - 1) / 2))) < 1e-6
    assert row["max_block"] == max(blocks.values())
    assert 0 < row["reduction_ratio"] < 1


def test_topk_stability_replay(spark):
    rows = plans.REGISTRY["weekly_brand_topk_stability"].build(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_brand")
    wb = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(
            F.date_trunc("week", "l_shipdate").cast("date").alias("w"),
            F.col("p_brand").alias("brand"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("w", "brand")
        .agg(F.sum("cents").alias("cents"))
        .collect()
    )
    per_week: dict = defaultdict(list)
    for r in wb:
        per_week[r["w"]].append((-r["cents"], r["brand"]))
    tops = {
        w: {b for _, b in sorted(v)[:10]} for w, v in per_week.items()
    }
    import datetime as dt

    expected = {}
    for w, s in tops.items():
        nxt = w + dt.timedelta(days=7)
        if nxt in tops:
            i = len(s & tops[nxt])
            expected[w] = (len(s), len(tops[nxt]), i)
    assert len(rows) == len(expected)
    for r in rows:
        na, nb, i = expected[r["week_start"]]
        assert (r["n_top_a"], r["n_top_b"], r["n_common"]) == (na, nb, i)
        assert abs(r["jaccard"] - i / (na + nb - i)) < 1e-6
        assert 0 <= r["jaccard"] <= 1
