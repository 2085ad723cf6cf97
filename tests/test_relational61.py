"""Invariant tests for batch 61: transition entropy replayed from raw
sequences + chain-rule bound, weekday ANOVA vs a python F, drawdown vs
a sequential scan, and query likelihood vs a python LM scorer +
consistency with BM25's candidate pool."""

from __future__ import annotations

import math
import re

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_transition_entropy_replay(spark):
    rows = plans.REGISTRY["user_transition_entropy"].build(spark, SF).collect()
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    got = {r["user_id"]: r for r in rows}
    checked = 0
    for u, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        trans = list(zip((e["event_type"] for e in evs), (e["event_type"] for e in evs[1:])))
        if len(trans) < 10:
            assert u not in got
            continue
        cells: dict = {}
        for t in trans:
            cells[t] = cells.get(t, 0) + 1
        rowc: dict = {}
        for (a, _), c in cells.items():
            rowc[a] = rowc.get(a, 0) + c
        n = len(trans)
        h = sum(
            (rowc[a] / n)
            * -sum(
                (cells[(a, b)] / rowc[a]) * math.log(cells[(a, b)] / rowc[a])
                for (aa, b) in cells
                if aa == a
            )
            for a in rowc
        )
        r = got[u]
        assert r["n_transitions"] == n
        assert abs(r["conditional_entropy"] - h) < 1e-3
        assert -1e-9 <= r["conditional_entropy"] <= math.log(5) + 1e-9
        checked += 1
    assert checked > 10


def test_weekday_anova_replay(spark):
    row = plans.REGISTRY["weekday_revenue_anova"].build(spark, SF).collect()[0]
    daily = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"))
        .collect()
    )
    groups: dict = {}
    for r in daily:
        groups.setdefault(r["d"].isoweekday(), []).append(r["c"])
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    gm = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in groups.values())
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k_weekdays"] == k and row["n_days"] == n
    assert abs(row["f_stat"] - f) / f < 1e-6


def test_drawdown_sequential_scan(spark):
    row = plans.REGISTRY["weekly_revenue_max_drawdown"].build(spark, SF).collect()[0]
    weekly = sorted(
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.date_trunc("week", "o_orderdate").cast("date").alias("w"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"))
        .collect(),
        key=lambda r: r["w"],
    )
    run_max, best, best_week, best_peak, best_trough = 0, -1, None, None, None
    for r in weekly:
        run_max = max(run_max, r["c"])
        dd = run_max - r["c"]
        if dd > best:
            best, best_week, best_peak, best_trough = dd, r["w"], run_max, r["c"]
    assert row["max_drawdown_cents"] == best
    assert row["trough_week"] == best_week
    assert row["peak_cents"] == best_peak and row["trough_cents"] == best_trough
    assert abs(row["drawdown_frac"] - best / best_peak) < 1e-6


def test_query_likelihood_replay(spark):
    rows = plans.REGISTRY["doc_query_likelihood_topk"].build(spark, SF).collect()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select("doc_id", "text")
        .collect()
    )
    terms = ("spark", "table", "window")
    toks = {r["doc_id"]: re.split(r"\s+", r["text"].strip()) for r in docs}
    ctot = sum(len(t) for t in toks.values())
    cf = {w: sum(t.count(w) for t in toks.values()) for w in terms}
    present = [w for w in terms if cf[w] > 0]
    mu = 2000.0

    def score(d):
        tk = toks[d]
        return sum(
            math.log((tk.count(w) + mu * cf[w] / ctot) / (len(tk) + mu))
            for w in present
        )

    ranked = sorted(toks, key=lambda d: (-score(d), d))[:20]
    assert [r["doc_id"] for r in rows] == ranked
    for r in rows[:5]:
        assert abs(r["ql_score"] - score(r["doc_id"])) < 1e-4
    # scores are negative log-likelihoods (sums of logs of probs < 1)
    assert all(r["ql_score"] < 0 for r in rows)
