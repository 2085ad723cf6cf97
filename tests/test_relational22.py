"""Invariant tests for batch 22 (relational22): RFM segmentation,
survival curve, event trigrams, and repeated-passage dedup —
first-principles recomputes independent of the oracle SQL."""

from __future__ import annotations

import datetime as dt

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_rfm_quartiles_partition_customers(spark):
    """Quartile codes are 1..4; segment customer totals reconcile with
    the ordering-customer count; and each quartile of each dimension
    holds between floor(n/4) and ceil(n/4) customers per segment."""
    rows = plans.REGISTRY["rfm_segments"].build(spark, SF).collect()
    assert rows
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    seg = {r["c_custkey"]: r["c_mktsegment"] for r in cust}
    per_seg: dict[str, set[int]] = {}
    for o in orders:
        per_seg.setdefault(seg[o["o_custkey"]], set()).add(o["o_custkey"])
    got_per_seg: dict[str, int] = {}
    for r in rows:
        assert 1 <= r["r_q"] <= 4 and 1 <= r["f_q"] <= 4 and 1 <= r["m_q"] <= 4
        got_per_seg[r["segment"]] = got_per_seg.get(r["segment"], 0) + r["n_customers"]
    assert got_per_seg == {s: len(ks) for s, ks in per_seg.items()}
    # marginal quartile sizes: each r_q value covers n/4 +- 1 customers
    for s, ks in per_seg.items():
        n = len(ks)
        for q in range(1, 5):
            size = sum(r["n_customers"] for r in rows if r["segment"] == s and r["r_q"] == q)
            assert n // 4 <= size <= n // 4 + 1


def test_rfm_monetary_reconciles(spark):
    """Total monetary cents across all segment codes equals the exact
    integer total of all order prices."""
    rows = plans.REGISTRY["rfm_segments"].build(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    assert sum(r["monetary_cents"] for r in rows) == sum(
        round(o["o_totalprice"] * 100) for o in orders
    )


def test_survival_curve_monotone_and_exact(spark):
    """n_surviving is non-increasing in lifetime, starts at the
    customer count, and matches a pure-Python recompute."""
    rows = sorted(
        plans.REGISTRY["customer_survival_curve"].build(spark, SF).collect(),
        key=lambda r: r["lifetime_weeks"],
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    span: dict[int, list[dt.datetime]] = {}
    for o in orders:
        span.setdefault(o["o_custkey"], []).append(o["o_orderdate"])
    lifetimes = [(max(v) - min(v)).days // 7 for v in span.values()]
    total = len(lifetimes)
    assert rows[0]["n_surviving"] == total
    prev = total + 1
    for r in rows:
        expect_surv = sum(1 for x in lifetimes if x >= r["lifetime_weeks"])
        expect_at = sum(1 for x in lifetimes if x == r["lifetime_weeks"])
        assert (r["n_customers"], r["n_surviving"]) == (expect_at, expect_surv)
        assert r["n_surviving"] < prev
        assert abs(r["survival_pct"] - round(expect_surv / total, 4)) < 1e-9
        prev = r["n_surviving"]


def test_event_trigrams_match_python_scan(spark):
    """Trigram counts equal a pure-Python per-user ordered scan; shares
    sum to ~1."""
    rows = plans.REGISTRY["event_trigram_sequences"].build(spark, SF).collect()
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    streams: dict[int, list] = {}
    for e in events:
        streams.setdefault(e["user_id"], []).append((e["ts"], e["event_id"], e["event_type"]))
    expect: dict[tuple, int] = {}
    for v in streams.values():
        v.sort()
        types = [x[2] for x in v]
        for a, b, c in zip(types, types[1:], types[2:]):
            expect[(a, b, c)] = expect.get((a, b, c), 0) + 1
    got = {(r["e1"], r["e2"], r["e3"]): r["n"] for r in rows}
    assert got == expect
    assert abs(sum(r["share"] for r in rows) - 1.0) < 0.01


def test_passage_dedup_first_occurrence(spark):
    """Kept/dropped passages match a pure-Python first-occurrence scan
    in (doc_id, position) order, including intra-document repeats."""
    rows = {r["doc_id"]: r for r in plans.REGISTRY["passage_dedup_stats"].build(spark, SF).collect()}
    docs = sorted(
        spark.read.parquet(f"{SF}/documents.parquet").collect(),
        key=lambda d: d["doc_id"],
    )
    seen: set[str] = set()
    for d in docs:
        if d["text"] is None:
            assert d["doc_id"] not in rows
            continue
        tk = d["text"].split(" ")
        chunks = [tk[i : i + 10] for i in range(0, len(tk), 10)]
        n_kept = kept_tokens = 0
        for ch in chunks:
            key = " ".join(ch)
            if key not in seen:
                seen.add(key)
                n_kept += 1
                kept_tokens += len(ch)
        r = rows[d["doc_id"]]
        assert (r["n_chunks"], r["n_kept"], r["kept_tokens"]) == (
            len(chunks),
            n_kept,
            kept_tokens,
        )
        assert abs(r["kept_frac"] - round(kept_tokens / len(tk), 4)) < 1e-9
