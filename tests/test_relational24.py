"""Invariant tests for batch 24 (relational24): drift buckets, Wilson
league table, langid confusion matrix, error bursts — first-principles
recomputes independent of the oracle SQL."""

from __future__ import annotations

import datetime as dt
import math

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_drift_buckets_counts_and_chi2(spark):
    """Bucket counts match a Python replay; chi-square contributions
    equal the closed form over those exact counts."""
    rows = plans.REGISTRY["order_value_drift_buckets"].build(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    expect: dict[int, list[int]] = {}
    for o in orders:
        b = min(round(o["o_totalprice"] * 100) // 2_500_000, 19)
        period = 0 if o["o_orderdate"] < dt.datetime(1998, 1, 1) else 1
        expect.setdefault(b, [0, 0])[period] += 1
    assert {r["bucket"]: [r["n_a"], r["n_b"]] for r in rows} == expect
    tot_a = sum(v[0] for v in expect.values())
    tot_b = sum(v[1] for v in expect.values())
    for r in rows:
        e_a = tot_a * 1.0 * (r["n_a"] + r["n_b"]) / (tot_a + tot_b)
        assert abs(r["chi2_a"] - round((r["n_a"] - e_a) ** 2 / e_a, 4)) < 1e-9


def test_wilson_bound_below_rate_and_ordering(spark):
    """The Wilson LB is always <= the raw rate, shrinks with smaller n
    at equal rates, and counts reconcile with a Python replay."""
    rows = plans.REGISTRY["source_quality_wilson"].build(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    expect: dict[str, list[int]] = {}
    for d in docs:
        st = expect.setdefault(d["source"], [0, 0])
        st[0] += 1
        st[1] += 1 if d["n_chars"] >= 300 else 0
    for r in rows:
        n, k = expect[r["source"]]
        assert (r["n_docs"], r["n_pass"]) == (n, k)
        assert r["wilson_lb"] <= r["pass_rate"] + 1e-9
        z = 1.96
        p = k / n
        lb = (p + z * z / (2 * n) - z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)) / (
            1 + z * z / n
        )
        assert abs(r["wilson_lb"] - round(lb, 4)) < 1e-6


def test_confusion_matrix_reconciles(spark):
    """Labeled marginals equal the corpus language distribution; tp is
    bounded by both marginals; F1 is the harmonic closed form."""
    rows = {r["lang"]: r for r in plans.REGISTRY["langid_confusion_matrix"].build(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    labeled: dict[str, int] = {}
    for d in docs:
        labeled[d["lang"]] = labeled.get(d["lang"], 0) + 1
    for lang, n in labeled.items():
        assert rows[lang]["n_labeled"] == n
    total_detected = sum(r["n_detected"] for r in rows.values())
    assert total_detected == len(docs)
    for r in rows.values():
        assert r["tp"] <= min(r["n_labeled"], r["n_detected"]) or r["n_labeled"] == 0
        if r["n_labeled"] + r["n_detected"] > 0:
            assert abs(
                r["f1"] - round(2 * r["tp"] / (r["n_labeled"] + r["n_detected"]), 4)
            ) < 1e-9


def test_error_bursts_match_python_scan(spark):
    """Hourly counts, trailing baselines, and burst flags replay exactly
    in Python."""
    rows = sorted(
        plans.REGISTRY["error_burst_windows"].build(spark, SF).collect(),
        key=lambda r: r["hour"],
    )
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    hours: dict[dt.datetime, list[int]] = {}
    for e in events:
        h = e["ts"].replace(minute=0, second=0, microsecond=0)
        st = hours.setdefault(h, [0, 0])
        st[0] += 1
        st[1] += 1 if e["event_type"] == "error" else 0
    ordered = sorted(hours.items())
    assert len(rows) == len(ordered)
    for i, (r, (h, (n_ev, n_err))) in enumerate(zip(rows, ordered)):
        assert r["hour"] == h and (r["n_events"], r["n_errors"]) == (n_ev, n_err)
        base = ordered[max(0, i - 24) : i]
        b_ev = sum(x[1][0] for x in base)
        b_err = sum(x[1][1] for x in base)
        assert (r["base_events"], r["base_errors"]) == (b_ev, b_err)
        expect_burst = 1 if b_ev > 0 and n_err * b_ev > 3 * b_err * n_ev else 0
        assert r["is_burst"] == expect_burst
