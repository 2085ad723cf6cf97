"""Invariant tests for batch 28 (relational28): windowed funnel,
label-centroid similarity, purchase velocity — first-principles
recomputes independent of the oracle SQL."""

from __future__ import annotations

import datetime as dt
import math

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_windowed_funnel_replays_in_python(spark):
    """Stage counts replay from a per-user ordered scan with the exact
    7-day hop windows; the windowed funnel never exceeds the
    min-timestamp funnel's conversions."""
    row = plans.REGISTRY["event_funnel_windowed"].build(spark, SF).collect()[0]
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    per: dict[int, list] = {}
    for e in events:
        per.setdefault(e["user_id"], []).append((e["ts"], e["event_type"]))
    hop = dt.timedelta(days=7)
    n_s = n_c = n_p = 0
    for evs in per.values():
        sign = [t for t, ty in evs if ty == "signup"]
        if not sign:
            continue
        n_s += 1
        t0 = min(sign)
        clicks = [t for t, ty in evs if ty == "click" and t0 < t <= t0 + hop]
        if not clicks:
            continue
        n_c += 1
        t1 = min(clicks)
        purch = [t for t, ty in evs if ty == "purchase" and t1 < t <= t1 + hop]
        if purch:
            n_p += 1
    assert (row["n_signup"], row["n_click_7d"], row["n_purchase_7d"]) == (n_s, n_c, n_p)
    assert n_s >= n_c >= n_p
    assert abs(row["click_rate"] - round(n_c / n_s, 4)) < 1e-9


def test_label_centroids_match_python(spark):
    """Centroid cosines replay from integer micro sums accumulated in
    Python (arbitrary precision)."""
    rows = plans.REGISTRY["label_centroid_similarity"].build(spark, SF).collect()
    embs = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    sums: dict[int, list[int]] = {}
    counts: dict[int, int] = {}
    for e in embs:
        lab = e["label"]
        v = [math.floor(abs(float(x)) * 1e6 + 0.5) * (1 if float(x) >= 0 else -1) for x in e["embedding"]]
        if lab not in sums:
            sums[lab] = [0] * len(v)
        for i, x in enumerate(v):
            sums[lab][i] += x
        counts[lab] = counts.get(lab, 0) + 1
    labs = sorted(sums)
    assert len(rows) == len(labs) * (len(labs) - 1) // 2
    by_pair = {(r["label_a"], r["label_b"]): r for r in rows}
    for i, a in enumerate(labs):
        for b in labs[i + 1 :]:
            sa, sb = sums[a], sums[b]
            dot = sum(x * y for x, y in zip(sa, sb))
            naa = sum(x * x for x in sa)
            nbb = sum(x * x for x in sb)
            r = by_pair[(a, b)]
            assert (r["n_a"], r["n_b"]) == (counts[a], counts[b])
            expect = dot / (math.sqrt(naa) * math.sqrt(nbb))
            assert abs(r["centroid_cosine"] - expect) < 1e-5


def test_velocity_flags_match_python(spark):
    """Trailing-hour burst counts replay from a per-user sorted scan."""
    rows = {r["user_id"]: r for r in plans.REGISTRY["purchase_velocity_flags"].build(spark, SF).collect()}
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    per: dict[int, list] = {}
    for e in events:
        if e["event_type"] == "purchase":
            per.setdefault(e["user_id"], []).append(e["ts"])
    assert set(rows) == set(per)
    hour = dt.timedelta(hours=1)
    for uid, ts in per.items():
        ts.sort()
        bursts = [sum(1 for u in ts if t - hour <= u <= t) for t in ts]
        r = rows[uid]
        assert r["n_purchases"] == len(ts)
        assert r["max_burst"] == max(bursts)
        assert r["n_flagged"] == sum(1 for b in bursts if b >= 3)
