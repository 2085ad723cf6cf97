"""Invariant tests for batch 45: nearest-as-of replayed with literal
per-user searches, percentile selections replayed against sorted
python lists."""

from __future__ import annotations

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_nearest_click_replays_with_linear_search(spark):
    rows = {
        r["event_id"]: r
        for r in plans.REGISTRY["nearest_click_join"].build(spark, SF).collect()
    }
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    checked = 0
    for user, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_type"] == "purchase", r["event_id"]))
        clicks = [r for r in evs if r["event_type"] == "click"]
        for p in (r for r in evs if r["event_type"] == "purchase"):
            backs = [c for c in clicks if c["ts"] <= p["ts"]]
            fwds = [c for c in clicks if c["ts"] > p["ts"]]
            # unix_timestamp()/date_diff('second') truncate each
            # timestamp to whole seconds BEFORE subtracting
            trunc = lambda t: t.replace(microsecond=0)
            bg = (
                int((trunc(p["ts"]) - trunc(backs[-1]["ts"])).total_seconds())
                if backs
                else None
            )
            fg = (
                int((trunc(fwds[0]["ts"]) - trunc(p["ts"])).total_seconds())
                if fwds
                else None
            )
            bok = bg is not None and bg <= 1800
            fok = fg is not None and fg <= 1800
            if bok and (fg is None or bg <= fg or fg > 1800):
                want = ("back", bg)
            elif fok:
                want = ("fwd", fg)
            else:
                want = (None, None)
            got = rows[p["event_id"]]
            assert (got["direction"], got["gap_seconds"]) == want, p["event_id"]
            checked += 1
    assert checked > 100
    # every purchase appears exactly once
    n_purch = sum(1 for r in ev if r["event_type"] == "purchase")
    assert len(rows) == n_purch


def _exact_pcts(vals):
    s = sorted(vals)
    n = len(s)
    return (
        s[(n + 1) // 2 - 1],
        s[(n + 2) // 2 - 1],
        # p90: smallest v with cum*10 >= n*9 == element at ceil(0.9n)
        s[-(-9 * n // 10) - 1],
    )


def test_repeat_gap_percentiles_replay(spark):
    rows = {
        r["segment"]: r
        for r in plans.REGISTRY["repeat_purchase_gap_percentiles"].build(spark, SF).collect()
    }
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    data = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_custkey", F.col("o_orderdate").cast("date").alias("d"))
        .collect()
    )
    per_cust: dict = {}
    seg_of: dict = {}
    for r in data:
        per_cust.setdefault(r["o_custkey"], []).append(r["d"])
        seg_of[r["o_custkey"]] = r["c_mktsegment"]
    gaps: dict = {}
    for ck, ds in per_cust.items():
        ds.sort()
        for a, b in zip(ds, ds[1:]):
            gaps.setdefault(seg_of[ck], []).append((b - a).days)
    assert set(rows) == set(gaps)
    for seg, gs in gaps.items():
        lo, hi, p90 = _exact_pcts(gs)
        r = rows[seg]
        assert r["n_gaps"] == len(gs)
        assert (r["median_lo_days"], r["median_hi_days"]) == (lo, hi)
        assert r["p90_days"] == p90
        assert lo <= hi <= p90


def test_dwell_percentiles_replay(spark):
    rows = {
        r["event_type"]: r
        for r in plans.REGISTRY["event_dwell_percentiles"].build(spark, SF).collect()
    }
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    dwells: dict = {}
    for evs in by_user.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for a, b in zip(evs, evs[1:]):
            d = int(
                (
                    b["ts"].replace(microsecond=0) - a["ts"].replace(microsecond=0)
                ).total_seconds()
            )
            if d <= 1800:
                dwells.setdefault(a["event_type"], []).append(d)
    assert set(rows) == set(dwells)
    for et, ds in dwells.items():
        lo, hi, p90 = _exact_pcts(ds)
        r = rows[et]
        assert r["n_dwells"] == len(ds)
        assert (r["median_lo_s"], r["median_hi_s"]) == (lo, hi)
        assert r["p90_s"] == p90
