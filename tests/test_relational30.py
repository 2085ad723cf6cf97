"""Invariant tests for batch 30 (relational30): QoQ growth, lateness
audit, repeat rates — first-principles recomputes independent of the
oracle SQL."""

from __future__ import annotations

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_qoq_growth_matches_python(spark):
    """Quarter revenue and growth replay from raw orders; first
    quarters are NULL."""
    rows = plans.REGISTRY["region_quarter_growth"].build(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    cust = {r["c_custkey"]: r["c_nationkey"] for r in spark.read.parquet(f"{SF}/customer.parquet").collect()}
    nat = {r["n_nationkey"]: r["n_regionkey"] for r in spark.read.parquet(f"{SF}/nation.parquet").collect()}
    reg = {r["r_regionkey"]: r["r_name"] for r in spark.read.parquet(f"{SF}/region.parquet").collect()}
    rev: dict[tuple, int] = {}
    for o in orders:
        region = reg[nat[cust[o["o_custkey"]]]]
        yq = o["o_orderdate"].year * 10 + (o["o_orderdate"].month - 1) // 3 + 1
        rev[(region, yq)] = rev.get((region, yq), 0) + round(o["o_totalprice"] * 100)
    assert {(r["region"], r["yq"]): r["rev_cents"] for r in rows} == rev
    per_region: dict[str, list] = {}
    for r in rows:
        per_region.setdefault(r["region"], []).append(r)
    for rs in per_region.values():
        rs.sort(key=lambda r: r["yq"])
        assert rs[0]["qoq_growth"] is None and rs[0]["prev_cents"] is None
        for prev, cur in zip(rs, rs[1:]):
            assert cur["prev_cents"] == prev["rev_cents"]
            expect = round((cur["rev_cents"] - prev["rev_cents"]) / prev["rev_cents"], 4)
            assert abs(cur["qoq_growth"] - expect) < 1e-9


def test_lateness_audit_matches_python(spark):
    """Per-user running-max lateness replays exactly in arrival
    (event_id) order."""
    rows = {r["hour"]: r for r in plans.REGISTRY["event_lateness_audit"].build(spark, SF).collect()}
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    per: dict[int, list] = {}
    for e in events:
        per.setdefault(e["user_id"], []).append((e["event_id"], e["ts"]))
    hour_stats: dict = {}
    for evs in per.values():
        evs.sort()
        mx = None
        for _, ts in evs:
            late = max(((mx - ts).total_seconds() if mx and mx > ts else 0.0), 0.0)
            h = ts.replace(minute=0, second=0, microsecond=0)
            st = hour_stats.setdefault(h, [0, 0, 0])
            st[0] += 1
            if late > 0:
                st[1] += 1
                st[2] = max(st[2], int(late))
            mx = ts if mx is None or ts > mx else mx
    assert set(rows) == set(hour_stats)
    for h, (n, n_late, mx_s) in hour_stats.items():
        r = rows[h]
        assert (r["n_events"], r["n_late"]) == (n, n_late)
        assert r["max_lateness_s"] == mx_s
        assert abs(r["late_frac"] - round(n_late / n, 4)) < 1e-9


def test_repeat_rate_matches_python(spark):
    """Brand buyer/repeat counts replay from the raw join."""
    rows = {r["brand"]: r for r in plans.REGISTRY["brand_repeat_rate"].build(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_partkey").collect()
    brand = {r["p_partkey"]: r["p_brand"] for r in spark.read.parquet(f"{SF}/part.parquet").collect()}
    cust = {r["o_orderkey"]: r["o_custkey"] for r in spark.read.parquet(f"{SF}/orders.parquet").collect()}
    orders_per: dict[tuple, set] = {}
    for l in li:
        k = (brand[l["l_partkey"]], cust[l["l_orderkey"]])
        orders_per.setdefault(k, set()).add(l["l_orderkey"])
    buyers: dict[str, list[int]] = {}
    for (b, _), oks in orders_per.items():
        buyers.setdefault(b, []).append(len(oks))
    assert set(rows) == set(buyers)
    for b, counts in buyers.items():
        r = rows[b]
        assert r["n_buyers"] == len(counts)
        assert r["n_repeat"] == sum(1 for c in counts if c >= 2)
