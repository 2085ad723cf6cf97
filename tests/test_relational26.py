"""Invariant tests for batch 26 (relational26): discount lift,
audience overlap, basket sizes, weekday/hour heatmap — first-principles
recomputes independent of the oracle SQL."""

from __future__ import annotations

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_discount_lift_baseline_is_one(spark):
    """The zero-discount row has lift exactly 1.0; quantities and
    revenue reconcile with a raw-scan recompute."""
    rows = {r["discount_pct"]: r for r in plans.REGISTRY["discount_quantity_lift"].build(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    expect: dict[int, list[int]] = {}
    for l in li:
        d = round(l["l_discount"] * 100)
        st = expect.setdefault(d, [0, 0, 0])
        st[0] += 1
        st[1] += round(l["l_quantity"])
        st[2] += round(l["l_extendedprice"] * 100)
    assert {k: [r["n_lines"], r["total_qty"], r["revenue_cents"]] for k, r in rows.items()} == expect
    assert rows[0]["qty_lift"] == 1.0
    b = expect[0][1] / expect[0][0]
    for d, r in rows.items():
        per = expect[d][1] / expect[d][0]
        assert abs(r["qty_lift"] - round(per / b, 4)) < 1e-9


def test_audience_overlap_jaccard_exact(spark):
    """Pairwise audience intersections replay exactly from the raw
    event stream; jaccard is the closed form of the three counts."""
    rows = plans.REGISTRY["event_audience_overlap"].build(spark, SF).collect()
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    aud: dict[str, set[int]] = {}
    for e in events:
        aud.setdefault(e["event_type"], set()).add(e["user_id"])
    types = sorted(aud)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        a, b = aud[r["type_a"]], aud[r["type_b"]]
        assert r["type_a"] < r["type_b"]
        assert (r["n_a"], r["n_b"], r["n_both"]) == (len(a), len(b), len(a & b))
        assert abs(r["jaccard"] - round(len(a & b) / len(a | b), 4)) < 1e-9


def test_basket_sizes_partition_orders(spark):
    """Per-segment shares sum to 1 and the size histogram matches a
    Python replay over the raw join."""
    rows = plans.REGISTRY["basket_size_distribution"].build(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey").collect()
    orders = {r["o_orderkey"]: r["o_custkey"] for r in spark.read.parquet(f"{SF}/orders.parquet").collect()}
    seg = {r["c_custkey"]: r["c_mktsegment"] for r in spark.read.parquet(f"{SF}/customer.parquet").collect()}
    per_order: dict[int, int] = {}
    for l in li:
        per_order[l["l_orderkey"]] = per_order.get(l["l_orderkey"], 0) + 1
    expect: dict[tuple, int] = {}
    for ok, n in per_order.items():
        s = seg[orders[ok]]
        expect[(s, n)] = expect.get((s, n), 0) + 1
    assert {(r["segment"], r["basket_lines"]): r["n_orders"] for r in rows} == expect
    shares: dict[str, float] = {}
    for r in rows:
        shares[r["segment"]] = shares.get(r["segment"], 0.0) + r["share"]
    for s, tot in shares.items():
        assert abs(tot - 1.0) < 0.01


def test_heatmap_cells_and_iso_numbering(spark):
    """Cell counts replay from raw timestamps using Python's own ISO
    weekday (an independent implementation of the epoch formula)."""
    rows = plans.REGISTRY["weekday_hour_activity_heatmap"].build(spark, SF).collect()
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    expect: dict[tuple, int] = {}
    for e in events:
        k = (e["ts"].isoweekday(), e["ts"].hour)
        expect[k] = expect.get(k, 0) + 1
    assert {(r["isodow"], r["hr"]): r["n_events"] for r in rows} == expect
    total = len(events)
    for r in rows:
        assert abs(r["share"] - round(r["n_events"] / total, 4)) < 1e-9
