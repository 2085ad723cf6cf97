"""Invariant tests for batch 31 (relational31): backlog aging, DiD
uplift, duplicate invoices — first-principles recomputes independent of
the oracle SQL."""

from __future__ import annotations

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_backlog_aging_matches_python(spark):
    """Bucket counts and cents replay from raw orders; only non-final
    statuses appear; buckets are capped at 7."""
    rows = plans.REGISTRY["orders_backlog_aging"].build(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    mx = max(o["o_orderdate"] for o in orders)
    expect: dict[tuple, list[int]] = {}
    for o in orders:
        if o["o_orderstatus"] == "F":
            continue
        b = min((mx - o["o_orderdate"]).days // 90, 7)
        st = expect.setdefault((o["o_orderstatus"], b), [0, 0])
        st[0] += 1
        st[1] += round(o["o_totalprice"] * 100)
    assert {(r["status"], r["age_bucket"]): [r["n_orders"], r["backlog_cents"]] for r in rows} == expect
    assert all(0 <= r["age_bucket"] <= 7 and r["status"] != "F" for r in rows)


def test_did_estimate_combines_cell_means(spark):
    """All four cells present; the shared DiD estimate equals the
    closed form over the cells' exact means; cells reconcile with a
    raw recompute."""
    rows = plans.REGISTRY["promo_uplift_did"].build(spark, SF).collect()
    assert len(rows) == 4
    cells = {(r["is_promo"], r["is_after"]): r for r in rows}
    means = {k: r["cents"] / r["n_lines"] for k, r in cells.items()}
    expect = round(
        (means[(1, 1)] - means[(1, 0)]) - (means[(0, 1)] - means[(0, 0)]), 4
    )
    did = {r["did_estimate"] for r in rows}
    assert len(did) == 1
    assert abs(did.pop() - expect) < 1e-6
    import datetime as dt

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_partkey", "l_shipdate", "l_extendedprice").collect()
    promo = {r["p_partkey"] for r in spark.read.parquet(f"{SF}/part.parquet").collect() if r["p_type"] == "PROMO"}
    raw: dict[tuple, list[int]] = {}
    for l in li:
        k = (1 if l["l_partkey"] in promo else 0, 1 if l["l_shipdate"] >= dt.datetime(1998, 1, 1) else 0)
        st = raw.setdefault(k, [0, 0])
        st[0] += 1
        st[1] += round(l["l_extendedprice"] * 100)
    assert {k: [r["n_lines"], r["cents"]] for k, r in cells.items()} == raw


def test_duplicate_invoices_match_python(spark):
    """Same-day multi-order groups replay exactly, including the
    identical-amount flag."""
    rows = {(r["o_custkey"], r["o_orderdate"]): r for r in plans.REGISTRY["duplicate_invoice_groups"].build(spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    groups: dict[tuple, list] = {}
    for o in orders:
        groups.setdefault((o["o_custkey"], o["o_orderdate"]), []).append(
            (o["o_orderkey"], round(o["o_totalprice"] * 100))
        )
    expect = {k: v for k, v in groups.items() if len(v) > 1}
    assert set(rows) == set(expect)
    for k, v in expect.items():
        r = rows[k]
        amounts = [c for _, c in v]
        assert r["n_orders"] == len(v)
        assert r["n_amounts"] == len(set(amounts))
        assert r["total_cents"] == sum(amounts)
        assert r["first_orderkey"] == min(ok for ok, _ in v)
        assert r["has_identical_amounts"] == (1 if len(set(amounts)) < len(v) else 0)
