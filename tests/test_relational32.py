"""Invariant tests for batch 32 (relational32): contiguity and
name/key audits — first-principles recomputes independent of the
oracle SQL."""

from __future__ import annotations

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_contiguity_categories_partition_orders(spark):
    """Category classification replays from raw line numbers; classes
    partition all orders."""
    rows = {r["category"]: r for r in plans.REGISTRY["order_lines_contiguity_audit"].build(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_linenumber").collect()
    per: dict[int, list[int]] = {}
    for l in li:
        per.setdefault(l["l_orderkey"], []).append(l["l_linenumber"])
    expect: dict[str, list[int]] = {}
    for ok, lns in per.items():
        if len(set(lns)) < len(lns):
            cat = "duplicated"
        elif min(lns) == 1 and max(lns) == len(lns):
            cat = "contiguous"
        else:
            cat = "gapped"
        st = expect.setdefault(cat, [0, 0, 1 << 62])
        st[0] += 1
        st[1] += len(lns)
        st[2] = min(st[2], ok)
    assert set(rows) == set(expect)
    for cat, (n_orders, n_lines, example) in expect.items():
        r = rows[cat]
        assert (r["n_orders"], r["n_lines"], r["example_orderkey"]) == (n_orders, n_lines, example)
    assert sum(r["n_orders"] for r in rows.values()) == len(per)


def test_name_key_audit_is_clean_on_generator_data(spark):
    """The generator's names embed their keys, so the audit reports
    full matches, zero mismatches, NULL examples — and the counts
    reconcile with the table sizes."""
    rows = {r["entity"]: r for r in plans.REGISTRY["name_key_consistency_audit"].build(spark, SF).collect()}
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    n_supp = spark.read.parquet(f"{SF}/supplier.parquet").count()
    assert rows["customer"]["n_rows"] == rows["customer"]["n_match"] == n_cust
    assert rows["supplier"]["n_rows"] == rows["supplier"]["n_match"] == n_supp
    for r in rows.values():
        assert r["n_unparsed"] == 0 and r["n_mismatch"] == 0
        assert r["example_mismatch_key"] is None
