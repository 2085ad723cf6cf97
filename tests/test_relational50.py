"""Invariant tests for batch 50: mask patterns recomputed in python,
PK/FD verdicts checked against ground truth the star schema guarantees,
and the money audit cross-checked against the cents assumption the
whole repo rests on."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_pattern_profile_matches_python_masks(spark):
    rows = plans.REGISTRY["value_pattern_profile"].build(spark, SF).collect()
    names = [
        r["c_name"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").select("c_name").collect()
    ]
    masks: dict = {}
    for v in names:
        m = re.sub(r"[0-9]", "9", re.sub(r"[A-Za-z]", "a", v))
        masks[m] = masks.get(m, 0) + 1
    top = sorted(masks.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = sorted(
        [r for r in rows if r["column_name"] == "customer.c_name"],
        key=lambda r: r["rnk"],
    )
    assert [(r["pattern"], r["n"]) for r in got] == top
    for r in rows:
        assert 1 <= r["rnk"] <= 5
        assert 0 < r["share"] <= 1


def test_pk_candidate_verdicts(spark):
    rows = {r["candidate"]: r for r in
            plans.REGISTRY["pk_candidate_audit"].build(spark, SF).collect()}
    n = spark.read.parquet(f"{SF}/orders.parquet").count()
    # the declared key IS a key
    r = rows["o_orderkey"]
    assert r["is_key"] == 1 and r["duplicated_keys"] == 0
    assert r["n_key_values"] == n and r["max_multiplicity"] == 1
    # a double-typed price is (almost surely) not a key at 15k rows
    assert rows["o_totalprice"]["n_key_values"] <= n
    for r in rows.values():
        assert r["unique_keys"] + r["duplicated_keys"] == r["n_key_values"]
        assert (r["duplicated_keys"] == 0) == (r["is_key"] == 1)


def test_fd_verdicts(spark):
    rows = {r["fd"]: r for r in
            plans.REGISTRY["fd_violation_audit"].build(spark, SF).collect()}
    # a key-determined FD holds by construction
    assert rows["nation: n_nationkey -> n_regionkey"]["holds"] == 1
    # a behavioral FD over many orders per customer fails
    assert rows["orders: o_custkey -> o_orderpriority"]["holds"] == 0
    for r in rows.values():
        assert r["max_dependents"] >= 1
        assert (r["violating"] == 0) == (r["holds"] == 1)


def test_money_audit_validates_cents_assumption(spark):
    rows = {r["column_name"]: r for r in
            plans.REGISTRY["money_precision_audit"].build(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert rows["lineitem.l_extendedprice"]["n_values"] == li.count()
    for r in rows.values():
        assert r["min_cents"] <= r["max_cents"]
        assert 0 <= r["sub_cent_values"] <= r["n_values"]
    # prices in this corpus are positive
    assert all(r["non_positive"] == 0 for r in rows.values())
