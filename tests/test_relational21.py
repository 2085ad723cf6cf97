"""Invariant tests for batch 21 (relational21): Q14/Q22 shapes,
boilerplate flags, and the MinHash accuracy audit — first-principles
recomputes independent of the oracle SQL."""

from __future__ import annotations

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_promo_share_is_conditional_fraction(spark):
    """The share must equal promo/total per month, and the monthly
    totals must reconcile with an independent single-pass recompute."""
    rows = plans.REGISTRY["promo_revenue_share"].build(spark, SF).collect()
    assert len(rows) == 12  # every ship-month of 1997
    for r in rows:
        assert 0 <= r["promo_ccents"] <= r["total_ccents"]
        assert abs(r["promo_share"] - round(r["promo_ccents"] / r["total_ccents"], 4)) < 1e-9
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    total = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select(
            (
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("cc")
        )
        .agg(F.sum("cc"))
        .collect()[0][0]
    )
    assert sum(r["total_ccents"] for r in rows) == total


def test_idle_customers_are_above_avg_and_orderless(spark):
    """Every reported segment count must match a driver-side recompute
    from raw customer/orders rows."""
    out = {
        r["c_mktsegment"]: (r["n_customers"], r["total_cents"])
        for r in plans.REGISTRY["idle_customer_balance"].build(spark, SF).collect()
    }
    assert out
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    import datetime as dt

    cents = {r["c_custkey"]: round(r["c_acctbal"] * 100) for r in cust}
    pos = [c for c in cents.values() if c > 0]
    s, n = sum(pos), len(pos)
    recent = {
        r["o_custkey"]
        for r in orders
        if r["o_orderdate"] >= dt.datetime(2000, 1, 1)
    }
    expect: dict[str, list[int]] = {}
    for r in cust:
        c = cents[r["c_custkey"]]
        if c * n > s and r["c_custkey"] not in recent:
            expect.setdefault(r["c_mktsegment"], []).append(c)
    assert out == {k: (len(v), sum(v)) for k, v in expect.items()}


def test_boilerplate_fraction_bounds_and_df_threshold(spark):
    """Flags must respect the 1%-of-corpus DF threshold: recompute the
    boilerplate shingle set first-principles for a sample doc."""
    rows = plans.REGISTRY["doc_boilerplate_flags"].build(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert 0 <= r["n_boiler"] <= r["n_grams"]
    # independent recompute in pure Python
    shingles = {}
    for d in docs:
        tk = d["text"].split(" ")
        shingles[d["doc_id"]] = {f"{a} {b}" for a, b in zip(tk, tk[1:])}
    n_docs = len(docs)
    df: dict[str, int] = {}
    for ss in shingles.values():
        for sgl in ss:
            df[sgl] = df.get(sgl, 0) + 1
    by_id = {r["doc_id"]: r for r in rows}
    for doc_id in list(shingles)[:25]:
        ss = shingles[doc_id]
        boiler = sum(1 for sgl in ss if df[sgl] * 100 >= n_docs)
        r = by_id[doc_id]
        assert (r["n_grams"], r["n_boiler"]) == (len(ss), boiler)


def test_minhash_audit_estimator_vs_exact(spark):
    """For every audited pair: integer fields consistent, and the exact
    intersection/union agrees with a pure-Python shingle recompute."""
    rows = plans.REGISTRY["minhash_accuracy_audit"].build(spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    shingles = {}
    for d in docs:
        tk = d["text"].split(" ")
        shingles[d["doc_id"]] = {f"{a} {b}" for a, b in zip(tk, tk[1:])}
    for r in rows[:50]:
        a, b = shingles[r["id_1"]], shingles[r["id_2"]]
        inter = len(a & b)
        union = len(a | b)
        assert (r["inter"], r["union_sz"]) == (inter, union)
        assert 0 <= r["mh_matches"] <= 8
        expect_err = round(abs(r["mh_matches"] * union - 8 * inter) / (8 * union), 4)
        assert abs(r["abs_err"] - expect_err) < 1e-9
