"""Invariant tests for batch 25 (relational25): quartile migration,
trigram fuzzy search, rare-category collapse, seasonality index —
first-principles recomputes independent of the oracle SQL."""

from __future__ import annotations

import datetime as dt

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_migration_margins_reconcile(spark):
    """Row margins (q_from > 0) equal period-A customer counts per
    segment; column margins equal period-B counts; churn + retained
    rows partition period-A customers."""
    rows = plans.REGISTRY["rfm_migration_matrix"].build(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    cust = {r["c_custkey"]: r["c_mktsegment"] for r in spark.read.parquet(f"{SF}/customer.parquet").collect()}
    a_cust: dict[str, set[int]] = {}
    b_cust: dict[str, set[int]] = {}
    for o in orders:
        seg = cust[o["o_custkey"]]
        side = a_cust if o["o_orderdate"] < dt.datetime(1998, 1, 1) else b_cust
        side.setdefault(seg, set()).add(o["o_custkey"])
    for seg in set(a_cust) | set(b_cust):
        from_margin = sum(r["n_customers"] for r in rows if r["segment"] == seg and r["q_from"] > 0)
        to_margin = sum(r["n_customers"] for r in rows if r["segment"] == seg and r["q_to"] > 0)
        assert from_margin == len(a_cust.get(seg, set()))
        assert to_margin == len(b_cust.get(seg, set()))
    for r in rows:
        assert 0 <= r["q_from"] <= 4 and 0 <= r["q_to"] <= 4
        assert not (r["q_from"] == 0 and r["q_to"] == 0)


def test_fuzzy_search_scores_match_python(spark):
    """Trigram Jaccard scores replay exactly in Python; results are the
    true top-k under (jaccard desc, name asc)."""
    rows = plans.REGISTRY["char_trigram_fuzzy_search"].build(spark, SF).collect()
    names = {r["p_name"] for r in spark.read.parquet(f"{SF}/part.parquet").select("p_name").collect()}
    q = "red wodget"
    qg = {q[i : i + 3] for i in range(len(q) - 2)}
    scored = []
    for nm in names:
        g = {nm[i : i + 3] for i in range(len(nm) - 2)}
        inter = len(g & qg)
        if inter > 0:
            scored.append((round(inter / len(g | qg), 4), nm, len(g), inter))
    scored.sort(key=lambda x: (-x[0], x[1]))
    expect = scored[:10]
    assert [(r["jaccard"], r["p_name"], r["n_name_grams"], r["n_shared"]) for r in rows] == [
        (j, nm, ng, ns) for j, nm, ng, ns in expect
    ]
    assert rows[0]["p_name"] == "red widget"  # the typo still finds its target


def test_rare_collapse_threshold_and_mass(spark):
    """Collapsed mass + surviving categories partition the table; every
    surviving category is >= the 1.5% threshold and __other__ members
    are all below it."""
    rows = plans.REGISTRY["group_rare_category_collapse"].build(spark, SF).collect()
    parts = spark.read.parquet(f"{SF}/part.parquet").collect()
    counts: dict[str, int] = {}
    for p in parts:
        counts[p["p_name"]] = counts.get(p["p_name"], 0) + 1
    total = len(parts)
    rare = {c for c, n in counts.items() if n * 1000 < total * 15}
    by_cat = {r["category"]: r for r in rows}
    assert sum(r["n_parts"] for r in rows) == total
    if rare:
        other = by_cat["__other__"]
        assert other["n_parts"] == sum(counts[c] for c in rare)
        assert other["n_raw_categories"] == len(rare)
        assert other["collapsed"] == 1
    for cat, r in by_cat.items():
        if cat != "__other__":
            assert counts[cat] * 1000 >= total * 15
            assert (r["n_parts"], r["n_raw_categories"], r["collapsed"]) == (
                counts[cat],
                1,
                0,
            )


def test_seasonality_index_centers_at_one(spark):
    """Within each year the observed-month-weighted mean index is
    exactly 1 (up to the output rounding), and revenue reconciles."""
    rows = plans.REGISTRY["orders_seasonality_index"].build(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    month_rev: dict[tuple, int] = {}
    for o in orders:
        k = (o["o_orderdate"].year, o["o_orderdate"].month)
        month_rev[k] = month_rev.get(k, 0) + round(o["o_totalprice"] * 100)
    assert {(r["yr"], r["mon"]): r["rev_cents"] for r in rows} == month_rev
    years: dict[int, list] = {}
    for r in rows:
        years.setdefault(r["yr"], []).append(r)
    for yr, rs in years.items():
        year_cents = sum(r["rev_cents"] for r in rs)
        assert all(r["year_cents"] == year_cents for r in rs)
        mean_idx = sum(r["seasonal_index"] for r in rs) / len(rs)
        assert abs(mean_idx - 1.0) < 0.001
