"""Invariant tests for batch 23 (relational23): MAD outliers, embedding
dimension audit, vocabulary coverage curve, purchase path attribution —
first-principles recomputes independent of the oracle SQL."""

from __future__ import annotations

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_mad_outliers_match_python_medians(spark):
    """Median, MAD, and outlier counts equal a pure-Python recompute
    with the same two-middle integer convention."""
    rows = {r["nation"]: r for r in plans.REGISTRY["nation_balance_mad_outliers"].build(spark, SF).collect()}
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    nat = {r["n_nationkey"]: r["n_name"] for r in spark.read.parquet(f"{SF}/nation.parquet").collect()}
    groups: dict[str, list[int]] = {}
    for c in cust:
        groups.setdefault(nat[c["c_nationkey"]], []).append(round(c["c_acctbal"] * 100))

    def two_mid(vals: list[int]) -> int:
        vals = sorted(vals)
        n = len(vals)
        return vals[(n + 1) // 2 - 1] + vals[n // 2]

    for nation, cents in groups.items():
        m2 = two_mid(cents)
        devs = [abs(2 * c - m2) for c in cents]
        mad2 = two_mid(devs)
        n_out = sum(1 for d in devs if 2 * d > 3 * mad2)
        r = rows[nation]
        assert (r["n_customers"], r["median_cents_x2"], r["mad_cents_x4"]) == (
            len(cents),
            m2,
            mad2,
        )
        assert (r["n_outliers"], r["max_dev_x2"]) == (n_out, max(devs))


def test_embedding_dim_audit_exact_sums(spark):
    """Per-dimension integer sums match numpy-free Python accumulation;
    variance is the closed form over those exact sums."""
    rows = {r["dim"]: r for r in plans.REGISTRY["embedding_dim_audit"].build(spark, SF).collect()}
    embs = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    import math

    dims = len(embs[0]["embedding"])
    assert set(rows) == set(range(dims))
    for d in (0, 1, dims // 2, dims - 1):
        vms = [math.floor(abs(float(e["embedding"][d])) * 1e6 + 0.5) * (1 if float(e["embedding"][d]) >= 0 else -1) for e in embs]
        r = rows[d]
        assert r["n_vals"] == len(vms)
        assert r["sum_micro"] == sum(vms)
        assert r["n_zero"] == sum(1 for v in vms if v == 0)
        n, s, ss = len(vms), sum(vms), sum(v * v for v in vms)
        assert abs(r["var_micro"] - round((ss - s * s / n) / n, 4)) < 1e-6


def test_vocab_coverage_monotone_and_exact(spark):
    """Coverage shares are non-decreasing in rank and match a Python
    token count; the final share never exceeds 1."""
    rows = sorted(
        plans.REGISTRY["vocab_coverage_curve"].build(spark, SF).collect(),
        key=lambda r: r["vocab_rank"],
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    counts: dict[str, int] = {}
    for d in docs:
        if d["text"] is None:
            continue
        for t in d["text"].split(" "):
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    prev_share = 0.0
    for r in rows:
        k = r["vocab_rank"]
        assert r["token"] == ranked[k - 1][0]
        assert r["token_count"] == ranked[k - 1][1]
        expect_cum = sum(c for _, c in ranked[:k])
        assert r["cum_tokens"] == expect_cum
        assert abs(r["cum_share"] - round(expect_cum / total, 4)) < 1e-9
        assert r["cum_share"] >= prev_share
        prev_share = r["cum_share"]
    assert rows[-1]["cum_share"] <= 1.0


def test_purchase_attribution_paths_python_scan(spark):
    """Path grouping matches a pure-Python per-user ordered replay."""
    rows = {r["user_id"]: r for r in plans.REGISTRY["purchase_attribution_paths"].build(spark, SF).collect()}
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    streams: dict[int, list] = {}
    for e in events:
        if e["event_type"] in ("click", "purchase"):
            streams.setdefault(e["user_id"], []).append(
                (e["ts"], e["event_id"], e["event_type"], round(e["value"] * 100))
            )
    assert set(rows) == set(streams)
    for uid, evs in streams.items():
        evs.sort()
        n_purch = n_conv = attributed = purch_cents = orphan = path_clicks = 0
        clicks_in_path = 0
        for _, _, typ, cents in evs:
            if typ == "click":
                clicks_in_path += 1
            else:
                n_purch += 1
                purch_cents += cents
                path_clicks += clicks_in_path
                if clicks_in_path > 0:
                    n_conv += 1
                    attributed += cents
                clicks_in_path = 0
        orphan = clicks_in_path
        r = rows[uid]
        assert (
            r["n_purchases"],
            r["n_converting"],
            r["attributed_cents"],
            r["purchase_cents"],
            r["orphan_clicks"],
            r["path_clicks"],
        ) == (n_purch, n_conv, attributed, purch_cents, orphan, path_clicks)
