"""Invariant tests for batch 27 (relational27): KS test, reorder
cycles, priority sequences, split leakage — first-principles recomputes
independent of the oracle SQL."""

from __future__ import annotations

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _delays(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    od = {r["o_orderkey"]: r["o_orderdate"] for r in spark.read.parquet(f"{SF}/orders.parquet").collect()}
    out = []
    for l in li:
        if l["l_returnflag"] in ("R", "N"):
            out.append(((l["l_shipdate"] - od[l["l_orderkey"]]).days, l["l_returnflag"]))
    return out


def test_ks_statistic_matches_python_edf(spark):
    """The KS D* and its arg-delay replay exactly from a pure-Python
    EDF scan."""
    row = plans.REGISTRY["ship_delay_ks_test"].build(spark, SF).collect()[0]
    delays = _delays(spark)
    rs = sorted(d for d, f in delays if f == "R")
    ns = sorted(d for d, f in delays if f == "N")
    support = sorted(set(rs) | set(ns))
    import bisect

    best, best_at = -1, None
    for d in support:
        cr = bisect.bisect_right(rs, d)
        cn = bisect.bisect_right(ns, d)
        diff = abs(cr * len(ns) - cn * len(rs))
        if diff > best:
            best, best_at = diff, d
    assert (row["n_r"], row["n_n"]) == (len(rs), len(ns))
    assert (row["d_star"], row["delay_at_max"]) == (best, best_at)
    assert abs(row["ks_d"] - round(best / (len(rs) * len(ns)), 6)) < 1e-12


def test_reorder_cycles_telescope_and_median(spark):
    """Mean gap telescopes to span/(n-1); medians match the two-middle
    convention on a Python replay for a sample of parts."""
    rows = {r["partkey"]: r for r in plans.REGISTRY["part_reorder_cycles"].build(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_partkey").collect()
    od = {r["o_orderkey"]: r["o_orderdate"] for r in spark.read.parquet(f"{SF}/orders.parquet").collect()}
    dates: dict[int, set] = {}
    for l in li:
        dates.setdefault(l["l_partkey"], set()).add(od[l["l_orderkey"]])
    checked = 0
    for pk, ds in dates.items():
        ds = sorted(ds)
        if len(ds) < 4:
            assert pk not in rows
            continue
        gaps = sorted((b - a).days for a, b in zip(ds, ds[1:]))
        n = len(gaps)
        m2 = gaps[(n + 1) // 2 - 1] + gaps[n // 2]
        r = rows[pk]
        assert r["n_dates"] == len(ds)
        assert r["span_days"] == (ds[-1] - ds[0]).days == sum(gaps)
        # engines round half-away; Python's round() is banker's — use
        # the floor(x*1e4+0.5) form for exact .xxxx5 ties like 71.28125
        import math

        assert abs(r["mean_gap"] - math.floor(sum(gaps) / n * 1e4 + 0.5) / 1e4) < 1e-9
        assert r["median_gap_x2"] == m2
        checked += 1
    assert checked == len(rows)


def test_priority_sequences_reconstruct(spark):
    """Pattern counts replay from a Python per-customer ordered scan."""
    rows = {r["pattern"]: r["n_customers"] for r in plans.REGISTRY["customer_priority_sequences"].build(spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    per: dict[int, list] = {}
    for o in orders:
        per.setdefault(o["o_custkey"], []).append(
            (o["o_orderdate"], o["o_orderkey"], o["o_orderpriority"][0])
        )
    expect: dict[str, int] = {}
    for v in per.values():
        v.sort()
        pat = "".join(p for _, _, p in v[:8])
        expect[pat] = expect.get(pat, 0) + 1
    assert rows == expect


def test_split_leakage_counts_partition_candidates(spark):
    """Leakage cells partition the LSH candidate pair list; off-diagonal
    cells have n_leaking == n_pairs, diagonal cells zero."""
    rows = plans.REGISTRY["split_leakage_audit"].build(spark, SF).collect()
    import grocery_store_sales_forecasting_etl_pipeline_spark.operators.dedup as dd

    d = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = dd.minhash_signatures(d, "doc_id", "text", k=2, n_hashes=8)
    n_cand = dd.lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2).count()
    assert sum(r["n_pairs"] for r in rows) == n_cand
    for r in rows:
        assert r["split_a"] <= r["split_b"]
        if r["split_a"] == r["split_b"]:
            assert r["n_leaking"] == 0
        else:
            assert r["n_leaking"] == r["n_pairs"]
