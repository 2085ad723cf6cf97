"""Invariant tests for batches 33-35 (relational33/34/35):
first-principles recomputes independent of the oracle SQL."""

from __future__ import annotations

import hashlib
import math

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_late_ship_priority_counts_reconcile(spark):
    """high + low line counts must equal an independently-built count
    of qualifying lines, and every returnflag class must appear."""
    rows = plans.REGISTRY["late_ship_priority_matrix"].build(spark, SF).collect()
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    joined = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.datediff("l_shipdate", "o_orderdate") > 90)
    )
    total = joined.count()
    assert sum(r["high_line_count"] + r["low_line_count"] for r in rows) == total
    high = joined.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
    assert sum(r["high_line_count"] for r in rows) == high
    assert {r["l_returnflag"] for r in rows} <= {"A", "N", "R"}


def test_dominant_supplier_is_unique_per_part(spark):
    """A >50% share is unique: no part may be counted for two
    suppliers, so the sum of n_parts_dominated over ALL nations is at
    most the number of parts in the family."""
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF}/part.parquet")
    fam = pt.filter(F.col("p_name").like("small %")).select("p_partkey")
    ps = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(fam, li.l_partkey == fam.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("cq"))
    )
    # python recompute of dominance
    per_part: dict[int, list[tuple[int, int]]] = {}
    for r in ps.collect():
        per_part.setdefault(r["l_partkey"], []).append((r["l_suppkey"], r["cq"]))
    dominated = {
        pk: [s for s, q in sup if 2 * q > sum(x for _, x in sup)]
        for pk, sup in per_part.items()
    }
    assert all(len(v) <= 1 for v in dominated.values())
    rows = plans.REGISTRY["part_dominant_suppliers"].build(spark, SF).collect()
    assert sum(r["n_parts_dominated"] for r in rows) <= sum(
        1 for v in dominated.values() if v
    )


def test_chi2_replays_from_contingency(spark):
    """The statistic replays from the raw contingency counts with the
    textbook formula; dof = (|prio|-1)(|status|-1)."""
    row = plans.REGISTRY["priority_status_chi2"].build(spark, SF).collect()[0]
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderpriority", "o_orderstatus"
    )
    cells: dict[tuple[str, str], int] = {}
    for r in o.collect():
        k = (r["o_orderpriority"], r["o_orderstatus"])
        cells[k] = cells.get(k, 0) + 1
    n = sum(cells.values())
    rows_m: dict[str, int] = {}
    cols_m: dict[str, int] = {}
    for (p, s), c in cells.items():
        rows_m[p] = rows_m.get(p, 0) + c
        cols_m[s] = cols_m.get(s, 0) + c
    # densified: zero-count cells still contribute (0-E)^2/E = E
    dense = {(p, s): cells.get((p, s), 0) for p in rows_m for s in cols_m}
    stat = sum(
        (c - rows_m[p] * cols_m[s] / n) ** 2 / (rows_m[p] * cols_m[s] / n)
        for (p, s), c in dense.items()
    )
    assert row["n_rows"] == n and row["n_cells"] == len(dense)
    assert row["dof"] == (len(rows_m) - 1) * (len(cols_m) - 1)
    # half-away rounding like the kernels (stat is positive)
    assert row["chi2_stat"] == math.floor(stat * 1e4 + 0.5) / 1e4


def test_quota_sample_exact_k_smallest_hashes(spark):
    """Each stratum returns exactly min(k, population) docs and they
    are EXACTLY the k smallest md5(doc_id) (key tie-break)."""
    out: dict[str, list[int]] = {}
    for r in plans.REGISTRY["lang_quota_sample"].build(spark, SF).collect():
        out.setdefault(r["lang"], []).append(r["doc_id"])
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("lang", "doc_id").collect()
    pop: dict[str, list[int]] = {}
    for r in docs:
        pop.setdefault(r["lang"], []).append(r["doc_id"])
    assert set(out) == set(pop)
    for lang, ids in pop.items():
        k = min(40, len(ids))
        expect = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
        assert sorted(out[lang]) == sorted(expect), lang


def test_approx_distinct_flags_and_positive_counts(spark):
    rows = plans.REGISTRY["approx_distinct_audit"].build(spark, SF).collect()
    assert {r["entity"] for r in rows} == {"customer", "part", "supplier"}
    for r in rows:
        assert r["n_exact"] > 0
        assert r["approx_within_15pct"] is True


def test_fk_orphan_audit_clean_on_generator_data(spark):
    """The generator keeps FK validity, so every relation reports zero
    orphans with a NULL example."""
    rows = plans.REGISTRY["fk_orphan_audit"].build(spark, SF).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_orphans"] == 0 and r["example_key"] is None


def test_skew_diagnostics_replay_one_leg(spark):
    """The suppkey leg replays from a raw python fold: counts, max,
    skew factor, hottest key with the min-key tie-break."""
    rows = {
        r["key_col"]: r
        for r in plans.REGISTRY["join_key_skew_diagnostics"].build(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_suppkey").collect()
    per: dict[int, int] = {}
    for r in li:
        per[r["l_suppkey"]] = per.get(r["l_suppkey"], 0) + 1
    r = rows["lineitem.l_suppkey"]
    mx = max(per.values())
    assert r["n_keys"] == len(per)
    assert r["n_rows"] == sum(per.values())
    assert r["max_rows_per_key"] == mx
    assert r["hottest_key"] == min(k for k, v in per.items() if v == mx)
    skew = mx * len(per) / sum(per.values())
    assert r["skew_factor"] == math.floor(skew * 1e4 + 0.5) / 1e4


def test_group_percentiles_ordered_and_counted(spark):
    rows = plans.REGISTRY["group_percentiles_exact"].build(spark, SF).collect()
    li_n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert sum(r["n_rows"] for r in rows) == li_n
    for r in rows:
        assert r["p25"] <= r["p50"] <= r["p75"] <= r["p99"]


def test_order_reconciliation_buckets_partition_orders(spark):
    """Buckets partition ALL orders; the no_lines count equals an
    independent anti-join count; drift is zero only where defined."""
    rows = {r["bucket"]: r for r in plans.REGISTRY["order_total_reconciliation"].build(spark, SF).collect()}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert sum(r["n_orders"] for r in rows.values()) == o.count()
    childless = o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").count()
    assert rows["no_lines"]["n_orders"] == childless
    assert rows["no_lines"]["abs_drift_cents"] == 0
    for name, r in rows.items():
        if name not in ("no_lines", "exact"):
            assert r["abs_drift_cents"] > 0


def test_anova_replays_from_sufficient_stats(spark):
    """F replays from a raw python fold of (n, sum, sumsq) per flag;
    ss_between + ss_within equals total sum of squares."""
    row = plans.REGISTRY["returnflag_price_anova"].build(spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    stats: dict[str, list[int]] = {}
    for r in li:
        c = math.floor(r["l_extendedprice"] * 100 + 0.5)
        st = stats.setdefault(r["l_returnflag"], [0, 0, 0])
        st[0] += 1; st[1] += c; st[2] += c * c
    k = len(stats); n = sum(s[0] for s in stats.values())
    s = float(sum(s[1] for s in stats.values())); q = float(sum(s[2] for s in stats.values()))
    sb_part = sum(float(v[1]) * float(v[1]) / v[0] for v in stats.values())
    ssb = sb_part - s * s / n; ssw = q - sb_part
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (row["n_groups"], row["n_rows"]) == (k, n)
    assert row["dof_between"] == k - 1 and row["dof_within"] == n - k
    assert abs(row["f_stat"] - f) < 1e-3
    assert abs(row["ss_between"] + row["ss_within"] - (q - s * s / n) / 1e4) < 1.0


def test_benford_shares_and_counts_reconcile(spark):
    """Observed shares sum to ~1, counts sum to the positive-price
    line count, and the benford shares are the theoretical law."""
    rows = plans.REGISTRY["benford_first_digit_audit"].build(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n_pos = li.filter(li.l_extendedprice > 0).count()
    assert sum(r["n"] for r in rows) == n_pos
    assert abs(sum(r["observed_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r["benford_share"] - math.log10(1 + 1 / r["digit"])) < 1e-9
        assert abs(r["abs_dev"] - abs(r["observed_share"] - r["benford_share"])) < 2e-6
