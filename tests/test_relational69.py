"""Invariant tests for batch 69: fuzzy pairs vs a Python Levenshtein
replay, peak prominence vs a brute-force topographic sweep, CvM vs a
direct EDF integral, Theil vs replay plus the exact decomposition
identity."""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_replay(spark):
    rows = plans.REGISTRY["part_name_fuzzy_pairs"].build(spark, SF).collect()
    parts = spark.read.parquet(f"{SF}/part.parquet").select("p_name").collect()
    counts = defaultdict(int)
    for r in parts:
        counts[r["p_name"]] += 1
    by_noun = defaultdict(list)
    for name in counts:
        by_noun[name.split()[-1]].append(name)
    expect = {}
    for noun, names in by_noun.items():
        names.sort()
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                d = _lev(a, b)
                if d <= 3:
                    expect[(a, b)] = (noun, d)
    assert len(rows) == len(expect)
    for r in rows:
        noun, d = expect[(r["name_a"], r["name_b"])]
        assert r["block_noun"] == noun
        assert r["edit_distance"] == d
        assert r["n_parts_a"] == counts[r["name_a"]]
        assert r["n_parts_b"] == counts[r["name_b"]]
        assert r["name_a"] < r["name_b"]


def _weekly_dollars(spark, sf):
    rows = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .select(
            F.date_trunc("week", "o_orderdate").cast("date").alias("w"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("w")
        .agg(F.expr("sum(cents) DIV 100").alias("v"))
        .collect()
    )
    return sorted((r["w"], r["v"]) for r in rows)


def test_peak_prominence_replay(spark):
    rows = plans.REGISTRY["weekly_revenue_peaks"].build(spark, SF).collect()
    weekly = _weekly_dollars(spark, SF)
    vs = [v for _, v in weekly]
    n = len(vs)
    proms = {}
    for i in range(1, n - 1):
        if not (vs[i] > vs[i - 1] and vs[i] > vs[i + 1]):
            continue
        left_higher = [j for j in range(i) if vs[j] > vs[i]]
        right_higher = [j for j in range(i + 1, n) if vs[j] > vs[i]]
        lb = max(left_higher) if left_higher else None
        rb = min(right_higher) if right_higher else None
        lmin = min(vs[(lb + 1 if lb is not None else 0):i]) if i > 0 else None
        rmin = min(vs[i + 1:(rb if rb is not None else n)]) if i < n - 1 else None
        if lb is not None and rb is not None:
            key = max(lmin, rmin)
        elif lb is not None:
            key = lmin
        elif rb is not None:
            key = rmin
        else:
            key = min(vs[:i] + vs[i + 1:])
        proms[weekly[i][0]] = (vs[i], vs[i] - key)
    ranked = sorted(proms.items(), key=lambda kv: (-kv[1][1], kv[0]))[:10]
    assert len(rows) == min(10, len(proms))
    by_rank = {r["rnk"]: r for r in rows}
    for rk, (week, (v, p)) in enumerate(ranked, 1):
        r = by_rank[rk]
        assert r["peak_week"] == week
        assert r["peak_dollars"] == v
        assert r["prominence_dollars"] == p
        assert r["prominence_dollars"] > 0


def test_cvm_replay(spark):
    row = plans.REGISTRY["segment_value_cvm"].build(spark, SF).collect()[0]
    x = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            "c_mktsegment",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    a = sorted(r["cents"] for r in x if r["c_mktsegment"] == "BUILDING")
    b = sorted(r["cents"] for r in x if r["c_mktsegment"] == "MACHINERY")
    n, m = len(a), len(b)
    assert (row["n_building"], row["n_machinery"]) == (n, m)
    import bisect

    allv = sorted(a + b)
    acc = 0.0
    for v in allv:
        fa = bisect.bisect_right(a, v) / n
        fb = bisect.bisect_right(b, v) / m
        acc += (fa - fb) ** 2
    t = (n * m) / (n + m) ** 2 * acc
    assert abs(row["cvm_t"] - t) < 1e-5
    assert row["reject_05"] == (1 if t > 0.461 else 0)


def test_theil_replay_and_decomposition(spark):
    rows = plans.REGISTRY["nation_revenue_theil"].build(spark, SF).collect()
    cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_nationkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
        .collect()
    )
    per = defaultdict(list)
    for r in cust:
        if r["cents"] > 0:
            per[r["c_nationkey"]].append(r["cents"])
    n_tot = sum(len(v) for v in per.values())
    s_tot = sum(sum(v) for v in per.values())
    mu = s_tot / n_tot
    assert len(rows) == len(per)
    for r in rows:
        xs = per[r["nation"]]
        ng, sg = len(xs), sum(xs)
        mug = sg / ng
        tg = sum((x / mug) * math.log(x / mug) for x in xs) / ng
        share = sg / s_tot
        assert r["n_customers"] == ng
        assert r["total_cents"] == sg
        assert abs(r["theil_within"] - tg) < 1e-4
        assert abs(r["between_term"] - share * math.log(mug / mu)) < 1e-4
        assert abs(r["within_contrib"] - share * tg) < 1e-4
    # exact decomposition: sum(within_contrib) + sum(between_term) == T_total
    t_total = sum(
        (x / mu) * math.log(x / mu) for xs in per.values() for x in xs
    ) / n_tot
    got = sum(r["within_contrib"] for r in rows) + sum(
        r["between_term"] for r in rows
    )
    assert abs(got - t_total) < 1e-3
