"""Invariant tests for batch 89: CH/DB vs sklearn-free numpy replays,
Mantel-Haenszel vs stratified Counters, weighted Jaccard vs dict
fold, two-way ANOVA vs direct cell decomposition."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_cluster_validity_replay(spark):
    row = plans.REGISTRY["embedding_cluster_validity"].build(spark, SF).collect()[0]
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet").orderBy("vec_id").collect()
    )
    q = np.array(
        [[round(float(v) * 1_000_000) for v in r["embedding"]] for r in rows],
        dtype=np.float64,
    )
    labels = np.array([r["label"] for r in rows])
    uniq = sorted(set(labels))
    n, k = len(q), len(uniq)
    cents = {u: q[labels == u].mean(axis=0) for u in uniq}
    gmean = q.mean(axis=0)
    b = sum((labels == u).sum() * ((cents[u] - gmean) ** 2).sum() for u in uniq)
    w = sum(((q[labels == u] - cents[u]) ** 2).sum() for u in uniq)
    ch = (b / (k - 1)) / (w / (n - k))
    s = {
        u: np.sqrt(((q[labels == u] - cents[u]) ** 2).sum() / (labels == u).sum())
        for u in uniq
    }
    db = np.mean(
        [
            max(
                (s[i] + s[j]) / np.linalg.norm(cents[i] - cents[j])
                for j in uniq
                if j != i
            )
            for i in uniq
        ]
    )
    assert row["n_vectors"] == n
    assert row["n_clusters"] == k
    assert abs(row["calinski_harabasz"] - ch) < max(1e-3, 1e-5 * ch)
    assert abs(row["davies_bouldin"] - db) < 1e-3
    assert row["calinski_harabasz"] > 0
    assert row["davies_bouldin"] > 0


def test_mantel_haenszel_replay(spark):
    row = (
        plans.REGISTRY["return_discount_mantel_haenszel"].build(spark, SF).collect()[0]
    )
    raw = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_nationkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_nationkey",
            (F.col("l_discount") >= 0.05).alias("e"),
            (F.col("l_returnflag") == "R").alias("r"),
        )
        .collect()
    )
    strata = defaultdict(lambda: [0, 0, 0, 0])  # a b c d
    for x in raw:
        cell = (0 if x["e"] else 2) + (0 if x["r"] else 1)
        strata[x["c_nationkey"]][cell] += 1
    s_ad = s_bc = s_e = s_v = 0.0
    sum_a = 0
    total = 0
    for a, b, c, d in strata.values():
        nn = a + b + c + d
        total += nn
        sum_a += a
        s_ad += a * d / nn
        s_bc += b * c / nn
        s_e += (a + b) * (a + c) / nn
        s_v += (a + b) * (c + d) * (a + c) * (b + d) / (nn * nn * (nn - 1))
    assert row["n_strata"] == len(strata)
    assert row["n_lines"] == total
    assert row["exposed_returns"] == sum_a
    assert abs(row["mh_odds_ratio"] - s_ad / s_bc) < 1e-4
    assert abs(row["cmh_chi2"] - (sum_a - s_e) ** 2 / s_v) < 1e-3


def test_weighted_jaccard_replay(spark):
    rows = plans.REGISTRY["segment_brand_weighted_jaccard"].build(spark, SF).collect()
    raw = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("c_mktsegment", "p_brand", F.col("l_quantity").cast("long").alias("q"))
        .collect()
    )
    agg: Counter = Counter()
    for r in raw:
        agg[(r["c_mktsegment"], r["p_brand"])] += r["q"]
    segs = sorted({s for s, _ in agg})
    brands = sorted({b for _, b in agg})
    by_pair = {(r["seg_a"], r["seg_b"]): r for r in rows}
    assert len(rows) == len(segs) * (len(segs) - 1) // 2
    for i, sa in enumerate(segs):
        for sb in segs[i + 1 :]:
            smin = sum(min(agg.get((sa, b), 0), agg.get((sb, b), 0)) for b in brands)
            smax = sum(max(agg.get((sa, b), 0), agg.get((sb, b), 0)) for b in brands)
            r = by_pair[(sa, sb)]
            assert r["sum_min_qty"] == smin
            assert r["sum_max_qty"] == smax
            assert abs(r["weighted_jaccard"] - smin / smax) < 1e-5
            assert 0 <= r["weighted_jaccard"] <= 1


def test_twoway_anova_replay(spark):
    row = plans.REGISTRY["discount_tax_twoway_anova"].build(spark, SF).collect()[0]
    raw = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.round(F.col("l_discount") * 100).cast("long").alias("da"),
            F.round(F.col("l_tax") * 100).cast("long").alias("tb"),
            F.col("l_quantity").cast("long").alias("y"),
        )
        .collect()
    )
    cells = defaultdict(list)
    for r in raw:
        cells[(r["da"], r["tb"])].append(r["y"])
    ys = [r["y"] for r in raw]
    n = len(ys)
    grand = sum(ys) ** 2 / n
    sst = sum(y * y for y in ys) - grand
    ra = defaultdict(list)
    rb = defaultdict(list)
    for (da, tb), v in cells.items():
        ra[da].extend(v)
        rb[tb].extend(v)
    ssa = sum(sum(v) ** 2 / len(v) for v in ra.values()) - grand
    ssb = sum(sum(v) ** 2 / len(v) for v in rb.values()) - grand
    ss_cells = sum(sum(v) ** 2 / len(v) for v in cells.values()) - grand
    sse = sst - ss_cells
    ka, kb, nc = len(ra), len(rb), len(cells)
    mse = sse / (n - nc)
    assert row["n_lines"] == n
    assert row["n_discount_levels"] == ka
    assert row["n_tax_levels"] == kb
    assert abs(row["ss_discount"] - ssa) < max(0.1, 1e-8 * abs(ssa))
    assert abs(row["ss_tax"] - ssb) < max(0.1, 1e-8 * abs(ssb))
    assert abs(row["ss_interaction"] - (ss_cells - ssa - ssb)) < 0.5
    assert abs(row["ss_error"] - sse) < max(0.1, 1e-8 * sse)
    assert abs(row["f_discount"] - (ssa / (ka - 1)) / mse) < 1e-3
    assert abs(row["f_tax"] - (ssb / (kb - 1)) / mse) < 1e-3
    assert (
        abs(row["f_interaction"] - ((ss_cells - ssa - ssb) / ((ka - 1) * (kb - 1))) / mse)
        < 1e-3
    )
