"""Invariant tests for batch 48: LOO encodings algebraically invert to
group sums, WOE/IV recomputed from raw counts, hash-cross collision
accounting laws, and k-fold partition laws."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _label_by_order(spark):
    ret = {
        r["l_orderkey"]
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
        .collect()
    }
    return ret


def test_target_encoding_inverts_to_group_sums(spark):
    rows = plans.REGISTRY["target_encoding_loo"].build(spark, SF).collect()
    sums: dict = {}
    ns: dict = {}
    for r in rows:
        sums[r["priority"]] = sums.get(r["priority"], 0) + r["cents"]
        ns[r["priority"]] = ns.get(r["priority"], 0) + 1
    for r in rows[:2000]:
        n, s = ns[r["priority"]], sums[r["priority"]]
        expect = (s - r["cents"]) / (n - 1)
        assert abs(r["enc_loo"] - expect) < 5e-4
    # every category here has >1 member so no NULL encodings
    assert all(r["enc_loo"] is not None for r in rows)


def test_woe_iv_from_raw_counts(spark):
    rows = plans.REGISTRY["woe_iv_audit"].build(spark, SF).collect()
    tot_pos = sum(r["n_pos"] for r in rows)
    tot_neg = sum(r["n_neg"] for r in rows)
    iv = 0.0
    for r in rows:
        woe = (
            math.log(r["n_pos"])
            - math.log(tot_pos)
            - math.log(r["n_neg"])
            + math.log(tot_neg)
        )
        assert abs(r["woe"] - woe) < 1e-6
        gap = r["n_pos"] / tot_pos - r["n_neg"] / tot_neg
        assert abs(r["iv_term"] - gap * woe) < 1e-6
        # each IV term is non-negative (gap and woe share sign)
        assert r["iv_term"] >= -1e-9
        iv += gap * woe
    assert abs(rows[0]["total_iv"] - iv) < 1e-5
    assert len({r["total_iv"] for r in rows}) == 1


def test_hash_cross_collision_accounting(spark):
    row = plans.REGISTRY["hashed_feature_crosses"].build(spark, SF).collect()[0]
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    crosses = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.concat_ws(
                "|", "c_mktsegment", "o_orderpriority", "n_name"
            ).alias("k")
        )
        .groupBy("k")
        .count()
        .collect()
    )
    buckets: dict = {}
    for r in crosses:
        b = int(hashlib.md5(r["k"].encode()).hexdigest()[:6], 16) % 256
        cs, rs = buckets.get(b, (0, 0))
        buckets[b] = (cs + 1, rs + r["count"])
    assert row["n_crosses"] == len(crosses)
    assert row["buckets_used"] == len(buckets)
    assert row["max_bucket_crosses"] == max(c for c, _ in buckets.values())
    coll = sum(c for c, _ in buckets.values() if c > 1)
    assert row["colliding_crosses"] == coll
    assert row["rows_in_collisions"] == sum(
        r for c, r in buckets.values() if c > 1
    )
    assert abs(row["collision_rate"] - coll / len(crosses)) < 1e-6
    assert row["buckets_used"] <= 256


def test_kfold_partition_laws(spark):
    rows = sorted(
        plans.REGISTRY["kfold_assignment_audit"].build(spark, SF).collect(),
        key=lambda r: r["fold"],
    )
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert [r["fold"] for r in rows] == list(range(5))
    assert sum(r["n_orders"] for r in rows) == n_orders
    tot_pos = sum(r["n_pos"] for r in rows)
    base = tot_pos / n_orders
    for r in rows:
        assert abs(r["pos_rate"] - r["n_pos"] / r["n_orders"]) < 1e-6
        assert abs(r["dev_from_base"] - (r["n_pos"] / r["n_orders"] - base)) < 2e-6
        # hash folds are near-uniform in size (binomial 3-sigma bound)
        expect = n_orders / 5
        assert abs(r["n_orders"] - expect) < 4 * math.sqrt(expect)
