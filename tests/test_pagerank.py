"""integer_pagerank operator semantics (the oracle-parity hash for
supplier_graph_pagerank lives in test_oracle_parity)."""

from __future__ import annotations

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark.operators.graph import integer_pagerank


def _ranks(spark, edges, iters=3):
    df = spark.createDataFrame(edges, ["u", "v"])
    return {r.v: r.mass for r in integer_pagerank(df, iters=iters).collect()}


def test_pagerank_star_hub_dominates(spark):
    # star: hub h connected to 4 leaves — hub must out-rank every leaf
    edges = [("h", f"l{i}") for i in range(4)]
    m = _ranks(spark, edges)
    assert set(m) == {"h", "l0", "l1", "l2", "l3"}
    assert all(m["h"] > m[f"l{i}"] for i in range(4))
    # leaves are symmetric => identical mass
    assert len({m[f"l{i}"] for i in range(4)}) == 1


def test_pagerank_symmetric_pair_reference_value(spark):
    # two nodes, one edge: every round each keeps 150000 and receives
    # floor(0.85 * m) of the other; masses stay equal by symmetry.
    m = _ranks(spark, [("a", "b")], iters=3)
    assert m["a"] == m["b"]
    exp = 1_000_000
    for _ in range(3):
        exp = 150_000 + (17 * exp) // 20
    assert m["a"] == exp


def test_pagerank_mass_is_bounded_and_deterministic(spark):
    # triangle + pendant, duplicated/reversed edges must not change
    # anything (canonicalization)
    base = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    noisy = base + [(v, u) for u, v in base] + base
    m1 = _ranks(spark, base)
    m2 = _ranks(spark, noisy)
    assert m1 == m2
    # teleport floor: every node keeps at least its teleport share
    assert all(v >= 150_000 for v in m1.values())
    # total mass can only shrink (floor division) vs n * init
    assert sum(m1.values()) <= 4 * 1_000_000


def test_pagerank_degree_weighting(spark):
    # path a-b-c: center b has degree 2, ends degree 1 => b out-ranks
    m = _ranks(spark, [("a", "b"), ("b", "c")])
    assert m["b"] > m["a"] == m["c"]
