"""Seeded randomized cross-checks for the graph operator family:
triangles vs brute force, k-core fixpoint vs iterative python peeling,
and integer PageRank mass conservation — on random graphs, not just the
hand-picked fixtures in test_pagerank/test_relational11/12."""

from __future__ import annotations

import itertools
import random

from grocery_store_sales_forecasting_etl_pipeline_spark.operators.graph import (
    integer_pagerank,
    kcore_peel,
    triangles,
)


def _random_graph(rng, n_nodes, n_edges):
    nodes = [f"n{i}" for i in range(n_nodes)]
    return [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(n_edges)
    ]


def _canon(edges):
    return {
        (min(u, v), max(u, v)) for u, v in edges if u != v
    }


def _brute_triangles(edges):
    adj = _canon(edges)
    nodes = sorted({x for e in adj for x in e})
    return sorted(
        (x, y, z)
        for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in adj and (x, z) in adj and (y, z) in adj
    )


def _python_kcore(edges, k):
    """Iterate degree-peeling to fixpoint; return {node: degree}."""
    adj = _canon(edges)
    while True:
        deg: dict[str, int] = {}
        for u, v in adj:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            return deg
        adj = {(u, v) for u, v in adj if u not in drop and v not in drop}


def test_triangles_match_brute_force_on_random_graphs(spark):
    rng = random.Random(20260814)
    for n_nodes, n_edges in [(8, 12), (12, 30), (15, 60), (20, 40)]:
        edges = _random_graph(rng, n_nodes, n_edges)
        if not _canon(edges):
            continue
        df = spark.createDataFrame(list(edges), ["u", "v"])
        got = sorted(tuple(r) for r in triangles(df).collect())
        assert got == _brute_triangles(edges), (n_nodes, n_edges)


def test_kcore_reaches_python_fixpoint_on_random_graphs(spark):
    rng = random.Random(31337)
    for n_nodes, n_edges, k in [(10, 25, 2), (14, 40, 3), (18, 36, 2)]:
        edges = _random_graph(rng, n_nodes, n_edges)
        if not _canon(edges):
            continue
        # rounds=n_nodes guarantees the fixed-round loop passes the
        # fixpoint (each non-final round removes >= 1 node)
        df = spark.createDataFrame(list(edges), ["u", "v"])
        got = {
            r.v: r.degree
            for r in kcore_peel(df, k=k, rounds=n_nodes).collect()
        }
        assert got == _python_kcore(edges, k), (n_nodes, n_edges, k)


def test_pagerank_mass_bounds_on_random_graph(spark):
    rng = random.Random(7)
    edges = _random_graph(rng, 15, 45)
    df = spark.createDataFrame(list(edges), ["u", "v"])
    masses = {r.v: r.mass for r in integer_pagerank(df, iters=3).collect()}
    nodes = {x for e in _canon(edges) for x in e}
    assert set(masses) == nodes
    # floor division only loses mass; teleport floors every node
    assert all(150_000 <= m for m in masses.values())
    assert sum(masses.values()) <= len(nodes) * 1_000_000
