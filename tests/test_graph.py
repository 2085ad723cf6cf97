"""Connected components (operators/graph.py): correctness on crafted
graph shapes + the dedup_clusters wrapper."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from grocery_store_sales_forecasting_etl_pipeline_spark.operators import graph as G


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["id_1", "id_2"])
    out = G.connected_components(df)
    return {int(r["node"]): int(r["component"]) for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # a long chain is the worst case for naive propagation (O(diameter));
    # large-star/small-star must still converge within the O(log n) guard
    edges = [(i, i + 1) for i in range(1, 40)]
    got = _cc(spark, edges)
    assert got == {i: 1 for i in range(1, 41)}


def test_two_components_and_hub(spark):
    edges = [
        (10, 11), (11, 12), (10, 13),          # component rooted at 10
        (50, 60), (60, 55), (55, 70), (70, 50) # cycle rooted at 50
    ]
    got = _cc(spark, edges)
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 50: 50, 55: 50, 60: 50, 70: 50}


def test_duplicate_and_reversed_edges(spark):
    edges = [(2, 1), (1, 2), (2, 3), (3, 2), (3, 3)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1}


def test_dedup_clusters_survivors(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 7), (20, 21)], ["id_1", "id_2"])
    rows = {
        int(r["doc_id"]): (int(r["cluster_id"]), bool(r["is_kept"]))
        for r in G.dedup_clusters(pairs).collect()
    }
    assert rows == {
        5: (5, True), 9: (5, False), 7: (5, False),
        20: (20, True), 21: (20, False),
    }


def test_nonconvergence_guard(spark):
    df = spark.createDataFrame([(1, 2)], ["id_1", "id_2"])
    with pytest.raises(RuntimeError):
        G.connected_components(df, max_iter=0)


# window-star vs join-star equivalence (r11 optimization): the gated
# window shape must produce the identical per-round canonical edge set
# and the identical final labeling on shapes that stress each rule —
# chains (large-star), hubs (small-star + the window's worst-case
# partition), cycles, duplicates/reversals, and multiple components.
_STAR_FIXTURES = [
    [(i, i + 1) for i in range(1, 40)],                      # chain
    [(1, k) for k in range(2, 30)],                          # hub at min
    [(50, k) for k in range(2, 30)],                         # hub at max
    [(10, 11), (11, 12), (10, 13), (50, 60), (60, 55), (55, 70), (70, 50)],
    [(2, 1), (1, 2), (2, 3), (3, 2), (3, 3)],                # dups/reversed
]


def test_window_star_rounds_match_join_star_rounds(spark):
    for edges in _STAR_FIXTURES:
        df = spark.createDataFrame(edges, ["u", "v"])
        e = G._canonical(df)
        join_round = sorted(
            map(tuple, G._canonical(G._small_star(G._large_star(e))).collect())
        )
        win_round = sorted(
            map(
                tuple,
                G._canonical(
                    G._small_star_window(G._large_star_window(e))
                ).collect(),
            )
        )
        assert join_round == win_round


def test_cc_gate_paths_identical(spark, monkeypatch):
    for edges in _STAR_FIXTURES:
        df = spark.createDataFrame(edges, ["id_1", "id_2"])
        monkeypatch.setattr(G, "_CC_WINDOW_MAX_EDGES", 0)  # force join path
        via_join = sorted(map(tuple, G.connected_components(df).collect()))
        monkeypatch.setattr(G, "_CC_WINDOW_MAX_EDGES", 10**9)  # force window path
        via_window = sorted(map(tuple, G.connected_components(df).collect()))
        assert via_join == via_window
