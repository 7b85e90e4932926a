"""Connected components + cluster representatives (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframe_kotlin_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _comps(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_two_components(spark):
    cc = graph.connected_components(_edges(spark, [(1, 2), (2, 3), (10, 11)]))
    assert _comps(cc) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # worst case for label propagation: a path graph (diameter = n-1)
    n = 12
    cc = graph.connected_components(_edges(spark, [(i, i + 1) for i in range(n)]))
    assert set(_comps(cc).values()) == {0}


def test_direction_and_duplicates_ignored(spark):
    cc = graph.connected_components(
        _edges(spark, [(2, 1), (1, 2), (2, 3), (2, 3), (5, 4)])
    )
    assert _comps(cc) == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="converge"):
        graph.connected_components(
            _edges(spark, [(i, i + 1) for i in range(10)]), max_iter=2
        )


def test_cluster_representatives(spark):
    df = spark.createDataFrame([(i, f"doc{i}") for i in range(6)], "id long, body string")
    cc = graph.connected_components(_edges(spark, [(1, 2), (4, 5)]))
    kept = graph.cluster_representatives(df, cc, "id")
    # 0 and 3 untouched; clusters {1,2} and {4,5} keep their min id
    assert sorted(r["id"] for r in kept.collect()) == [0, 1, 3, 4]


def _comps_star(df):
    from dataframe_kotlin_spark.operators.graph import connected_components_star

    return {r["node"]: r["component"] for r in connected_components_star(df).collect()}


def test_star_two_components(spark):
    got = _comps_star(_edges(spark, [(1, 2), (2, 3), (10, 11)]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_star_long_chain_few_rounds(spark):
    """A 30-edge path converges well under the diameter bound (the whole
    point of large-star/small-star: O(log^2 n) rounds, not O(n))."""
    from dataframe_kotlin_spark.operators.graph import connected_components_star

    df = _edges(spark, [(i, i + 1) for i in range(30)])
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(df, max_iter=10).collect()
    }
    assert got == {i: 0 for i in range(31)}


def test_star_self_loops_and_isolates(spark):
    # a self-loop node is its own (singleton) component
    got = _comps_star(_edges(spark, [(5, 5), (1, 2)]))
    assert got == {5: 5, 1: 1, 2: 1}


def test_star_matches_propagation_on_random_graphs(spark):
    import random

    random.seed(11)
    for _ in range(3):
        pairs = [(random.randint(0, 25), random.randint(0, 25)) for _ in range(18)]
        df = _edges(spark, pairs)
        assert _comps_star(df) == _comps(
            graph.connected_components(df, max_iter=30)
        )


def test_pagerank_ring_uniform_and_mass(spark):
    from dataframe_kotlin_spark.operators.graph import pagerank

    # symmetric ring: perfectly regular graph -> uniform stationary ranks
    n = 8
    edges = [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)]
    e = spark.createDataFrame(edges, "src int, dst int")
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iters=5).collect()}
    assert len(ranks) == n
    for v in ranks.values():
        assert abs(v - 1.0 / n) < 1e-12
    assert abs(sum(ranks.values()) - 1.0) < 1e-9  # no dangling leak on symmetric input

    # star graph: hub out-ranks leaves
    star = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    rs = {r["node"]: r["rank"] for r in pagerank(
        spark.createDataFrame(star, "src int, dst int"), iters=10).collect()}
    assert rs[0] > rs[1] and abs(rs[1] - rs[5]) < 1e-12


def test_pagerank_asymmetric_keeps_all_nodes(spark):
    """Nodes with no in-edges (sources) and no out-edges (sinks) must
    keep a rank row every iteration — sources decay toward (1-d)/N,
    never vanish from the output."""
    from dataframe_kotlin_spark.operators.graph import pagerank

    # 0 -> 1 -> 2 (chain): 0 has no in-edges, 2 has no out-edges
    e = spark.createDataFrame([(0, 1), (1, 2)], "src int, dst int")
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iters=3).collect()}
    assert set(ranks) == {0, 1, 2}
    assert ranks[0] == pytest.approx((1 - 0.85) / 3)  # pure teleport mass
    assert ranks[2] > ranks[0]  # sink accumulates inbound mass
