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
