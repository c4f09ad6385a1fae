"""Connected-components unit tests on known topologies (chain, star,
isolated nodes, two components) — the oracle parity run covers the real
pair graph; these pin convergence behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from gfe_db_spark.plans.graph_algos import connected_components


def _cc(spark, n_nodes, edge_list):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "node long")
    edges = spark.createDataFrame(edge_list or [(0, 0)], "src long, dst long")
    if not edge_list:
        edges = edges.limit(0)
    out = connected_components(nodes, edges)
    return {r["node"]: r["component"] for r in out.collect()}


def test_chain_collapses(spark):
    # 0-1-2-...-9 → all component 0; long chains exercise path-halving
    got = _cc(spark, 10, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_two_components_and_isolated(spark):
    got = _cc(spark, 7, [(1, 2), (2, 3), (5, 6)])
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_star_and_direction_ignored(spark):
    # edges all point INTO the hub; undirected semantics must still join
    got = _cc(spark, 5, [(1, 0), (2, 0), (3, 0), (4, 0)])
    assert set(got.values()) == {0}


def test_no_edges(spark):
    got = _cc(spark, 4, [])
    assert got == {i: i for i in range(4)}
