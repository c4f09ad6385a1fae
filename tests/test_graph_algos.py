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


def test_pagerank_properties(spark):
    """Fixed-iteration PageRank: ranks stay a probability distribution
    (sum ≈ 1 up to per-iteration rounding), isolated nodes keep the damped
    base rank, and higher-degree hubs outrank leaves."""
    from pyspark.sql import functions as F

    from gfe_db_spark.plans.graph_algos import pagerank

    # star with no dangling nodes: rank mass is conserved
    edges = spark.createDataFrame([(0, i) for i in range(1, 5)], "src long, dst long")
    star = spark.createDataFrame([(i,) for i in range(5)], "node long")
    r = {row.node: row.rank for row in pagerank(star, edges, iters=5).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-6
    assert r[0] > r[1]  # hub > leaf
    assert r[1] == r[2] == r[3] == r[4]  # symmetry

    # isolated node: keeps only the damped teleport base (mass leaks by
    # design — documented dangling behavior), everything still ordered
    nodes6 = spark.createDataFrame([(i,) for i in range(6)], "node long")
    r6 = {row.node: row.rank for row in pagerank(nodes6, edges, iters=5).collect()}
    assert r6[0] > r6[1] > r6[5]
    assert abs(r6[5] - round(0.15 / 6, 9)) < 1e-9
