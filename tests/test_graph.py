"""Unit tests for link-graph analytics (operators/graph.py)."""

from __future__ import annotations

import pytest

from space_launch_telemetry_analyzer_spark.operators import graph as G


@pytest.fixture()
def star(spark):
    # hub <- 5 spokes; hub links back to spoke 0
    edges = [("s%d" % i, "hub") for i in range(5)] + [("hub", "s0")]
    return spark.createDataFrame(edges, "src string, dst string")


def test_pagerank_star_ranks_hub_highest(spark, star):
    ranks = {r.node: r.rank for r in G.pagerank(star, n_iter=3).collect()}
    assert set(ranks) == {"hub", "s0", "s1", "s2", "s3", "s4"}
    assert ranks["hub"] == max(ranks.values())
    assert ranks["s0"] > ranks["s1"]           # s0 gets the hub's mass
    assert ranks["s1"] == ranks["s2"] == ranks["s3"] == ranks["s4"]


def test_pagerank_mass_bounded(spark, star):
    # every star node has out-edges, so mass is conserved at ~1 (the
    # round-to-12 contributions bound the drift at ~n*1e-12 per iteration)
    total = sum(r.rank for r in G.pagerank(star, n_iter=2).collect())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_partition_invariant(spark, star):
    a = sorted((r.node, r.rank) for r in G.pagerank(star, n_iter=2).collect())
    b = sorted(
        (r.node, r.rank)
        for r in G.pagerank(star.repartition(7), n_iter=2).collect()
    )
    assert a == b  # decimal-exact sums: bit-identical under any partitioning


@pytest.fixture(scope="module")
def dangling_graph(spark):
    # a -> b -> c ; c has no out-edges (dangling sink), plus isolated pair
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    return spark.createDataFrame(edges, "src string, dst string")


def test_pagerank_dangling_conserves_mass(spark, dangling_graph):
    """The simple variant leaks the sink's mass; the redistribution variant
    keeps total rank at ~1 on a graph where 2 of 5 nodes are dangling."""
    leaky = sum(r.rank for r in G.pagerank(dangling_graph, n_iter=3).collect())
    full = sum(
        r.rank for r in G.pagerank_dangling(dangling_graph, n_iter=3).collect()
    )
    assert leaky < 0.9  # c and y hold mass that the simple variant drops
    assert full == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_equals_simple_without_danglers(spark, star):
    """On a graph with no dangling nodes the two variants are identical
    (the redistribution term is exactly zero every iteration)."""
    a = sorted((r.node, r.rank) for r in G.pagerank(star, n_iter=2).collect())
    b = sorted(
        (r.node, r.rank) for r in G.pagerank_dangling(star, n_iter=2).collect()
    )
    assert a == b


def test_pagerank_dangling_partition_invariant(spark, dangling_graph):
    a = sorted(
        (r.node, r.rank) for r in G.pagerank_dangling(dangling_graph, n_iter=2).collect()
    )
    b = sorted(
        (r.node, r.rank)
        for r in G.pagerank_dangling(dangling_graph.repartition(7), n_iter=2).collect()
    )
    assert a == b


def test_pagerank_dangling_deep_iterations_bounded_plan(spark, dangling_graph):
    """The previous ranks frame feeds two consumers per iteration; without
    per-iteration materialization the plan doubles per iteration. 12
    iterations must stay fast and finite (and still conserve mass)."""
    ranks = G.pagerank_dangling(dangling_graph, n_iter=12)
    total = sum(r.rank for r in ranks.collect())
    assert total == pytest.approx(1.0, abs=1e-9)
