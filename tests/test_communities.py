"""Label propagation + modularity tests (operators/graph)."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.operators.graph import label_propagation, modularity


def _edges(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def test_two_cliques_two_communities(spark):
    # two triangles joined by one bridge edge
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(2, 10)]
    out = {r["node"]: r["community"] for r in
           label_propagation(_edges(spark, tri1 + tri2 + bridge), rounds=4).collect()}
    assert out[0] == out[1] == out[2]
    assert out[10] == out[11] == out[12]
    assert out[0] != out[10]


def test_isolated_pair_shares_label(spark):
    out = {r["node"]: r["community"] for r in
           label_propagation(_edges(spark, [(5, 6)]), rounds=2).collect()}
    # after round 1 they swap; round 2 swaps back — synchronous LPA's
    # defined oscillation on a 2-cycle: each node holds the OTHER's id
    # after odd rounds and its own after even rounds
    assert out[5] == 5 and out[6] == 6


def test_rounds_validation(spark):
    with pytest.raises(ValueError):
        label_propagation(_edges(spark, [(0, 1)]), rounds=0)


def test_modularity_two_cliques(spark):
    # perfect 2-community split of two disjoint triangles:
    # Q = sum_c (m_c/m - (d_c/2m)^2) = 2*(3/6 - (6/12)^2) = 0.5
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    edges = _edges(spark, tri1 + tri2)
    comms = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 1), (11, 1), (12, 1)],
        "node long, community long",
    )
    r = modularity(edges, comms).collect()[0]
    assert r["q"] == 0.5 and r["n_communities"] == 2


def test_modularity_single_community_zero(spark):
    # everything in one community: Q = m/m - (2m/2m)^2 = 0
    edges = _edges(spark, [(0, 1), (1, 2)])
    comms = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0)], "node long, community long"
    )
    assert modularity(edges, comms).collect()[0]["q"] == 0.0


def test_lpa_partition_scores_positive_modularity(spark):
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    edges = _edges(spark, tri1 + tri2 + [(2, 10)])
    comms = label_propagation(edges, rounds=4)
    assert modularity(edges, comms).collect()[0]["q"] > 0.3
