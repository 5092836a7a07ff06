"""Graph operator tests: degrees + fixed-iteration PageRank."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.operators.graph import degrees, pagerank


@pytest.fixture()
def star(spark):
    # Symmetrized star: hub A connected to leaves B and C.
    return spark.createDataFrame(
        [("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")],
        "src string, dst string",
    )


def test_degrees(star):
    d = {r["node"]: (r["out_deg"], r["in_deg"]) for r in degrees(star).collect()}
    assert d == {"A": (2, 2), "B": (1, 1), "C": (1, 1)}


def test_pagerank_two_iterations_hand_computed(star):
    # r0 = 1 everywhere; out_deg A=2, B=C=1.
    # it1: A <- 1/1 + 1/1 = 2        -> 0.15 + 0.85*2   = 1.85
    #      B <- 1/2                  -> 0.15 + 0.85*0.5 = 0.575 (C same)
    # it2: A <- 0.575 + 0.575 = 1.15 -> 0.15 + 0.85*1.15  = 1.1275
    #      B <- 1.85/2 = 0.925       -> 0.15 + 0.85*0.925 = 0.93625
    r = {row["node"]: row["rank"] for row in pagerank(star, iterations=2).collect()}
    assert r["A"] == pytest.approx(1.1275, abs=1e-6)
    assert r["B"] == pytest.approx(0.93625, abs=1e-6)
    assert r["C"] == pytest.approx(0.93625, abs=1e-6)


def test_pagerank_mass_conservation(star):
    # Symmetric graph, no dangling mass: total rank stays n (= 3).
    total = sum(r["rank"] for r in pagerank(star, iterations=3).collect())
    assert total == pytest.approx(3.0, abs=1e-5)


def test_pagerank_isolated_source_gets_teleport_only(spark):
    # B has no in-edges once the edge list is directed A<-B only.
    edges = spark.createDataFrame([("B", "A")], "src string, dst string")
    r = {row["node"]: row["rank"] for row in pagerank(edges, iterations=1).collect()}
    assert r["B"] == pytest.approx(0.15, abs=1e-6)
    assert r["A"] == pytest.approx(1.0, abs=1e-6)
