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


def test_adamic_adar_matches_python_reference(spark):
    """operators/graph.adamic_adar (the shared-entity posting join +
    floor-rounded 1/ln(deg) weights) vs a direct Python computation on
    a small random bipartite graph (mirrors q_adamic_adar's shape
    without the TPC-H upstream) — in BOTH transport modes."""
    import math
    import random

    from econdatapipeline_spark.operators.graph import adamic_adar

    rng = random.Random(11)
    edges = sorted({(rng.randint(0, 15), rng.randint(100, 112)) for _ in range(80)})
    df = spark.createDataFrame(edges, "cust long, supp long")

    out = adamic_adar(df, node_col="cust", via_col="supp", min_shared=1)
    got = {
        (r["u"], r["v"]): (r["shared"], r["aa_score"]) for r in out.collect()
    }
    # partitioned mode (no |entities|-sized broadcast) is bit-identical
    part = adamic_adar(
        df, node_col="cust", via_col="supp", min_shared=1, partitioned=True
    )
    assert got == {
        (r["u"], r["v"]): (r["shared"], r["aa_score"]) for r in part.collect()
    }

    # python reference
    from collections import defaultdict

    custs_of = defaultdict(set)
    for c, s in edges:
        custs_of[s].add(c)
    want = defaultdict(lambda: [0, 0.0])
    for s, cs in custs_of.items():
        if len(cs) < 2:
            continue
        w = math.floor((1.0 / math.log(len(cs))) * 1e6 + 0.5) / 1e6
        for x in cs:
            for y in cs:
                if x < y:
                    want[(x, y)][0] += 1
                    want[(x, y)][1] = round(want[(x, y)][1] + w, 12)
    assert set(got) == set(want)
    for k, (n, aa) in got.items():
        assert n == want[k][0]
        assert abs(aa - want[k][1]) < 1e-9, (k, aa, want[k][1])


def test_personalized_pagerank_seed_proximity(spark):
    """Two disconnected components; teleport to a seed in one of them:
    the other component finishes at exactly 0, and within the seeded
    component the seed outranks its neighbors."""
    from pyspark.sql import functions as F

    from econdatapipeline_spark.operators.graph import personalized_pagerank

    # component A: 1-2-3 path (symmetrized); component B: 10-11
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (10, 11), (11, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["rank"] for r in personalized_pagerank(e, seeds).collect()}
    assert out[10] == 0.0 and out[11] == 0.0
    # replicate the exact recurrence in Python (3 bipartite-path rounds
    # oscillate by design — fixed-iteration PPR is a deterministic
    # contract, not a converged one)
    d, p = 0.85, {1: 1.0, 2: 0.0, 3: 0.0}
    deg = {1: 1, 2: 2, 3: 1}
    r = dict(p)
    for _ in range(3):
        contrib = {1: r[2] / 2, 2: r[1] + r[3], 3: r[2] / 2}
        r = {n: (1 - d) * p[n] + d * contrib[n] for n in r}
    import math

    for n in (1, 2, 3):
        # floor-based half-up: Spark round() is HALF_UP, Python round()
        # is banker's — 0.0541875 sits exactly on the boundary
        assert out[n] == math.floor(r[n] * 1e6 + 0.5) / 1e6, n


def test_kcore_path_peels_triangle_survives(spark):
    """A triangle with a pendant path: k=2 peels the whole path (chain
    peeling needs one round per hop — the iterative part) and keeps
    exactly the triangle,every node at core degree 2."""
    from econdatapipeline_spark.operators.graph import kcore

    und = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], "src long, dst long"
    )
    out = {r["node"]: r["core_deg"] for r in kcore(edges, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_k3_empty_and_k1_keeps_all(spark):
    from econdatapipeline_spark.operators.graph import kcore

    und = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], "src long, dst long"
    )
    assert kcore(edges, k=3).count() == 0  # triangle has no 3-core
    assert kcore(edges, k=1).count() == 3


def test_kcore_validates_k(spark):
    import pytest

    from econdatapipeline_spark.operators.graph import kcore

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        kcore(edges, k=0)


def test_kcore_raises_on_round_cap_unless_partial(spark):
    """A 2-core of a long path is EMPTY but peels one hop per round:
    hitting max_rounds must raise, not fabricate a dense region;
    allow_partial opts into the fixed-round state."""
    import pytest

    from econdatapipeline_spark.operators.graph import kcore

    und = [(i, i + 1) for i in range(20)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(edges, k=2, max_rounds=3)
    partial = kcore(edges, k=2, max_rounds=3, allow_partial=True)
    assert partial.count() > 0  # the documented fixed-round state
    assert kcore(edges, k=2).count() == 0  # default cap converges


def test_partitioned_pagerank_matches_broadcast_exactly(spark):
    """partitioned=True (rank shuffle onto the pinned edge layout) and
    the default broadcast transport must be bit-identical — the decimal
    contribution sum is order-independent."""
    import random

    from econdatapipeline_spark.operators.graph import personalized_pagerank

    rng = random.Random(11)
    edges = spark.createDataFrame(
        [(rng.randrange(120), rng.randrange(120)) for _ in range(900)],
        "src long, dst long",
    ).filter("src != dst").distinct()
    sym = edges.union(edges.selectExpr("dst as src", "src as dst")).distinct()

    for kw in ({"symmetric": False}, {"symmetric": True}):
        base = pagerank(sym if kw["symmetric"] else edges, iterations=3, **kw)
        part = pagerank(
            sym if kw["symmetric"] else edges, iterations=3, partitioned=True,
            **kw,
        )
        assert sorted(map(tuple, base.collect())) == sorted(
            map(tuple, part.collect())
        )

    seeds = spark.createDataFrame([(3,), (7,)], "node long")
    a = personalized_pagerank(edges, seeds, iterations=3)
    b = personalized_pagerank(edges, seeds, iterations=3, partitioned=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bfs_distances_chain(spark):
    from econdatapipeline_spark.operators.graph import bfs_distances

    # path 0-1-2-3-4-5, seeds {0}: dist = node index, capped at 3 hops
    pairs = [(i, i + 1) for i in range(5)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    out = {r["node"]: r["dist"] for r in
           bfs_distances(edges, [0], max_hops=3).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}  # 4, 5 beyond the cap


def test_bfs_multi_source_takes_min(spark):
    from econdatapipeline_spark.operators.graph import bfs_distances

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    out = {r["node"]: r["dist"] for r in
           bfs_distances(edges, [0, 4], max_hops=4).collect()}
    assert out[2] == 2 and out[3] == 1 and out[1] == 1


def test_bfs_disconnected_and_early_exit(spark):
    from econdatapipeline_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (10, 11), (11, 10)], "src long, dst long"
    )
    out = {r["node"]: r["dist"] for r in
           bfs_distances(edges, [0], max_hops=6).collect()}
    assert out == {0: 0, 1: 1}  # frontier empties after hop 1


def test_assortativity_star_negative(spark):
    from econdatapipeline_spark.operators.graph import degree_assortativity

    # star: hub 0 to leaves 1..6 — hubs link only to leaves -> r = -1
    pairs = [(0, i) for i in range(1, 7)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    r = degree_assortativity(edges).collect()[0]
    assert r["r"] == -1.0 and r["n_edges"] == 12
    # partitioned mode (no |nodes|-sized broadcast) is bit-identical
    rp = degree_assortativity(edges, partitioned=True).collect()[0]
    assert (rp["r"], rp["n_edges"]) == (r["r"], r["n_edges"])


def test_assortativity_regular_graph_null(spark):
    from econdatapipeline_spark.operators.graph import degree_assortativity

    # cycle: every degree equal -> zero variance -> null r
    pairs = [(i, (i + 1) % 5) for i in range(5)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    assert degree_assortativity(edges).collect()[0]["r"] is None


def test_hyperball_cycle_matches_exact_counts(spark):
    # 32-cycle: |B(v, r)| = min(2r + 1, 32) for every v, so
    # N(r) = 32 * min(2r + 1, 32) exactly. Small cardinalities sit in
    # the sketch's exact (sparse) regime -> tight tolerance.
    from econdatapipeline_spark.operators.graph import hyperball

    n = 32
    edges = [(i, (i + 1) % n) for i in range(n)]
    edges += [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["radius"]: r for r in hyperball(df, max_radius=4).collect()}
    for r in range(5):
        exact = n * min(2 * r + 1, n)
        assert abs(out[r]["reachable_pairs"] - exact) / exact < 0.02, (
            r, out[r]["reachable_pairs"], exact)
    assert out[4]["frac_of_final"] == 1.0
    # delta telescopes back to the totals
    assert abs(sum(out[r]["delta_pairs"] for r in out) -
               out[4]["reachable_pairs"]) < 1e-6


def test_hyperball_exact_cycle_and_early_stop(spark):
    """The integer-exact twin: a 12-cycle's ball sizes are exactly
    n * min(2r + 1, n); disjoint triangles stop one confirming round
    after saturation (the hyperball early-stop contract, exactly)."""
    from econdatapipeline_spark.operators.graph import hyperball_exact

    n = 12
    edges = [(i, (i + 1) % n) for i in range(n)]
    edges += [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["radius"]: r for r in hyperball_exact(df, max_radius=4).collect()}
    for r in range(5):
        assert out[r]["reachable_pairs"] == n * min(2 * r + 1, n), r
    assert out[4]["frac_of_final"] == 1.0
    assert sum(out[r]["delta_pairs"] for r in out) == out[4]["reachable_pairs"]

    tri = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    tri += [(b, a) for a, b in tri]
    rows = hyperball_exact(
        spark.createDataFrame(tri, "src long, dst long"), max_radius=8
    ).collect()
    assert [r["reachable_pairs"] for r in rows] == [6, 18, 18]


def test_hyperball_converges_and_stops_early(spark):
    # two disjoint triangles saturate at radius 1; the loop must stop
    # well before max_radius and report a stable final count (~18).
    from econdatapipeline_spark.operators.graph import hyperball

    tri = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    tri += [(b, a) for a, b in tri]
    df = spark.createDataFrame(tri, "src long, dst long")
    rows = hyperball(df, max_radius=8).collect()
    assert len(rows) <= 4  # 0, 1, and one confirming stable round
    final = rows[-1]["reachable_pairs"]
    assert abs(final - 18) / 18 < 0.02  # 2 components x 3 nodes x 3


def test_hyperball_validates_radius(spark):
    import pytest

    from econdatapipeline_spark.operators.graph import hyperball

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        hyperball(df, max_radius=-1)


def test_random_walks_structure_and_determinism(spark):
    from econdatapipeline_spark.operators.graph import random_walks

    n = 16
    edges = [(i, (i + 1) % n) for i in range(n)]
    edges += [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = random_walks(df, walk_len=3).collect()
    walks = {}
    for r in out:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert len(walks) == n
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    for wid, steps in walks.items():
        assert steps[0] == wid            # walks start at their node
        assert sorted(steps) == [0, 1, 2, 3]
        for s in range(1, 4):             # every hop follows an edge
            assert steps[s] in adj[steps[s - 1]]
    # byte-identical on a second run (derandomized choice)
    again = random_walks(df, walk_len=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_random_walks_sink_stops_short(spark):
    from econdatapipeline_spark.operators.graph import random_walks

    # directed chain 0 -> 1 -> 2: the walk from 2 has no outgoing edge
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = random_walks(df, walk_len=3).collect()
    by_walk = {}
    for r in out:
        by_walk.setdefault(r["walk_id"], []).append((r["step"], r["node"]))
    assert sorted(by_walk[0]) == [(0, 0), (1, 1), (2, 2)]  # stops at sink
    assert sorted(by_walk[1]) == [(0, 1), (1, 2)]
    # walk_id 2 never starts: node 2 has no outgoing edge, and walks
    # launch from source nodes only
    assert 2 not in by_walk


def test_biased_walks_follow_edges_and_are_deterministic(spark):
    from econdatapipeline_spark.operators.graph import random_walks_biased

    n = 12
    edges = [(i, (i + 1) % n) for i in range(n)]
    edges += [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = random_walks_biased(df, walk_len=3).collect()
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    walks = {}
    for r in out:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert len(walks) == n
    for wid, steps in walks.items():
        assert steps[0] == wid and sorted(steps) == [0, 1, 2, 3]
        for s in range(1, 4):
            assert steps[s] in adj[steps[s - 1]]
    again = random_walks_biased(df, walk_len=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_biased_walks_prefer_common_neighbors(spark):
    from econdatapipeline_spark.operators.graph import random_walks_biased

    # triangle 0-1-2 plus pendant 3 attached to 1: out of any
    # (prev, cur) inside the triangle the third vertex is the common
    # neighbor; with w_common >> others, step 2 must close the
    # triangle rather than return or wander to the pendant.
    tri = [(0, 1), (1, 2), (2, 0), (1, 3)]
    tri += [(b, a) for a, b in tri]
    df = spark.createDataFrame(tri, "src long, dst long")
    out = random_walks_biased(
        df, walk_len=2, w_return=1, w_common=1000, w_far=1
    ).collect()
    steps = {}
    for r in out:
        steps.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    w0 = steps[0]
    # from 0: step1 lands in {1, 2}; the common-neighbor pull closes
    # the triangle at step 2 (never back to 0, never out to 3)
    assert w0[1] in (1, 2)
    assert w0[2] == ({1: 2, 2: 1}[w0[1]])


def test_biased_walks_validate_weights(spark):
    import pytest

    from econdatapipeline_spark.operators.graph import random_walks_biased

    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    with pytest.raises(ValueError):
        random_walks_biased(df, w_return=0)
