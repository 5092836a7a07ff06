"""Graph operators expressed as DataFrame joins.

The reference has no graph surface; this module covers the iterative-
algorithm class a large-scale pipeline needs (influence/centrality over
entity graphs mined from relational data — e.g. the customer-supplier
trade graph, or the near-duplicate document graph from
``operators.dedup``).

Scale stance: fixed-iteration PageRank as repeated join + aggregate is
the idiomatic pure-DataFrame shape (GraphX/Pregel is JVM-only and
GraphFrames is an external package). Each iteration shuffles
contributions by destination node; the static edge+degree relation is
cached and, on a real cluster, should be pre-partitioned by ``src`` so
every iteration reuses one shuffle layout instead of re-exchanging the
edge list. Ranks are decimal-summed so the result is independent of
partial-aggregation order (bit-identical across engines and retries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Edge rows per cached partition for the iterative operators: sized so
# one task carries >= ~100 ms of probe+aggregate work (the task-size
# floor of the optimization guide), data-derived so big graphs stay
# wide while certification-sized ones stop paying 32x task overhead
# per round.
_ROWS_PER_TASK = 150_000


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Out/in degree per node from a directed edge list.

    Deliberately NOT materialized: both degree branches contain the
    identical shuffle of the caller's edge derivation, and within one
    action Spark's ReuseExchange computes it once — an eager persist
    barrier here measured 2x SLOWER (it serializes the two branches
    and pays cache I/O for an exchange that was already shared).
    Materialization only pays when the re-computation crosses separate
    jobs: broadcast subtrees and iterative loops (see pagerank).
    """
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return out_d.join(in_d, "node", "full_outer").select(
        "node",
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
    )


def _edge_relation(
    edges: DataFrame, src: str, dst: str, partitioned: bool
) -> DataFrame:
    """Degree-annotated, cached, eagerly-materialized edge relation.

    Broadcast mode (default, honest to ~10^8 nodes): the |nodes|-sized
    degree relation ships map-side, so the edges are never shuffled.

    Partitioned mode (the billion-node path): degrees and edges shuffle
    ONCE, keyed by source, and the relation persists hash-partitioned
    on ``e_src``. Every iteration's rank join then reuses that layout —
    Catalyst sees the cached side already partitioned on the join key
    and exchanges only the |nodes|-sized rank relation, never the
    edges. Nothing |nodes|-sized is ever broadcast, which removes the
    driver/executor memory ceiling of broadcast mode at the price of
    one rank shuffle per round.
    """
    parallelism = edges.sparkSession.sparkContext.defaultParallelism
    if partitioned:
        # ONE explicit shuffle of the edges pins the hash(src) layout;
        # the degree aggregate and the degree join both derive from
        # that same layout, so neither adds an exchange — and because
        # the STREAMED side carries the partitioning, the layout
        # survives whatever join strategy AQE picks for the (small
        # here, |nodes|-sized at scale) degree side. The partition
        # COUNT is deliberately left at spark.sql.shuffle.partitions:
        # the per-round rank exchanges use that count, and a cached
        # layout with a DIFFERENT count would fail EnsureRequirements'
        # co-partitioning check and re-exchange the edges every round.
        edges_r = edges.repartition(F.col(src))
        deg_r = edges_r.groupBy(src).agg(F.count(F.lit(1)).alias("out_deg"))
        ed = edges_r.join(deg_r, src).select(
            F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), "out_deg"
        )
    else:
        deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("out_deg"))
        # deg is |nodes|-sized (the same size class as the broadcast rank
        # relation in the loop), so ship it map-side rather than
        # shuffling the edge list; the per-iteration probe then never
        # reshuffles.
        ed = edges.join(F.broadcast(deg), src).select(
            F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), "out_deg"
        )
        # Right-size the cached working set: the caller's edge derivation
        # often unions shuffle outputs (e.g. 2 x shuffle.partitions for a
        # symmetrized list), and an iterative operator re-scans its cache
        # every round — per-task launch overhead on hundreds of near-empty
        # partitions then dominates the actual compute. coalesce never
        # grows a partition count, so this only ever shrinks to the
        # cluster's core count.
        ed = ed.coalesce(parallelism)
    # Persist the degree-annotated edge relation and materialize it
    # EAGERLY. Spark executes broadcast-exchange subtrees as concurrent
    # async jobs, so without the barrier every iteration's broadcast job
    # races the others to populate the cache and each recomputes the
    # caller's (often expensive: join + distinct) edge derivation from
    # scratch — profiled at ~8 full recomputations for a 3-iteration
    # run. One count() turns that into a single computation every later
    # stage reads from memory; this is the standard materialization
    # step of any iterative Spark algorithm.
    ed = ed.persist()
    n = ed.count()
    if not partitioned:
        # Right-size the cached layout by ROWS, not core count: an
        # iterative operator re-scans this cache every round, and with
        # core-count partitions each task holds only a few ms of work —
        # per-task overhead then dominates the round (measured on the
        # 1.17M-row sf0.1 trade graph: 1.03 s/round at 32 partitions
        # vs 0.52 s at 8 on local[32]). ~150k edge rows per task keeps
        # tasks in the >=100 ms band; large graphs hit the parallelism
        # cap and keep today's width, so this only ever packs small
        # working sets. The narrow re-pack reads the already-populated
        # cache once — no shuffle, no recompute of the derivation.
        # (partitioned mode is excluded: its hash(src) layout at the
        # shuffle-partition count is load-bearing for the per-round
        # co-partitioned joins.)
        target = max(1, min(parallelism, (n + _ROWS_PER_TASK - 1) // _ROWS_PER_TASK))
        if target < ed.rdd.getNumPartitions():
            packed = ed.coalesce(target).persist()
            packed.count()
            ed.unpersist()
            ed = packed
    return ed


def _finish(ranks: DataFrame, *working: DataFrame) -> DataFrame:
    # Materialize the |nodes|-sized result eagerly (localCheckpoint
    # also cuts the N-round lineage), then release every persisted
    # working set — repeated pagerank calls in one session no longer
    # accumulate executor storage. The checkpoint blocks themselves
    # are freed by the ContextCleaner when the returned DataFrame is
    # garbage collected.
    out = ranks.select("node", F.round("rank", 6).alias("rank")).localCheckpoint(
        eager=True
    )
    for df in working:
        df.unpersist()
    return out


def _build_pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    iterations: int,
    damping: float,
    symmetric: bool,
    partitioned: bool,
):
    """Lazy N-round PageRank plan -> (ranks DataFrame, working sets).

    Split from :func:`pagerank` so plan tests can assert the physical
    shape of the full unrolled loop before execution.
    """
    if iterations < 1:
        raise ValueError("pagerank needs iterations >= 1")
    ed = _edge_relation(edges, src, dst, partitioned)
    # broadcast the |nodes|-sized rank relation per round, or leave it
    # to the shuffle layout pinned by _edge_relation (partitioned mode)
    mb = (lambda df: df) if partitioned else F.broadcast

    def rank_update(summed: Column) -> Column:
        return F.lit(1.0 - damping) + F.lit(damping) * summed

    dec_sum = lambda c: F.sum(c.cast("decimal(28,12)")).cast("double")  # noqa: E731

    if symmetric:
        # Symmetric graph: every node has in-edges, so each round's
        # contribution aggregate already covers the whole node set — no
        # node relation, no per-round left join. This RELIES on the
        # caller's symmetry guarantee: if some edge lacks its reverse,
        # source-only nodes would silently vanish from the output (use
        # symmetric=False for any list that is not provably mirrored).
        # Round 1 is cheaper still: with rank_0 = 1 everywhere, the
        # probe of the rank relation is the identity, so the first
        # round collapses to a pure aggregate of 1/out_deg over the
        # cached edges. Each later round is one movement of the
        # |nodes|-sized rank relation (broadcast, or shuffle onto the
        # pinned edge layout in partitioned mode) + one keyed
        # aggregation.
        ranks = ed.groupBy(F.col("e_dst").alias("node")).agg(
            rank_update(dec_sum(F.lit(1.0) / F.col("out_deg"))).alias("rank")
        )
        for _ in range(iterations - 1):
            ranks = (
                ed.join(mb(ranks), ed.e_src == ranks.node)
                .select(
                    F.col("e_dst").alias("node"),
                    (F.col("rank") / F.col("out_deg")).alias("c"),
                )
                .groupBy("node")
                .agg(rank_update(dec_sum(F.col("c"))).alias("rank"))
            )
        return ranks, (ed,)

    # General digraph: dangling destinations receive mass but emit none,
    # so the node relation (cached) re-enters each round via a left join
    # to keep rankless nodes at the teleport floor.
    nodes = ed.select(F.col("e_src").alias("node")).union(
        ed.select(F.col("e_dst").alias("node"))
    ).distinct()
    if partitioned:
        nodes = nodes.repartition(
            edges.sparkSession.sparkContext.defaultParallelism, "node"
        )
    nodes = nodes.cache()
    ranks = _power_iterate(ed, nodes, None, iterations, damping, rank_update, mb)
    return ranks, (ed, nodes)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    symmetric: bool = False,
    partitioned: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank -> (node, rank).

    Unnormalized form (rank_0 = 1, teleport = 1 - damping), the classic
    power-iteration recurrence: each round ships rank/out_deg along every
    edge and sums per destination. Dangling-node mass is dropped, so pass
    a symmetrized edge list for undirected semantics (every node then has
    out-degree >= 1). Iteration count is fixed — a deterministic plan,
    checkable by any SQL engine via chained CTEs — rather than
    convergence-tested, which is the right contract for an oracle-
    verified batch operator.

    ``partitioned=False`` (default) broadcasts the |nodes|-sized rank
    relation each round — the fastest shape while ranks fit in executor
    memory (honest to ~10^8 nodes). ``partitioned=True`` is the
    billion-node path: the edge relation persists hash-partitioned by
    source and each round SHUFFLES the rank relation onto that pinned
    layout instead of broadcasting it — nothing |nodes|-sized is ever
    broadcast, so the only per-round cost that grows with the graph is
    a keyed exchange of the ranks. Both modes produce identical output
    (the decimal contribution sum is order-independent).

    Executes EAGERLY: the returned DataFrame is the localCheckpoint-
    materialized final ranks, and every persisted working set (edges,
    nodes) is released before returning, so repeated calls in one
    session do not accumulate executor storage.
    """
    ranks, working = _build_pagerank(
        edges, src, dst, iterations, damping, symmetric, partitioned
    )
    return _finish(ranks, *working)


def _build_personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str,
    dst: str,
    seed_col: str,
    iterations: int,
    damping: float,
    partitioned: bool,
):
    """Lazy plan for :func:`personalized_pagerank` (see _build_pagerank)."""
    if iterations < 1:
        raise ValueError("personalized_pagerank needs iterations >= 1")
    ed = _edge_relation(edges, src, dst, partitioned)
    mb = (lambda df: df) if partitioned else F.broadcast

    def rank_update(summed: Column) -> Column:
        return (
            F.lit(1.0 - damping) * F.col("p") + F.lit(damping) * summed
        )

    nodes = (
        ed.select(F.col("e_src").alias("node"))
        .union(ed.select(F.col("e_dst").alias("node")))
        .distinct()
        .join(
            # the SEED relation stays broadcast in both modes: seeds
            # are query-sized (a handful of anchors), never |nodes|-
            # sized — only the rank/contribution relations change
            # transport in partitioned mode. distinct: a duplicated
            # seed row would multiply node rows through this join and
            # double-count every contribution downstream.
            F.broadcast(
                seeds.select(F.col(seed_col).alias("node"))
                .distinct()
                .withColumn("__seed", F.lit(1.0))
            ),
            "node",
            "left",
        )
        .select("node", F.coalesce(F.col("__seed"), F.lit(0.0)).alias("p"))
    )
    if partitioned:
        nodes = nodes.repartition(
            edges.sparkSession.sparkContext.defaultParallelism, "node"
        )
    nodes = nodes.cache()
    ranks = _power_iterate(ed, nodes, "p", iterations, damping, rank_update, mb)
    return ranks, (ed, nodes)


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    iterations: int = 3,
    damping: float = 0.85,
    partitioned: bool = False,
) -> DataFrame:
    """Fixed-iteration PERSONALIZED PageRank: teleport mass lands only
    on ``seeds`` -> (node, rank), rank measuring proximity to the seed
    set (the recommender / related-entities primitive).

    Unnormalized to match `pagerank`'s conventions: p(node) = 1 on
    seeds, 0 elsewhere; rank_0 = p; each round computes
    (1-d)*p + d*Σ contributions. Nodes unreachable from the seed set
    finish at exactly 0. Same plan skeleton as the general `pagerank`
    path — eager edge persist, one |nodes|-sized rank movement per
    round (broadcast by default; shuffled onto the pinned edge layout
    with ``partitioned=True``, the billion-node path) — with the seed
    indicator carried as a column of the cached node relation, so
    personalization adds zero extra joins per round. Same
    eager-execute/unpersist contract; both modes produce identical
    output.
    """
    ranks, working = _build_personalized_pagerank(
        edges, seeds, src, dst, seed_col, iterations, damping, partitioned
    )
    return _finish(ranks, *working)


def _power_iterate(ed, nodes, p_col, iterations, damping, rank_update, mb):
    """Shared general-path loop: per round, move the |nodes|-sized rank
    relation (``mb`` = broadcast hint, or identity in partitioned mode,
    where the shuffle lands on the cached edges' pinned layout), probe
    the cached edges, aggregate per destination, left-join back onto
    the node relation."""
    dec_sum = lambda c: F.sum(c.cast("decimal(28,12)")).cast("double")  # noqa: E731
    keep = ["node"] + ([p_col] if p_col else [])
    init = F.col(p_col) if p_col else F.lit(1.0)
    ranks = nodes.select(*keep, init.alias("rank"))
    for _ in range(iterations):
        # The rank relation is |nodes|-sized — in broadcast mode each
        # round is a map-side probe of the cached edge relation plus one
        # keyed aggregation, never a re-shuffle of the edges; in
        # partitioned mode the ranks exchange by node id instead. In the
        # personalized case most ranks start (and, outside the seeds'
        # reach, stay) exactly 0 and contribute exactly 0 — dropping
        # them shrinks the per-round movement to the nonzero frontier
        # without changing any sum.
        rel = ranks.select("node", "rank")
        if p_col:
            rel = rel.filter(F.col("rank") != 0.0)
        contrib = (
            ed.join(mb(rel), ed.e_src == rel.node)
            .select(
                F.col("e_dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(dec_sum(F.col("c")).alias("s"))
        )
        # contrib is an aggregate output whose stats Catalyst can't see
        # pre-AQE, so hint the broadcast in broadcast mode: without it
        # this |nodes|-sized left join plans as a sort-merge join with
        # one more exchange per iteration. In partitioned mode both
        # sides are keyed by node (nodes is cached pre-partitioned), so
        # only contrib moves.
        ranks = nodes.join(mb(contrib), "node", "left").select(
            *keep,
            rank_update(F.coalesce(F.col("s"), F.lit(0.0))).alias("rank"),
        )
    return ranks.select("node", "rank")


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
    allow_partial: bool = False,
) -> DataFrame:
    """k-core decomposition by iterative peeling -> (node, core_deg).

    The k-core is the maximal subgraph in which every node has degree
    >= k — the standard "dense, well-connected region" filter for
    entity and near-duplicate graphs (Seidman 1983, "Network structure
    and minimum degree"). Input is a symmetrized directed edge list
    (each undirected edge in both orientations, the same contract as
    ``pagerank(symmetric=True)``); output is every surviving node with
    its degree inside the k-core subgraph.

    Shape per round: ONE hash aggregate (degrees over the live edge
    list) and TWO anti-joins (drop edges touching sub-k nodes); the
    live edge relation is localCheckpoint'ed so round r does not replay
    rounds 1..r-1 (the iterative-state pattern, same as
    ``dedup.connected_components``). Convergence is an aggregate
    emptiness probe on the peel set — peeling strictly shrinks the edge
    set, so at most |V| rounds, in practice O(log) on power-law graphs.
    At 100 TB each round is a shuffle keyed by node id; the peel set is
    usually tiny after round 1 and broadcasts, which AQE decides from
    runtime sizes (no forced hint — round 1 can peel most of a sparse
    graph).

    The result is deterministic (peeling order never affects the final
    core — the k-core is unique), so an unrolled fixed-round SQL twin
    reaches the identical fixpoint.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    live = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_rounds):
        deg = live.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        peel = deg.filter(F.col("deg") < k).select(F.col("u").alias("gone"))
        if peel.limit(1).count() == 0:
            converged = True
            break
        live = (
            live.join(peel, live.u == peel.gone, "left_anti")
            .join(peel, live.v == peel.gone, "left_anti")
            .localCheckpoint(eager=True)
        )
    if not converged and not allow_partial:
        # a silent partial answer would fabricate a dense region:
        # long-chain graphs peel one hop per round, so the cap CAN be
        # hit. allow_partial=True opts into the fixed-round state (the
        # unrolled-SQL-twin contract, where both engines stop at the
        # same round and agree exactly).
        raise RuntimeError(
            f"kcore did not converge within max_rounds={max_rounds}; "
            "raise max_rounds or pass allow_partial=True for the "
            "fixed-round contract"
        )
    return (
        live.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).alias("core_deg"))
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation communities -> (node, community).

    Raghavan et al. 2007 ("Near linear time algorithm to detect
    community structures"): every node starts in its own community and
    repeatedly adopts the most frequent label among its neighbors.
    This is the deterministic synchronous variant: a FIXED number of
    rounds, all nodes update together from the previous round's
    labels, and frequency ties break to the smallest label — no
    randomized visit order, so two runs (and the unrolled SQL twin)
    agree exactly. Synchronous LPA can oscillate on bipartite-ish
    structures instead of converging; the fixed-round contract makes
    that a defined answer rather than a hang, and in curation practice
    (duplicate-family detection over near-dup graphs) 3-5 rounds is
    where the partition stabilizes.

    Input is a symmetrized edge list (both orientations present — the
    ``pagerank(symmetric=True)`` / ``kcore`` contract). Shape per
    round: one join of edges to the |V|-sized label relation keyed by
    neighbor, one (node, label) count aggregate, one per-node
    row_number over its distinct neighbor labels (bounded by degree).
    Labels localCheckpoint each round so round r never replays rounds
    1..r-1 — the same iterative-state discipline as kcore and
    connected_components. At 100 TB every stage is keyed by node id;
    nothing broadcasts the full graph.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    ed = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = ed.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("lbl"))
    for _ in range(rounds):
        counts = (
            ed.join(labels, ed.v == labels.node)
            .groupBy(F.col("u").alias("n2"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumnRenamed("n2", "node")
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("lbl").alias("community"))


def modularity(
    edges: DataFrame,
    communities: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    community_col: str = "community",
) -> DataFrame:
    """Newman modularity of a partition -> one row (q, n_communities).

    Q = Σ_c [ m_c / m  −  (d_c / 2m)² ] over communities c, where m is
    the undirected edge count, m_c the intra-community edge count, and
    d_c the total degree inside c. Input edges are symmetrized (both
    orientations), so m = |rows|/2 and every intra-community edge is
    seen twice — the formula below works directly on directed-row
    counts, which keeps every term an exact integer ratio:

        Q = Σ_c [ rows_c / rows  −  (deg_c / rows)² ]

    One edge join to the community map (twice, per endpoint) and two
    small aggregates; the per-community relation is |communities|-sized
    before the final reduce. Degree sums stay integers until the final
    double divisions, so the oracle certifies Q exactly.
    """
    cmap = communities.select(
        F.col(node_col).alias("node"), F.col(community_col).alias("cm")
    )
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .join(cmap.withColumnRenamed("node", "u").withColumnRenamed("cm", "cu"), "u")
        .join(cmap.withColumnRenamed("node", "v").withColumnRenamed("cm", "cv"), "v")
    )
    per_c = e.groupBy(F.col("cu").alias("cm")).agg(
        F.sum(F.when(F.col("cu") == F.col("cv"), 1).otherwise(0)).alias("rows_c"),
        F.count(F.lit(1)).alias("deg_c"),
    )
    total = e.agg(F.count(F.lit(1)).alias("rows_all"))
    return (
        per_c.crossJoin(F.broadcast(total))
        .select(
            (
                F.col("rows_c") / F.col("rows_all").cast("double")
                - (F.col("deg_c") / F.col("rows_all").cast("double"))
                * (F.col("deg_c") / F.col("rows_all").cast("double"))
            ).alias("term")
        )
        .agg(
            F.round(F.sum(F.col("term").cast("decimal(28,12)")).cast("double"), 6)
            .alias("q"),
            F.count(F.lit(1)).cast("long").alias("n_communities"),
        )
    )


def bfs_distances(
    edges: DataFrame,
    sources: list[int],
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS -> (node, dist) for every node within
    ``max_hops`` of any source.

    The reachability/radius primitive (how far does contamination
    spread through a near-dup graph; which accounts sit within k hops
    of a flagged seed set). Frontier expansion with the same iterative
    discipline as kcore: per round ONE join (frontier -> neighbors) and
    ONE anti-join (drop already-visited), both keyed by node id;
    visited and frontier localCheckpoint so round r never replays
    rounds 1..r-1. Rounds are bounded by ``max_hops``, so the unrolled
    SQL twin reaches the identical state even on graphs with longer
    shortest paths (both engines stop at the same cap). Input is the
    symmetrized edge contract shared by pagerank/kcore/LPA.

    Early-exits when a frontier empties: the emptiness probe is a
    1-row aggregate, the same convergence pattern as kcore's peel.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    spark = edges.sparkSession
    ed = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seed = spark.createDataFrame(
        [(int(s),) for s in sources], "node long"
    ).distinct()
    visited = seed.select("node", F.lit(0).alias("dist")).localCheckpoint(
        eager=True
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            ed.join(frontier, ed.u == frontier.node)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    partitioned: bool = False,
) -> DataFrame:
    """Degree assortativity coefficient -> one row (n_edges, r).

    Newman 2002: the Pearson correlation of the degrees at either end
    of every edge — positive when hubs link to hubs (social graphs),
    negative when hubs link to leaves (hub-and-spoke). Input is the
    symmetrized edge list, which IS the standard convention: each
    undirected edge contributes both (deg_u, deg_v) orderings, making
    the statistic symmetric without special-casing. One degree
    aggregate, two joins onto the edge list, exact integer
    sufficient statistics (degree products bounded well inside 2^63),
    so r is partition-order exact; only the final divisions and sqrt
    are floating point.

    ``partitioned``: the degree relation is |nodes|-sized; the default
    broadcast hint is honest to ~10^8 nodes (pagerank's documented
    ceiling). ``partitioned=True`` drops the hint — the degree joins
    shuffle on the node key instead, the billion-node mode. Identical
    output either way (the pagerank twin-mode contract).
    """
    mb = (lambda d: d) if partitioned else F.broadcast
    ed = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    deg = ed.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    j = (
        ed.join(mb(deg.withColumnRenamed("u", "__a")), ed.u == F.col("__a"))
        .withColumnRenamed("d", "dx")
        .drop("__a")
        .join(mb(deg.withColumnRenamed("u", "__b")), ed.v == F.col("__b"))
        .withColumnRenamed("d", "dy")
        .drop("__b")
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    md = F.col("m").cast("double")
    cov = md * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    vx = md * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = md * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return agg.select(
        F.col("m").cast("long").alias("n_edges"),
        F.round(
            F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)), 6
        ).alias("r"),
    )


def adamic_adar(
    incidence: DataFrame,
    node_col: str = "node",
    via_col: str = "via",
    min_shared: int = 2,
    partitioned: bool = False,
) -> DataFrame:
    """Adamic-Adar link prediction over a (node, shared-entity)
    incidence list -> (u, v, shared, aa_score) with u < v.

    AA(u, v) = sum over shared entities s of 1 / ln(deg(s)) — common
    neighbors, discounted so ubiquitous entities contribute little.
    Candidate pairs come from the posting-list self-join on ``via_col``
    (never all-pairs): a shared entity with c incident nodes costs c^2
    pair rows, so pre-filter hub entities upstream (the sparsity guard
    every posting join in this repo carries, cf. dedup.ngram_jaccard's
    max_doc_freq). Each 1/ln(deg) is floor-rounded at 1e-6 once and
    summed in decimal(28,12), so scores are summation-order-free and
    engine-portable; deg=1 entities (ln = 0) cannot co-occur in any
    pair and are dropped before the division.

    ``partitioned``: the weight relation is |entities|-sized — the
    node-set size class. The default broadcast hint is honest to
    ~10^8 entities (pagerank's ceiling); ``partitioned=True`` drops it
    so the weight join shuffles on the entity key (billion-node mode).
    Identical output either way. The dominant cost is the pair
    self-join, which always shuffles on ``via_col``.
    """
    mb = (lambda d: d) if partitioned else F.broadcast
    inc = incidence.select(
        F.col(node_col).alias("n"), F.col(via_col).alias("s")
    ).distinct()
    deg = inc.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    wgt = deg.filter(F.col("deg") >= 2).select(
        "s",
        (
            F.floor(
                (F.lit(1.0) / F.log(F.col("deg").cast("double")))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("w"),
    )
    ew = inc.join(mb(wgt), "s")
    a, b = ew.alias("a"), ew.alias("b")
    return (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s")) & (F.col("a.n") < F.col("b.n")),
        )
        .groupBy(F.col("a.n").alias("u"), F.col("b.n").alias("v"))
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.sum(F.col("a.w").cast("decimal(28,12)"))
            .cast("double")
            .alias("aa_score"),
        )
        .filter(F.col("shared") >= min_shared)
    )


def hyperball(
    edges: DataFrame,
    max_radius: int = 6,
    lg_k: int = 12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HyperBall approximate neighborhood function (Boldi & Vigna
    2013) -> one row per radius r: (radius, reachable_pairs,
    delta_pairs, frac_of_final).

    N(r) = sum over nodes v of |B(v, r)| — how many (source, target)
    pairs lie within distance r. The exact computation is |V| BFS runs
    (hopeless at scale); HyperBall keeps ONE mergeable HLL sketch per
    node and runs the Pregel-shaped update

        S_v(r) = S_v(r-1)  UNION  S_u(r-1) for every neighbor u

    so a round is one edge join + one sketch-union hash aggregate —
    the identical shuffle shape as a PageRank iteration, with HLL
    union replacing the decimal sum. delta_pairs(r) = N(r) - N(r-1)
    is the (approximate) count of pairs at distance exactly r, and the
    smallest r with frac_of_final >= 0.9 is the standard effective-
    diameter estimate.

    Sketch state is |V| x 2^lg_k bytes (4 KiB at the default — ~4 GB
    per 10^6 nodes, spill-friendly since it lives in the aggregate,
    not the driver); per-round convergence probes are 1-row
    aggregates, the kcore discipline. Iteration state localCheckpoints
    each round so round r never replays rounds 1..r-1.

    Estimates are engine-specific (Datasketches registers): the driver
    contract records rows-only; the accuracy bound vs the exact
    closure is pinned in tests/test_graph.py. Input is the symmetrized
    edge contract shared by pagerank/kcore/bfs_distances.
    """
    if max_radius < 0:
        raise ValueError(f"max_radius must be >= 0, got {max_radius}")
    spark = edges.sparkSession
    ed = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = ed.select(F.col("u").alias("node")).union(
        ed.select(F.col("v").alias("node"))
    ).distinct()
    state = (
        nodes.groupBy("node")
        .agg(F.hll_sketch_agg("node", F.lit(lg_k)).alias("sk"))
        .localCheckpoint(eager=True)
    )

    def total(st: DataFrame) -> float:
        return float(
            st.agg(
                F.sum(F.hll_sketch_estimate("sk")).alias("t")
            ).first()["t"]
        )

    sums = [total(state)]
    for _ in range(1, max_radius + 1):
        contrib = ed.join(state, ed.v == state.node).select(
            F.col("u").alias("node"), "sk"
        )
        merged = (
            state.unionByName(contrib)
            .groupBy("node")
            .agg(F.hll_union_agg("sk").alias("sk"))
            .localCheckpoint(eager=True)
        )
        state.unpersist()
        state = merged
        t = total(state)
        sums.append(t)
        if t == sums[-2]:  # no ball grew: every sketch is stable
            break
    state.unpersist()
    final = sums[-1]
    rows = [
        (
            r,
            round(s, 2),
            round(s - (sums[r - 1] if r else 0.0), 2),
            round(s / final, 6) if final > 0 else None,
        )
        for r, s in enumerate(sums)
    ]
    return spark.createDataFrame(
        rows,
        "radius int, reachable_pairs double, delta_pairs double, "
        "frac_of_final double",
    )


def hyperball_exact(
    edges: DataFrame,
    max_radius: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Integer-exact structural twin of :func:`hyperball` -> one row
    per radius r: (radius, reachable_pairs, delta_pairs,
    frac_of_final).

    Same Pregel rounds — per-round edge join + per-node union
    aggregate, same early stop when no ball grows — but the per-node
    state is the EXACT sorted distinct reach set (array_union algebra)
    instead of HLL registers, so every output value is
    hash-certifiable against a recursive-CTE BFS oracle (the
    ann_ivf_exact pattern: the exact twin certifies the mechanism, the
    sketch variant keeps the pytest accuracy bound). frac_of_final
    floor-rounds at 1e-6 so both engines emit the identical double.

    Cost honesty: state is the transitive closure within max_radius —
    O(sum of ball sizes), which is what HyperBall exists to avoid. Use
    this for certification and small/medium graphs; hyperball for the
    web-scale neighborhood function.
    """
    import math  # noqa: PLC0415

    if max_radius < 0:
        raise ValueError(f"max_radius must be >= 0, got {max_radius}")
    spark = edges.sparkSession
    ed = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = ed.select(F.col("u").alias("node")).union(
        ed.select(F.col("v").alias("node"))
    ).distinct()
    state = nodes.select(
        "node", F.array("node").alias("reach")
    ).localCheckpoint(eager=True)

    def total(st: DataFrame) -> int:
        return int(st.agg(F.sum(F.size("reach")).alias("t")).first()["t"])

    sums = [total(state)]
    for _ in range(1, max_radius + 1):
        contrib = ed.join(state, ed.v == state.node).select(
            F.col("u").alias("node"), "reach"
        )
        merged = (
            state.unionByName(contrib)
            .groupBy("node")
            .agg(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("reach")))
                ).alias("reach")
            )
            .localCheckpoint(eager=True)
        )
        state.unpersist()
        state = merged
        t = total(state)
        sums.append(t)
        if t == sums[-2]:  # no ball grew: closure reached
            break
    state.unpersist()
    final = sums[-1]
    rows = [
        (
            r,
            s,
            s - (sums[r - 1] if r else 0),
            (math.floor(s / final * 1e6 + 0.5) / 1e6) if final > 0 else None,
        )
        for r, s in enumerate(sums)
    ]
    return spark.createDataFrame(
        rows,
        "radius int, reachable_pairs bigint, delta_pairs bigint, "
        "frac_of_final double",
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic uniform random walks, one per node -> tidy rows
    (walk_id, step, node) with step 0 = the start node.

    The DeepWalk/node2vec corpus-generation primitive: walks become
    "sentences" for a skip-gram embedding of the graph. The "random"
    choice is derandomized the way every sampler in this engine is
    (operators/sampling's md5-bucket rule): at step r, walk w moves to
    neighbor index  md5(w ':' r) % degree(cur)  over the neighbor list
    ranked by destination id. Same walks on any engine, any cluster
    layout, any retry — which makes the generated corpus cacheable and
    the oracle replayable, where rand()-based walks are neither.

    Scale shape: the ranked adjacency (one row_number window keyed by
    source node — degree-bounded partitions, no global window) is
    built once and localCheckpointed; each step is ONE equi-join of
    the |V|-sized frontier against it, keyed by current node. Walks
    ending at a sink (out-degree 0 after symmetrization: impossible;
    in directed graphs: possible) simply stop — shorter rows, no
    nulls. Biased second-order walks (node2vec's p/q) would carry
    (prev, cur) as the join key against a (prev, cur)-ranked edge
    table — same shape, square the state.
    """
    if walk_len < 0:
        raise ValueError(f"walk_len must be >= 0, got {walk_len}")
    from econdatapipeline_spark.operators.sampling import (  # noqa: PLC0415
        _md5_bucket,
    )

    ed = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    w_rank = Window.partitionBy("u").orderBy(F.col("v").asc())
    adj = (
        ed.withColumn("idx", F.row_number().over(w_rank) - 1)
        .withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("u")))
        .localCheckpoint(eager=True)
    )
    frontier = (
        ed.select(F.col("u").alias("walk_id")).distinct()
        .select("walk_id", F.col("walk_id").alias("node"))
    )
    out = frontier.select(
        "walk_id", F.lit(0).alias("step"), "node"
    )
    for r in range(1, walk_len + 1):
        pick = _md5_bucket(
            F.concat_ws(":", F.col("walk_id"), F.lit(str(r))), 1_000_003
        )
        nxt = (
            frontier.join(adj, frontier.node == adj.u)
            .filter(F.col("idx") == pick % F.col("deg"))
            .select("walk_id", F.col("v").alias("node"))
            # Per-step materialization (the hits half-round discipline):
            # without it, step r's plan replays steps 1..r-1's joins and
            # the final plan carries O(walk_len^2) exchanges (39 at
            # walk_len=4 on the node2vec twin). Values are unchanged —
            # the md5 picks are deterministic.
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            nxt.select("walk_id", F.lit(r).alias("step"), "node")
        )
        frontier = nxt
    return out


def random_walks_biased(
    edges: DataFrame,
    walk_len: int = 4,
    w_return: int = 1,
    w_common: int = 4,
    w_far: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016)
    -> tidy rows (walk_id, step, node).

    The transition out of (prev -> cur) weights each neighbor ``next``
    by INTEGER weights — w_return if next == prev (node2vec's 1/p),
    w_common if next also neighbors prev (distance 1: BFS-ish,
    community-exploring), w_far otherwise (1/q, DFS-ish). Integer
    weights are the determinism trick: the choice draws
    u = md5(walk ':' step) % total_weight and picks the neighbor whose
    cumulative-weight interval [cum - w, cum) contains u — exact
    integer arithmetic end-to-end, so the same walks come out of any
    engine (the float-threshold variant would wobble at 1-ulp
    boundaries). Step 1 has no prev: it follows the first-order
    uniform rule (md5 % degree over the id-ranked adjacency), exactly
    ``random_walks``.

    Shape per step: one equi-join of the frontier against the
    adjacency (keyed by cur), one left-join against the edge set for
    the common-neighbor test (keyed by (prev, next)), and one
    walk-partitioned window for the cumulative weights — the state
    node2vec needs is exactly that (prev, cur) pair, the "square the
    key" upgrade the first-order docstring promises.
    """
    if walk_len < 0:
        raise ValueError(f"walk_len must be >= 0, got {walk_len}")
    if min(w_return, w_common, w_far) < 1:
        raise ValueError("weights must be positive integers")
    from econdatapipeline_spark.operators.sampling import (  # noqa: PLC0415
        _md5_bucket,
    )

    ed = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    w_rank = Window.partitionBy("u").orderBy(F.col("v").asc())
    adj = (
        ed.withColumn("idx", F.row_number().over(w_rank) - 1)
        .withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("u")))
        .localCheckpoint(eager=True)
    )
    start = ed.select(F.col("u").alias("walk_id")).distinct()
    out = start.select(
        "walk_id", F.lit(0).alias("step"), F.col("walk_id").alias("node")
    )
    # step 1: uniform first-order pick (no prev yet)
    pick1 = _md5_bucket(
        F.concat_ws(":", F.col("walk_id"), F.lit("1")), 1_000_003
    )
    frontier = (
        start.select("walk_id", F.col("walk_id").alias("node"))
        .join(adj, F.col("node") == adj.u)
        .filter(F.col("idx") == pick1 % F.col("deg"))
        .select(
            "walk_id", F.col("u").alias("prev"), F.col("v").alias("cur")
        )
        .localCheckpoint(eager=True)
    )
    out = out.unionByName(
        frontier.select(
            "walk_id", F.lit(1).alias("step"), F.col("cur").alias("node")
        )
    )
    has_edge = ed.select(
        F.col("u").alias("prev"), F.col("v").alias("cand"),
        F.lit(1).alias("pc_edge"),
    )
    for r in range(2, walk_len + 1):
        cand = (
            frontier.join(adj, frontier.cur == adj.u)
            .select(
                "walk_id", "prev", "cur", F.col("v").alias("cand")
            )
            .join(has_edge, ["prev", "cand"], "left")
            .withColumn(
                "w",
                F.when(F.col("cand") == F.col("prev"), F.lit(w_return))
                .when(F.col("pc_edge").isNotNull(), F.lit(w_common))
                .otherwise(F.lit(w_far)),
            )
        )
        ww = Window.partitionBy("walk_id").orderBy(F.col("cand").asc())
        wt = Window.partitionBy("walk_id")
        cand = cand.withColumn("cum", F.sum("w").over(ww)).withColumn(
            "total", F.sum("w").over(wt)
        )
        u_int = _md5_bucket(
            F.concat_ws(":", F.col("walk_id"), F.lit(str(r))), 2_147_483_647
        ) % F.col("total")
        nxt = cand.filter(
            (u_int >= F.col("cum") - F.col("w")) & (u_int < F.col("cum"))
        ).select(
            "walk_id", F.col("cur").alias("prev"), F.col("cand").alias("cur")
        ).localCheckpoint(eager=True)
        # ^ per-step materialization, exactly random_walks: each round's
        # (prev, cur) state is pinned so round r+1 never replays rounds
        # 1..r's join+window chain (36 exchanges at walk_len=4 before).
        out = out.unionByName(
            nxt.select(
                "walk_id", F.lit(r).alias("step"), F.col("cur").alias("node")
            )
        )
        frontier = nxt
    return out


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    partitioned: bool = False,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) -> (node, authority, hub).

    The hubs-and-authorities companion to pagerank: a(v) = sum of
    h(u) over in-edges, h(u) = sum of a(v) over out-edges,
    SUM-normalized each half-round (the L1 choice keeps the
    normalizer a decimal-exact aggregate an oracle replays; the
    classic L2 only changes scores by a per-round constant factor, so
    rankings are identical). Hub scores separate "links to good
    pages" from "is a good page" — on a citation or reference graph
    the two rankings answer different questions, which is why this is
    not redundant with pagerank.

    Plan shape per round: two keyed joins of the |nodes|-sized score
    relation against the cached degree-annotated edges + two hash
    aggregates + two 1-row normalizer crossjoins. ``partitioned``
    mirrors pagerank's billion-node escape: scores SHUFFLE onto the
    pinned hash(src) edge layout instead of broadcasting. Scores are
    quantized decimal(18,9) between rounds (the markov_stationary
    channel), so both modes and both engines are bit-identical.
    Nodes with no in-edges carry authority 0; no out-edges, hub 0.
    Executes eagerly and releases its working sets (_finish).
    """
    if iterations < 1:
        raise ValueError("hits needs iterations >= 1")
    ed = _edge_relation(edges, src, dst, partitioned)
    mb = (lambda df: df) if partitioned else F.broadcast
    dec_sum = lambda c: F.sum(c.cast("decimal(28,12)")).cast("double")  # noqa: E731
    q9 = lambda c: c.cast("decimal(18,9)").cast("double")  # noqa: E731

    nodes = (
        ed.select(F.col("e_src").alias("node"))
        .union(ed.select(F.col("e_dst").alias("node")))
        .distinct()
        .cache()
    )

    def _norm(scores: DataFrame, col: str) -> DataFrame:
        # the scores relation is referenced TWICE (normalizer agg +
        # the division) and feeds the next half-round: without a cut,
        # every reference replays the whole upstream lineage and the
        # plan re-executes prior rounds multiplicatively (measured
        # 100 s -> 80 s at the 20M probe, both under bench load)
        scores = scores.localCheckpoint(eager=True)
        tot = scores.agg(
            F.sum(F.col(col).cast("decimal(28,12)"))
            .cast("double")
            .alias("_tot")
        )
        return scores.crossJoin(F.broadcast(tot)).select(
            "node",
            q9(F.try_divide(F.col(col), F.col("_tot"))).alias(col),
        )

    # round 1 shortcut: h_0 = 1 everywhere, so the first authority
    # aggregate is just the in-degree
    a_raw = ed.groupBy(F.col("e_dst").alias("node")).agg(
        dec_sum(F.lit(1.0)).alias("authority")
    )
    auth = _norm(
        nodes.join(a_raw, "node", "left").select(
            "node", F.coalesce("authority", F.lit(0.0)).alias("authority")
        ),
        "authority",
    )
    hub = None
    for it in range(iterations):
        h_raw = (
            ed.join(mb(auth), ed.e_dst == auth.node)
            .select(F.col("e_src").alias("node"), F.col("authority").alias("c"))
            .groupBy("node")
            .agg(dec_sum(F.col("c")).alias("hub"))
        )
        hub = _norm(
            nodes.join(h_raw, "node", "left").select(
                "node", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
        if it == iterations - 1:
            break
        a_raw = (
            ed.join(mb(hub), ed.e_src == hub.node)
            .select(F.col("e_dst").alias("node"), F.col("hub").alias("c"))
            .groupBy("node")
            .agg(dec_sum(F.col("c")).alias("authority"))
        )
        auth = _norm(
            nodes.join(a_raw, "node", "left").select(
                "node",
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            ),
            "authority",
        )
    out = auth.join(hub, "node").select(
        "node",
        F.round("authority", 6).alias("authority"),
        F.round("hub", 6).alias("hub"),
    ).localCheckpoint(eager=True)
    ed.unpersist()
    nodes.unpersist()
    return out


def harmonic_centrality(
    edges: DataFrame,
    sources: list[int],
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    assume_distinct: bool = False,
    undirected: bool = False,
) -> DataFrame:
    """Harmonic centrality of a seed set -> one row per source
    (node, n_reached, harmonic).

    harmonic(s) = sum over reachable v != s of 1/d(s, v), truncated
    at ``max_hops`` (Boldi & Vigna's recommendation over closeness:
    well-defined on disconnected graphs, monotone in reach). The
    "which accounts are structurally central" readout on the same
    symmetrized edge contract as pagerank/bfs — per-seed importance
    grounded in distance rather than flow.

    Shape: ONE multi-source BFS that tracks (source, node) pairs —
    frontier expansion joins are keyed by node id exactly as
    bfs_distances, state is |sources| x |reached| rows (bounded by
    the seed count; for whole-graph centrality sample seeds — the
    hyperball operator is the all-nodes estimator). 1/d harmonics
    are exact binary fractions only for d in {1,2,4}; the sum folds
    decimal(28,12)-quantized terms, oracle-replayable.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    spark = edges.sparkSession
    # assume_distinct: a caller whose edge derivation already
    # guarantees distinct (src, dst) pairs (e.g. a distinct-pairs join
    # symmetrized by explode) skips the dedup — otherwise that is one
    # full extra shuffle of the edge list before the first hop. The
    # fan_out matters either way: the checkpoint otherwise pins the
    # AQE-coalesced (often single-partition) layout, serializing every
    # hop's expansion probe.
    ed = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not assume_distinct:
        ed = ed.distinct()
    from econdatapipeline_spark.sources.tables import fan_out  # noqa: PLC0415

    ed = fan_out(ed).localCheckpoint(eager=True)
    seed = spark.createDataFrame(
        [(int(s),) for s in sources], "s long"
    ).distinct()
    seed0 = seed.select(
        "s", F.col("s").alias("node"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    # ``undirected=True`` is the caller's guarantee that every edge has
    # its reverse (the pagerank `symmetric` contract): a BFS neighbor
    # of frontier_d then sits at distance d-1, d, or d+1, so the
    # dedup anti-join needs only the LAST TWO frontiers instead of the
    # whole accumulated visited set — the growing per-hop
    # union+checkpoint of visited disappears and the anti-join's build
    # side stays frontier-sized at any depth. Identical output on any
    # genuinely undirected input; pass False (default) for digraphs.
    frontiers = [seed0]
    frontier, prev = seed0, None
    for hop in range(1, max_hops + 1):
        if undirected:
            excl = (
                frontier
                if prev is None
                else frontier.unionByName(prev)
            ).select("s", "node")
        else:
            excl = None  # full visited, built below
        if excl is None:
            visited = frontiers[0]
            for fr in frontiers[1:]:
                visited = visited.unionByName(fr)
            excl = visited.select("s", "node")
        nxt = (
            ed.join(frontier, ed.u == frontier.node)
            .select("s", F.col("v").alias("node"))
            .distinct()
            .join(excl, ["s", "node"], "left_anti")
            .select("s", "node", F.lit(hop).alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        prev, frontier = frontier, nxt
        frontiers.append(nxt)
    visited = frontiers[0]
    for fr in frontiers[1:]:
        visited = visited.unionByName(fr)
    reached = visited.filter(F.col("dist") > 0)
    out = reached.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_reached"),
        F.sum(
            (F.lit(1.0) / F.col("dist").cast("double")).cast(
                "decimal(28,12)"
            )
        )
        .cast("double")
        .alias("h"),
    )
    return seed.join(out, "s", "left").select(
        F.col("s").alias("node"),
        F.coalesce("n_reached", F.lit(0).cast("long")).alias(
            "n_reached"
        ),
        F.round(F.coalesce("h", F.lit(0.0)), 6).alias("harmonic"),
    )
