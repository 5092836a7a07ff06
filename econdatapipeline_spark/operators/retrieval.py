"""Hybrid retrieval: lexical BM25 + embedding cosine, fused by RRF.

The standard two-tower retrieval stack for training-data curation and
RAG indexing: a sparse (keyword) ranker and a dense (embedding) ranker
each produce a bounded top-``depth`` candidate list, and reciprocal
rank fusion (Cormack et al., SIGIR 2009) combines them without any
score calibration — ranks, not scores, so the two lists' wildly
different scales never need normalizing.

Shuffle shape at 100 TB: each ranker is already bounded (BM25's explode
is filtered to query terms before aggregation; the dense side is a
partition-parallel scan reduced by TakeOrdered), so fusion itself joins
two <= depth-row relations — driver-trivial, broadcast by AQE. The
corpus is scanned at most twice and never materialized unbounded.

No reference analog (the reference has no search surface); this extends
the engine's similarity-search family (SURVEY §2 north-star ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from econdatapipeline_spark.operators.similarity import brute_force_topk
from econdatapipeline_spark.operators.tfidf import bm25_search


def rrf_fuse(
    lists: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Fuse ranked lists by reciprocal rank: score(d) = sum 1/(c + rank).

    Each input must carry (id_col, rank_col) with rank starting at 1.
    Documents absent from a list contribute 0 for it (the standard RRF
    convention). Output: (id_col, rrf, n_lists_hit) top-k, ties broken
    by id ascending. All inputs are candidate lists (<= a few hundred
    rows each), so the union + aggregate is a no-shuffle-concern plan.
    """
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    parts = [
        d.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col).cast("double"))).alias(
                "contrib"
            ),
        )
        for d in lists
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(
            F.round(F.sum("contrib"), 6).alias("rrf"),
            F.count("*").alias("n_lists_hit"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    depth: int = 50,
    c: int = 60,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Top-k documents for a (keywords, query-vector) pair via RRF.

    Lexical list: ``bm25_search`` top-``depth`` re-ranked 1..depth by
    (bm25 desc, id asc). Dense list: ``brute_force_topk`` of the corpus
    against the single query vector (already emits rank 1..depth). The
    window that numbers the lexical list runs over a <= depth-row
    relation — bounded, so the single-partition window is free, not a
    scale hazard.

    Output: (doc_id, rrf, lex_rank, sem_rank) with null rank when a
    document appears in only one list.
    """
    lex = bm25_search(docs, query_terms, k=depth, id_col=doc_id_col)
    w = Window.orderBy(F.col("bm25").desc(), F.col(doc_id_col).asc())
    lex = lex.select(
        F.col(doc_id_col), F.row_number().over(w).alias("lex_rank")
    )
    q = embeddings.filter(F.col(vec_id_col) == query_vec_id)
    sem = brute_force_topk(embeddings, q, k=depth, id_col=vec_id_col).select(
        F.col("neighbor_id").alias(doc_id_col),
        F.col("rank").alias("sem_rank"),
    )
    fused = lex.join(sem, doc_id_col, "full_outer").select(
        doc_id_col,
        F.round(
            F.coalesce(1.0 / (F.lit(float(c)) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(float(c)) + F.col("sem_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        F.col("lex_rank").cast("long").alias("lex_rank"),
        F.col("sem_rank").cast("long").alias("sem_rank"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col(doc_id_col).asc()).limit(k)


def rbo(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    item_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 25,
    p: float = 0.9,
    query_col: str | None = None,
) -> DataFrame:
    """Rank-biased overlap (Webber et al., TOIS 2010) between two
    top-k rankings -> (query?, overlap_k, rbo).

        RBO@k = (1-p) * sum_(d=1..k) p^(d-1) * |A_d n B_d| / d

    The top-weighted ranking-churn metric: "how much did the leaderboard
    move?" between two retrieval configs (ann_lsh vs exact), two corpus
    snapshots, or two time periods — overlap near the TOP counts more
    (geometric weight p^(d-1)), unlike plain overlap_k or ranking
    correlation over full lists.

    Shuffle shape: both inputs are already bounded top-k lists, so the
    inner join is <= k rows per query (AQE broadcast-sized). The depth
    sum never materializes: an item first co-present at depth
    m = max(rank_a, rank_b) contributes w(m) = sum_(d=m..k) (1-p)
    p^(d-1)/d — a k-entry literal CASE map computed ONCE driver-side,
    so the operator is one join + one aggregate.

    Determinism: the w(m) literals are Python doubles inlined into the
    plan (the oracle inlines the repr of the SAME doubles, so both
    engines sum identical values); per-item weights are quantized to
    decimal(28,12) before the order-free sum.
    """
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0,1), got {p}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qcols = [query_col] if query_col else []
    fa = ranked_a.filter(F.col(rank_col) <= k).select(
        *qcols, F.col(item_col).alias("item"), F.col(rank_col).alias("ra")
    )
    fb = ranked_b.filter(F.col(rank_col) <= k).select(
        *qcols, F.col(item_col).alias("item"), F.col(rank_col).alias("rb")
    )
    weights = rbo_weights(k, p)
    mr = F.greatest(F.col("ra"), F.col("rb"))
    wexpr = F.lit(0.0)
    for m in range(k, 0, -1):
        wexpr = F.when(mr == m, F.lit(weights[m])).otherwise(wexpr)
    joined = fa.join(fb, qcols + ["item"])
    per = joined.groupBy(*qcols).agg(
        F.count(F.lit(1)).cast("long").alias("overlap_k"),
        F.coalesce(
            F.round(F.sum(wexpr.cast("decimal(28,12)")).cast("double"), 6),
            F.lit(0.0),
        ).alias("rbo"),
    )
    if not qcols:
        # global agg on an empty join still yields its one row
        # (overlap_k=0, rbo coalesced to 0.0) — nothing to seed
        return per
    # Grouped: a query whose two lists share NOTHING vanishes from the
    # inner join — exactly the highest-churn queries the metric exists
    # to flag. Seed the result with the query universe from BOTH
    # inputs (each is <= k rows/query, so the distinct is list-sized)
    # and emit rbo = 0 for the disjoint ones.
    universe = (
        fa.select(*qcols).union(fb.select(*qcols)).distinct()
    )
    return universe.join(per, qcols, "left").select(
        *qcols,
        F.coalesce(F.col("overlap_k"), F.lit(0).cast("long")).alias(
            "overlap_k"
        ),
        F.coalesce(F.col("rbo"), F.lit(0.0)).alias("rbo"),
    )


def rbo_weights(k: int, p: float) -> dict[int, float]:
    """w(m) = sum_(d=m..k) (1-p) p^(d-1) / d — the RBO mass an item
    earns when it first appears in both prefixes at depth m. Exposed so
    the oracle side can inline the byte-identical literals."""
    per_depth = [(1.0 - p) * p ** (d - 1) / d for d in range(1, k + 1)]
    return {m: sum(per_depth[m - 1:]) for m in range(1, k + 1)}
