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
