"""Ranking evaluation: NDCG@k, MRR@k, precision/recall@k per query.

The retrieval-eval companion to the search operators (bm25_search,
brute_force_topk, hybrid_search): given a *run* (query_id, doc_id,
rank) and *qrels* relevance judgments (query_id, doc_id, rel), compute
the standard graded-ranking metrics exactly — the harness any
training-data retrieval stack needs before trusting an index swap
(e.g. certifying that ann_ivf's recall loss does not move NDCG).

Metric definitions (TREC conventions, Järvelin & Kekäläinen 2002):

    gain(rank, rel) = (2^rel - 1) / log2(rank + 1)
    DCG@k  = sum of gain over run rows with rank <= k
    IDCG@k = DCG of the ideal ordering (qrels sorted by rel desc)
    NDCG@k = DCG / IDCG            (0 when the query has no judged rel)
    MRR@k  = 1 / first rank with rel > 0 within k, else 0
    P@k    = judged-relevant hits in top-k / k
    R@k    = judged-relevant hits in top-k / total judged-relevant

Determinism: per-position gains are quantized to decimal(18,9) before
summation (the lm.py / classify.py discipline), so DCG and IDCG are
exact order-free decimal sums on both engines; the final NDCG division
runs on those identical decimals cast to double, rounded to 6 — the
log2() 1-ulp libm caveat documented at tfidf.pmi_bigrams is absorbed
by the quantization except at exact half-way boundaries.

Shuffle shape at 100 TB: the run is pre-bounded (<= depth rows per
query by construction), so the rank filter and per-query aggregate
shuffle at most queries x k rows. The IDCG window partitions by query
over the *judged* set — human judgment pools are bounded per query
(hundreds), so no per-query relation here grows with corpus size.

No reference analog (the reference has no search surface); extends the
similarity-search family (SURVEY §2 north-star ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gain(rel, rank):
    """Graded gain, quantized decimal(18,9): (2^rel - 1)/log2(rank+1).

    2^rel via pow(2.0, rel) — IEEE-exact for integer exponents up to
    2^52, so the numerator is an exact small integer in double."""
    num = F.pow(F.lit(2.0), rel.cast("double")) - F.lit(1.0)
    return (num / F.log2(rank.cast("double") + F.lit(1.0))).cast(
        "decimal(18,9)"
    )


def ranking_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query metrics -> (query_id, ndcg, mrr, prec, recall, n_rel,
    n_hit).

    ``run`` must carry unique ranks 1..depth per query; ``qrels``
    carries integer grades >= 0 (0 = judged not-relevant). Unjudged
    run documents contribute gain 0. Queries present in the run but
    absent from qrels get all-zero metrics.
    """
    run_k = run.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rank_col).alias("rnk"),
    )
    judged = qrels.select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rel_col).cast("int").alias("rel"),
    )
    # DCG + hit stats: one join (run is bounded per query) + one agg.
    scored = run_k.join(judged, ["q", "d"], "left").select(
        "q",
        "rnk",
        F.coalesce(F.col("rel"), F.lit(0)).alias("rel"),
    )
    per_q = scored.groupBy("q").agg(
        F.sum(_gain(F.col("rel"), F.col("rnk"))).alias("dcg"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("n_hit"),
        F.min(F.when(F.col("rel") > 0, F.col("rnk"))).alias("first_hit"),
    )
    # Ideal ordering: judged docs by (rel desc, doc asc), top-k.
    w = Window.partitionBy("q").orderBy(F.desc("rel"), F.asc("d"))
    ideal = (
        judged.filter(F.col("rel") > 0)
        .withColumn("irnk", F.row_number().over(w))
        .filter(F.col("irnk") <= k)
        .groupBy("q")
        .agg(F.sum(_gain(F.col("rel"), F.col("irnk"))).alias("idcg"))
    )
    n_rel = (
        judged.filter(F.col("rel") > 0)
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    out = (
        per_q.join(ideal, "q", "left")
        .join(n_rel, "q", "left")
        .select(
            F.col("q").alias(query_col),
            F.when(
                F.col("idcg").isNotNull() & (F.col("idcg") != 0),
                F.round(
                    F.col("dcg").cast("double") / F.col("idcg").cast("double"),
                    6,
                ),
            )
            .otherwise(0.0)
            .alias("ndcg"),
            F.round(
                F.coalesce(
                    1.0 / F.col("first_hit").cast("double"), F.lit(0.0)
                ),
                6,
            ).alias("mrr"),
            F.round(F.col("n_hit").cast("double") / F.lit(float(k)), 6).alias(
                "prec"
            ),
            F.when(
                F.col("n_rel").isNotNull(),
                F.round(
                    F.col("n_hit").cast("double")
                    / F.col("n_rel").cast("double"),
                    6,
                ),
            )
            .otherwise(0.0)
            .alias("recall"),
            F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
            F.col("n_hit").cast("long").alias("n_hit"),
        )
    )
    return out
