"""Diversity-aware selection: maximal marginal relevance (MMR).

The curation counterpart of plain top-k: when assembling few-shot
exemplars, eval suites, or seed corpora from a retrieval shortlist,
taking the k highest-relevance items yields near-duplicates; MMR
(Carbonell & Goldstein, SIGIR 1998) greedily picks

    argmax over unselected c of
        lam * rel(c) - (1 - lam) * max over selected s of cos(c, s)

so each pick trades relevance against redundancy with what is already
chosen.

Execution shape: the greedy loop is inherently sequential in k, so the
driver runs k rounds — but each round is ONE distributed TakeOrdered
over the candidate relation (the bpe_train / centroid-update pattern:
driver-side loop bounded by a small constant, per-round work fully
parallel), and the selected set it compares against is <= k vectors
shipped as a broadcast-sized literal relation. Candidates are a
SHORTLIST by contract (the output of bm25/ANN retrieval, thousands of
rows) — MMR over a raw corpus would be mis-use, and the docstring of
the contract query pins that: run retrieval first, diversify second.

Determinism: pair cosines round to 6 decimals before the max, the MMR
score rounds to 6 before the argmax, and ties break by ascending id —
the same discipline as brute_force_topk, so the full greedy trajectory
is engine-portable and a SQL oracle replays it as k unrolled CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.vectors import dot, norm


def mmr_select(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    rel_col: str = "rel",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy MMR top-k -> (rank, id, rel, mmr_score).

    ``candidates`` carries (id, rel, vec). Round 1 picks the highest
    ``rel`` (ties by id); each later round scores every unselected
    candidate against the current selected set and takes the best
    rounded MMR score (ties by id). ``mmr_score`` for rank 1 is
    lam * rel (no redundancy term yet) — the standard convention.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    spark = candidates.sparkSession
    cand = candidates.select(
        F.col(id_col).alias("id"),
        F.col(rel_col).cast("double").alias("rel"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("vn"),
    ).localCheckpoint(eager=True)

    first = (
        cand.orderBy(F.desc("rel"), F.asc("id"))
        .limit(1)
        .select(
            "id",
            "rel",
            # HALF_UP like every other score in the trajectory — a
            # Python round() here would be banker's rounding
            F.round(F.lit(lam) * F.col("rel"), 6).alias("ms"),
            "v",
            "vn",
        )
        .collect()[0]
    )
    picked = [(1, first["id"], first["rel"], first["ms"])]
    sel_rows = [(first["id"], first["v"], first["vn"])]
    vec_type = dict(cand.dtypes)["v"]
    for _ in range(1, k):
        sel = spark.createDataFrame(
            sel_rows, f"sid long, sv {vec_type}, svn double"
        )
        scored = (
            cand.join(
                F.broadcast(sel.select(F.collect_set("sid").alias("sids"))
                            .crossJoin(sel).select("sids", "sv", "svn"))
            )
            .filter(~F.array_contains(F.col("sids"), F.col("id")))
            .select(
                "id",
                "rel",
                "v",
                "vn",
                F.round(
                    dot(F.col("v"), F.col("sv")) / (F.col("vn") * F.col("svn")),
                    6,
                ).alias("cos"),
            )
            .groupBy("id")
            .agg(
                F.max("rel").alias("rel"),
                F.max("cos").alias("max_sim"),
                # carry the winner's vector through the aggregate so the
                # round is ONE TakeOrdered job, not TakeOrdered + a
                # second lookup collect (id is unique in the shortlist,
                # so first() is exact)
                F.first("v").alias("v"),
                F.first("vn").alias("vn"),
            )
            .select(
                "id",
                "rel",
                "v",
                "vn",
                F.round(
                    F.lit(lam) * F.col("rel")
                    - F.lit(1.0 - lam) * F.col("max_sim"),
                    6,
                ).alias("mmr_score"),
            )
        )
        best = scored.orderBy(F.desc("mmr_score"), F.asc("id")).limit(1).collect()
        if not best:
            break
        b = best[0]
        picked.append((len(picked) + 1, b["id"], b["rel"], b["mmr_score"]))
        sel_rows.append((b["id"], b["v"], b["vn"]))
    return spark.createDataFrame(
        picked, "rank int, id long, rel double, mmr_score double"
    )
