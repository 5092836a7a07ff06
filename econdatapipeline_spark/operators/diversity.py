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
    """Greedy MMR top-k -> (rank, <id_col>, rel, mmr_score).

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
    # id keeps the CALLER's type (string doc ids are typical in
    # retrieval shortlists) — derived from the input schema, never
    # assumed long; the output column keeps the caller's name too.
    id_type = dict(cand.dtypes)["id"]

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
    sel_ids = [first["id"]]
    # the <= k selected vectors live as PLAN LITERALS (array<double>
    # columns — dot() casts every element to double anyway, so the
    # literal path is value-identical to the old broadcast-join path):
    # each round is ONE projection over the checkpointed shortlist +
    # one TakeOrdered, with no join, no groupBy shuffle, and no
    # per-round createDataFrame
    sel_vecs = [([float(x) for x in first["v"]], float(first["vn"]))]
    for _ in range(1, k):
        cos_exprs = [
            F.round(
                dot(F.col("v"), F.lit(sv)) / (F.col("vn") * F.lit(svn)), 6
            )
            for sv, svn in sel_vecs
        ]
        max_sim = (
            cos_exprs[0] if len(cos_exprs) == 1 else F.greatest(*cos_exprs)
        )
        scored = cand.filter(~F.col("id").isin(sel_ids)).select(
            "id",
            "rel",
            "v",
            "vn",
            F.round(
                F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * max_sim,
                6,
            ).alias("mmr_score"),
        )
        best = (
            scored.orderBy(F.desc("mmr_score"), F.asc("id")).limit(1).collect()
        )
        if not best:
            break
        b = best[0]
        picked.append((len(picked) + 1, b["id"], b["rel"], b["mmr_score"]))
        sel_ids.append(b["id"])
        sel_vecs.append(([float(x) for x in b["v"]], float(b["vn"])))
    return spark.createDataFrame(
        [(r, i, rel, ms) for r, i, rel, ms in picked],
        f"rank int, `{id_col}` {id_type}, rel double, mmr_score double",
    )
