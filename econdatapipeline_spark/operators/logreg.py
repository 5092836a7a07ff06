"""Distributed logistic regression over token counts (batch GD).

The trainable half of the classify.py story: Naive Bayes is the
counts-only baseline; this is the discriminative fastText-shaped
classifier (bag-of-tokens logistic regression) trained by full-batch
gradient descent where EVERY iteration is two joins and two hash
aggregates — no parameter server, no collect. The weight vector lives
as a DataFrame (token, w): vocab-sized, broadcastable, and persisted
between iterations, which is exactly how a linear model should exist
on Spark.

    margin_d = sum_t c(d,t) * w(t)            (join + per-doc agg)
    p_d      = sigmoid(margin_d)
    grad(t)  = sum_d (p_d - y_d) * c(d,t) / n + l2 * w(t)
    w'(t)    = w(t) - lr * grad(t)

Engine-portable determinism (the fs_em/lm discipline): per-doc errors
(p - y) and the updated weights are quantized to decimal(18,9), so
every sufficient-statistic sum is exact and summation-order-free —
the whole training trajectory, and therefore every prediction,
reproduces bit-for-bit in any engine (the SQL oracle unrolls the same
iterations over the same weight-table CTEs).

Scale shape: the doc-token count matrix is built once and
localCheckpointed (it is the training set — explode + hash agg);
each iteration shuffles that matrix ONCE by token for the gradient
(map-side combine) after a broadcast join against the vocab-sized
weight table. Iterations are a handful (full-batch GD on a convex
loss with bounded features converges fast for filtering purposes);
at billification the same loop runs mini-batched by md5-bucket
without changing shape.

No reference analog; public formulation (standard logistic GD).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.text import tokenize

BIAS = "__bias__"


def _doc_tokens(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, tok, c) per-document token counts plus a bias feature."""
    counts = (
        df.select(
            F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bias = df.select(
        F.col(id_col), F.lit(BIAS).alias("tok"), F.lit(1).alias("c")
    )
    return counts.unionByName(bias)


def logreg_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    iters: int = 3,
    lr: float = 0.5,
    l2: float = 0.001,
) -> DataFrame:
    """Fit weights -> (tok, w) with w decimal(18,9), bias under
    ``BIAS``. ``label_col`` must be 0/1 (castable). Weights start at
    zero, so iteration 1's predictions are exactly 0.5 — the oracle
    replays from the same origin."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    mat = _doc_tokens(df, text_col, id_col).join(
        df.select(
            F.col(id_col), F.col(label_col).cast("int").alias("y")
        ),
        id_col,
    ).localCheckpoint(eager=True)
    n_docs = df.count()  # driver scalar: sizes the gradient step
    w = (
        mat.select("tok").distinct()
        .select("tok", F.lit(0).cast("decimal(18,9)").alias("w"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        margins = (
            mat.join(F.broadcast(w), "tok", "left")
            .groupBy(id_col, "y")
            .agg(
                F.sum(
                    F.coalesce(F.col("w"), F.lit(0).cast("decimal(18,9)"))
                    * F.col("c")
                ).alias("m")
            )
        )
        errs = margins.select(
            F.col(id_col),
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.col("m").cast("double"))))
                - F.col("y")
            )
            .cast("decimal(18,9)")
            .alias("err"),
        )
        grad = (
            mat.join(errs, id_col)
            .groupBy("tok")
            .agg(F.sum(F.col("err") * F.col("c")).alias("se"))
        )
        w = (
            w.join(grad, "tok", "left")
            .select(
                "tok",
                (
                    F.col("w").cast("double")
                    - F.lit(lr)
                    * (
                        F.coalesce(F.col("se"), F.lit(0)).cast("double")
                        / F.lit(float(n_docs))
                        + F.lit(l2) * F.col("w").cast("double")
                    )
                )
                .cast("decimal(18,9)")
                .alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    return w


def logreg_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Score -> (id, margin, prob, predicted). The decision compares
    the EXACT decimal margin to the threshold's logit (0 for 0.5), so
    the predicted set is oracle-reproducible; prob is the rounded
    display value."""
    import math

    logit = (
        0.0 if threshold == 0.5
        else math.log(threshold / (1.0 - threshold))
    )
    mat = _doc_tokens(df, text_col, id_col)
    margins = (
        mat.join(F.broadcast(weights), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.coalesce(F.col("w"), F.lit(0).cast("decimal(18,9)"))
                * F.col("c")
            ).alias("m")
        )
    )
    return margins.select(
        F.col(id_col),
        F.round(F.col("m").cast("double"), 6).alias("margin"),
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("m").cast("double")))),
            6,
        ).alias("prob"),
        (F.col("m") > F.lit(logit)).alias("predicted"),
    )


def logreg_evaluate(
    df: DataFrame,
    weights: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Held-out confusion cells -> (actual, predicted, n)."""
    pred = logreg_score(df, weights, text_col, id_col)
    joined = pred.join(
        df.select(
            F.col(id_col), F.col(label_col).cast("int").alias("actual")
        ),
        id_col,
    )
    return joined.groupBy(
        "actual", F.col("predicted").cast("int").alias("predicted")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
