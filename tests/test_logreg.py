"""Distributed logistic regression tests (operators/logreg)."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.operators.logreg import (
    BIAS,
    logreg_evaluate,
    logreg_score,
    logreg_train,
)

SCHEMA = "doc_id int, text string, y int"


def _separable(n=24):
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, "good clean fluent prose here", 1))
        else:
            rows.append((i, "spam junk noise garbage words", 0))
    return rows


def test_learns_separable_vocab(spark):
    df = spark.createDataFrame(_separable(), SCHEMA)
    train = df.filter("doc_id < 16")
    test = df.filter("doc_id >= 16")
    w = logreg_train(train, "y", iters=8, lr=1.0)
    cells = {
        (r["actual"], r["predicted"]): r["n"]
        for r in logreg_evaluate(test, w, "y").collect()
    }
    assert cells.get((1, 1), 0) == 4
    assert cells.get((0, 0), 0) == 4
    assert (1, 0) not in cells and (0, 1) not in cells


def test_weights_point_the_right_way(spark):
    df = spark.createDataFrame(_separable(), SCHEMA)
    w = {r["tok"]: float(r["w"]) for r in logreg_train(df, "y", iters=5).collect()}
    assert w["good"] > 0 > w["spam"]
    assert BIAS in w


def test_scores_monotone_in_evidence(spark):
    df = spark.createDataFrame(_separable(), SCHEMA)
    w = logreg_train(df, "y", iters=5)
    probe = spark.createDataFrame(
        [(100, "good good good", 1), (101, "good spam", 1),
         (102, "spam spam spam", 0)],
        SCHEMA,
    )
    out = {r["doc_id"]: r for r in logreg_score(probe, w).collect()}
    assert out[100]["prob"] > out[101]["prob"] > out[102]["prob"]
    assert out[100]["predicted"] and not out[102]["predicted"]


def test_training_deterministic_across_layouts(spark):
    df = spark.createDataFrame(_separable(), SCHEMA)
    w1 = sorted(map(tuple, logreg_train(df, "y", iters=3).collect()))
    w2 = sorted(
        map(tuple, logreg_train(df.repartition(7), "y", iters=3).collect())
    )
    assert w1 == w2  # exact decimal equality under any partitioning


def test_validates_iters(spark):
    df = spark.createDataFrame(_separable(4), SCHEMA)
    with pytest.raises(ValueError):
        logreg_train(df, "y", iters=0)
