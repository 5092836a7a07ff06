"""Bigram language-model scoring tests (operators/lm)."""

from __future__ import annotations

import math

import pytest

from econdatapipeline_spark.operators.lm import lm_score, train_bigram_lm


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )


def test_self_trained_manual_math(spark):
    # corpus: two docs; bigrams: (a b) x2, (b a) x1, (b c) x1; V = 3
    df = _docs(spark, ["a b a b", "a b c"])
    out = {r["doc_id"]: r for r in lm_score(df).collect()}
    # doc0 bigrams: ab, ba, ab; ctx(a)=3, ctx(b)=2... recount:
    # doc0: (a b), (b a), (a b); doc1: (a b), (b c)
    # c2: ab=3, ba=1, bc=1; c1: a=3, b=2; V=3
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (2 + 3)
    p_bc = (1 + 1) / (2 + 3)
    x0 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    x1 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert out[0]["n_bigrams"] == 3
    assert abs(out[0]["xent"] - x0) < 1e-6
    assert abs(out[1]["xent"] - x1) < 1e-6
    assert abs(out[0]["ppl"] - math.exp(out[0]["xent"])) < 1e-5


def test_short_docs_null_score(spark):
    df = _docs(spark, ["single", "", "two words"])
    out = {r["doc_id"]: r for r in lm_score(df).collect()}
    assert out[0]["n_bigrams"] == 0 and out[0]["xent"] is None
    assert out[1]["n_bigrams"] == 0 and out[1]["ppl"] is None
    assert out[2]["n_bigrams"] == 1 and out[2]["xent"] is not None


def test_fluent_beats_shuffled(spark):
    """Docs made of corpus-frequent bigrams score lower xent than a
    doc of never-seen pairs — the quality-filter direction."""
    train = _docs(spark, ["the cat sat on the mat"] * 5)
    model = train_bigram_lm(train)
    cand = _docs(spark, ["the cat sat on the mat", "mat the on sat cat the"])
    out = {r["doc_id"]: r for r in lm_score(cand, model=model).collect()}
    assert out[0]["xent"] < out[1]["xent"]


def test_cross_corpus_unseen_floor(spark):
    """Fully out-of-vocabulary docs hit the 1/V smoothing floor."""
    train = _docs(spark, ["a b c d"])
    model = train_bigram_lm(train)
    out = lm_score(_docs(spark, ["x y z"]), model=model).collect()[0]
    v = 4
    expected = -math.log(1 / v)
    assert abs(out["xent"] - expected) < 1e-6
