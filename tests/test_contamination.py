"""Corpus-hygiene operator tests: decontamination + repetition scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from econdatapipeline_spark.operators.contamination import (
    decontaminate,
    repetition_scores,
)


@pytest.fixture()
def train(spark):
    return spark.createDataFrame(
        [
            # shares the 4-gram "alpha beta gamma delta" with the holdout
            (1, "alpha beta gamma delta epsilon zeta"),
            # clean: no 4-gram overlap
            (2, "one two three four five six seven"),
            # shares two holdout 4-grams ("p q r s", "q r s t")
            (3, "p q r s t"),
            # shorter than n: collapses to a whole-text gram, no overlap
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture()
def holdout(spark):
    return spark.createDataFrame(
        [
            (100, "alpha beta gamma delta"),
            (101, "o p q r s t u"),
        ],
        "doc_id long, text string",
    )


def test_decontaminate_flags_overlap(train, holdout):
    out = decontaminate(train, holdout, n=4)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 3}
    # doc 1: 3 distinct 4-grams, 1 contaminated
    assert rows[1]["n_grams"] == 3 and rows[1]["hit_grams"] == 1
    assert rows[1]["contamination"] == pytest.approx(1 / 3, abs=1e-6)
    # doc 3: 2 distinct 4-grams, both contaminated
    assert rows[3]["hit_grams"] == 2
    assert rows[3]["contamination"] == pytest.approx(1.0)


def test_decontaminate_clean_holdout_returns_empty(spark, train):
    clean = spark.createDataFrame(
        [(200, "completely disjoint vocabulary here nothing shared")],
        "doc_id long, text string",
    )
    assert decontaminate(train, clean, n=4).count() == 0


def test_repetition_scores(spark):
    df = spark.createDataFrame(
        [
            # "a b" x3 within "a b a b a b": bigrams [a b, b a, a b, b a, a b]
            (1, "a b a b a b"),
            # all-distinct tokens: zero repetition
            (2, "one two three four five"),
            # single token: collapses to whole-text gram, scores 0
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    # doc 1: 5 bigram occurrences, 2 distinct -> dup frac 0.6; top "a b" 3/5
    assert rows[1]["dup_bigram_frac"] == pytest.approx(0.6)
    assert rows[1]["top_bigram_frac"] == pytest.approx(0.6)
    # 4 trigrams: [a b a, b a b, a b a, b a b] -> 2 distinct -> 0.5
    assert rows[1]["dup_trigram_frac"] == pytest.approx(0.5)
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[2]["top_bigram_frac"] == pytest.approx(0.25)
    assert rows[3]["dup_bigram_frac"] == 0.0
    assert rows[3]["top_bigram_frac"] == pytest.approx(1.0)


def test_token_entropy_known_values(spark):
    import math

    from econdatapipeline_spark.operators.contamination import token_entropy

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # one token: H = 0
            (2, "a b c d"),          # uniform: H = ln 4
            (3, "a a b b"),          # two tokens evenly: H = ln 2
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["n_distinct"] == 1
    assert abs(out[2]["entropy"] - math.log(4)) < 1e-5
    assert abs(out[3]["entropy"] - math.log(2)) < 1e-5
    assert out[3]["n_tokens"] == 4 and out[3]["n_distinct"] == 2


def test_semantic_decontaminate_flags_self(spark):
    from econdatapipeline_spark.operators.contamination import (
        semantic_decontaminate,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bench = emb.filter("vec_id % 10 = 0")
    # a corpus CONTAINING benchmark vectors must flag them (cos = 1)
    out = {r["id"]: r["contaminated"] for r in
           semantic_decontaminate(emb, bench, tau=0.99).collect()}
    assert all(out[i] for i in out if i % 10 == 0)


def test_semantic_decontaminate_threshold_monotone(spark):
    from econdatapipeline_spark.operators.contamination import (
        semantic_decontaminate,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bench = emb.filter("vec_id % 10 = 0")
    corpus = emb.filter("vec_id % 10 != 0")
    loose = semantic_decontaminate(corpus, bench, tau=0.1)
    tight = semantic_decontaminate(corpus, bench, tau=0.9)
    n_loose = loose.filter("contaminated").count()
    n_tight = tight.filter("contaminated").count()
    assert n_tight <= n_loose
    assert loose.count() == corpus.count()
