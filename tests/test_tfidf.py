"""TF-IDF term weighting (operators/tfidf.py)."""

from __future__ import annotations

import math

from econdatapipeline_spark.operators.tfidf import tfidf_terms, top_terms_per_doc


def test_tfidf_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {
        (r["doc_id"], r["token"]): (r["tf"], r["df"], r["tfidf"])
        for r in tfidf_terms(df).collect()
    }
    idf_unique = math.log(3 / 2) + 1      # df=1, N=2
    idf_common = math.log(3 / 3) + 1      # df=2, N=2
    assert out[(1, "a")] == (2, 1, round(2 * idf_unique, 6))
    assert out[(1, "b")] == (1, 2, round(1 * idf_common, 6))
    assert out[(2, "c")] == (1, 1, round(1 * idf_unique, 6))


def test_top_terms_rank_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "x y")], "doc_id long, text string"
    )
    rows = top_terms_per_doc(df, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["token"]))
    assert sorted(by_doc[1]) == [(1, "a"), (2, "b")]
    # x and y tie on tfidf -> lexicographic tiebreak
    assert sorted(by_doc[2]) == [(1, "x"), (2, "y")]
