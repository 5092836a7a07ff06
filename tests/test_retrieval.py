"""Hybrid retrieval (BM25 + cosine, RRF) tests on sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from econdatapipeline_spark.operators.retrieval import hybrid_search, rrf_fuse

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_rrf_fuse_math(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id int, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id int, rank int")
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10).collect()}
    # doc 2 is in both lists: 1/62 + 1/61
    assert abs(out[2]["rrf"] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert out[2]["n_lists_hit"] == 2
    # docs 1 and 3 appear once; doc 1 (rank 1) beats doc 3 (rank 2)
    assert abs(out[1]["rrf"] - round(1 / 61, 6)) < 1e-9
    assert abs(out[3]["rrf"] - round(1 / 62, 6)) < 1e-9
    assert out[2]["rrf"] > out[1]["rrf"] > out[3]["rrf"]


def test_rrf_fuse_empty_raises():
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_hybrid_search_shape_and_bounds(spark, docs, emb):
    out = hybrid_search(
        docs, emb, ["spark", "shuffle"], query_vec_id=0, k=10, depth=20
    ).collect()
    assert 0 < len(out) <= 10
    # sorted by rrf desc with id tiebreak
    scores = [(r["rrf"], -r["doc_id"]) for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        assert r["lex_rank"] is None or 1 <= r["lex_rank"] <= 20
        assert r["sem_rank"] is None or 1 <= r["sem_rank"] <= 20
        assert r["lex_rank"] is not None or r["sem_rank"] is not None


def test_hybrid_both_lists_beat_single(spark, docs, emb):
    """A doc present in BOTH candidate lists at rank r scores strictly
    more than any doc present in one list at the same rank."""
    out = hybrid_search(
        docs, emb, ["spark", "shuffle", "broadcast"], query_vec_id=0, k=50, depth=50
    ).collect()
    both = [r for r in out if r["lex_rank"] is not None and r["sem_rank"] is not None]
    single = [r for r in out if (r["lex_rank"] is None) != (r["sem_rank"] is None)]
    if both and single:
        # best dual-list doc must beat the best single-list doc when
        # its worse rank is no worse than the single doc's rank
        b = max(both, key=lambda r: r["rrf"])
        s = max(single, key=lambda r: r["rrf"])
        worse = max(b["lex_rank"], b["sem_rank"])
        srank = s["lex_rank"] if s["lex_rank"] is not None else s["sem_rank"]
        if worse <= srank:
            assert b["rrf"] > s["rrf"]


def test_hybrid_deterministic(spark, docs, emb):
    a = hybrid_search(docs, emb, ["spark"], query_vec_id=1, k=5).collect()
    b = hybrid_search(docs, emb, ["spark"], query_vec_id=1, k=5).collect()
    assert a == b


def test_rbo_identity_disjoint_and_partial(spark):
    from econdatapipeline_spark.operators.retrieval import rbo, rbo_weights
    import math

    def ranked(items):
        return spark.createDataFrame(
            [(it, i + 1) for i, it in enumerate(items)], "doc_id string, rank int"
        )

    # identical lists: RBO@k = (1-p) * sum p^(d-1) (X_d = d)
    a = ranked(["x", "y", "z"])
    out = rbo(a, ranked(["x", "y", "z"]), k=3, p=0.5).collect()[0]
    assert out["overlap_k"] == 3 and math.isclose(out["rbo"], 0.875, abs_tol=1e-6)

    # disjoint lists: one row, zero overlap, rbo 0
    out = rbo(a, ranked(["u", "v", "w"]), k=3, p=0.5).collect()[0]
    assert out["overlap_k"] == 0 and out["rbo"] == 0.0

    # partial: x at m=1, z at m=max(3,2)=3 -> w(1) + w(3)
    w = rbo_weights(3, 0.5)
    out = rbo(a, ranked(["x", "z", "w"]), k=3, p=0.5).collect()[0]
    assert out["overlap_k"] == 2
    assert math.isclose(out["rbo"], w[1] + w[3], abs_tol=1e-6)


def test_rbo_grouped_and_validation(spark):
    from econdatapipeline_spark.operators.retrieval import rbo
    import pytest

    a = spark.createDataFrame(
        [("q1", "x", 1), ("q1", "y", 2), ("q2", "u", 1)],
        "qid string, doc_id string, rank int",
    )
    b = spark.createDataFrame(
        [("q1", "x", 1), ("q1", "y", 2), ("q2", "z", 1)],
        "qid string, doc_id string, rank int",
    )
    out = {r["qid"]: r for r in rbo(a, b, k=2, p=0.5, query_col="qid").collect()}
    assert out["q1"]["overlap_k"] == 2 and out["q1"]["rbo"] > 0.5
    # q2's two lists share NOTHING — the highest-churn case the metric
    # exists to flag must be PRESENT with rbo exactly 0, not silently
    # dropped by the inner join
    assert out["q2"]["overlap_k"] == 0 and out["q2"]["rbo"] == 0.0

    # a query present in only ONE input still appears in the universe
    c = spark.createDataFrame(
        [("q1", "x", 1), ("q3", "m", 1)], "qid string, doc_id string, rank int"
    )
    out2 = {r["qid"]: r for r in rbo(a, c, k=2, p=0.5, query_col="qid").collect()}
    assert set(out2) == {"q1", "q2", "q3"}
    assert out2["q3"]["overlap_k"] == 0 and out2["q3"]["rbo"] == 0.0

    with pytest.raises(ValueError):
        rbo(a, b, k=0)
    with pytest.raises(ValueError):
        rbo(a, b, p=1.0)
