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
