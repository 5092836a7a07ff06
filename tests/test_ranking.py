"""Ranking-metric tests (operators/ranking.ranking_metrics)."""

from __future__ import annotations

import math

from econdatapipeline_spark.operators.ranking import ranking_metrics


def _frames(spark):
    # query 1: perfect ranking of its two relevant docs (rel 2 then 1)
    # query 2: the single relevant doc buried at rank 3
    # query 3: judged but nothing relevant retrieved
    run = spark.createDataFrame(
        [
            (1, 10, 1), (1, 11, 2), (1, 12, 3),
            (2, 20, 1), (2, 21, 2), (2, 10, 3),
            (3, 30, 1), (3, 31, 2),
        ],
        "query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [
            (1, 10, 2), (1, 11, 1), (1, 99, 0),
            (2, 10, 2), (2, 98, 1),
            (3, 97, 2),
        ],
        "query_id long, doc_id long, rel int",
    )
    return run, qrels


def test_metrics_hand_computed(spark):
    run, qrels = _frames(spark)
    out = {
        r["query_id"]: r
        for r in ranking_metrics(run, qrels, k=3).collect()
    }
    # q1: run order == ideal order -> ndcg 1
    assert out[1]["ndcg"] == 1.0
    assert out[1]["mrr"] == 1.0
    assert out[1]["prec"] == round(2 / 3, 6)
    assert out[1]["recall"] == 1.0
    # q2: dcg = 3/log2(4); idcg = 3/log2(2) + 1/log2(3)
    dcg = 3 / math.log2(4)
    idcg = 3 / math.log2(2) + 1 / math.log2(3)
    assert abs(out[2]["ndcg"] - dcg / idcg) < 1e-5
    assert out[2]["mrr"] == round(1 / 3, 6)
    assert out[2]["n_rel"] == 2 and out[2]["n_hit"] == 1
    # q3: no relevant retrieved -> all zero, n_rel visible
    assert out[3]["ndcg"] == 0.0 and out[3]["mrr"] == 0.0
    assert out[3]["recall"] == 0.0 and out[3]["n_rel"] == 1


def test_unjudged_query_gets_zero_metrics(spark):
    run, qrels = _frames(spark)
    extra = run.unionByName(
        run.sparkSession.createDataFrame(
            [(9, 90, 1)], "query_id long, doc_id long, rank int"
        )
    )
    out = {r["query_id"]: r for r in ranking_metrics(extra, qrels, k=3).collect()}
    assert out[9]["ndcg"] == 0.0
    assert out[9]["recall"] == 0.0
    assert out[9]["n_rel"] == 0


def test_rank_cutoff_applies(spark):
    run, qrels = _frames(spark)
    out = {r["query_id"]: r for r in ranking_metrics(run, qrels, k=2).collect()}
    # q2's only hit is at rank 3 -> excluded at k=2
    assert out[2]["n_hit"] == 0 and out[2]["mrr"] == 0.0
