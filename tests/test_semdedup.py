"""SemDeDup semantic-dedup tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from econdatapipeline_spark.operators.semdedup import cluster_centroids, semantic_dedup

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id int, embedding array<double>",
    )


def test_identical_vectors_keep_exactly_one(spark):
    df = _mk(spark, [(i, [1.0, 0.0, 2.0, 0.5]) for i in range(4)])
    out = semantic_dedup(df, tau=0.99, dims=(0, 1)).collect()
    kept = sorted(r["id"] for r in out if r["kept"])
    assert kept == [0]  # ties broken by id ascending
    assert sorted(r["id"] for r in out) == [0, 1, 2, 3]


def test_orthogonal_vectors_all_kept(spark):
    df = _mk(
        spark,
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])],
    )
    out = semantic_dedup(df, tau=0.9, dims=(0,)).collect()
    assert all(r["kept"] for r in out)


def test_keeps_edge_example(spark):
    """Among a near-dup pair, the member FARTHER from the centroid
    survives (the SemDeDup keep rule)."""
    # cluster of three: two near-identical, one distinct; all same sign
    df = _mk(
        spark,
        [
            (0, [1.0, 1.0, 0.0]),
            (1, [1.0, 0.98, 0.02]),
            (2, [1.0, 0.1, 0.9]),
        ],
    )
    out = {r["id"]: r for r in semantic_dedup(df, tau=0.99, dims=(0,)).collect()}
    assert out[2]["kept"]  # distinct doc untouched
    survivors = [i for i in (0, 1) if out[i]["kept"]]
    assert len(survivors) == 1
    # the survivor is the one with lower centroid_cos
    s = survivors[0]
    other = 1 - s
    assert out[s]["centroid_cos"] <= out[other]["centroid_cos"]


def test_dropped_docs_are_dominated(spark, emb):
    out = semantic_dedup(emb, tau=0.2)
    rows = out.collect()
    assert len(rows) == emb.count()
    dropped = [r for r in rows if not r["kept"]]
    assert dropped, "sf0.001 embeddings should contain semantic dups at tau=0.2"
    # every cluster retains at least one member
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r["kept"])
    assert all(any(k) for k in by_cluster.values())


def test_external_clusters_ivf(spark, emb):
    """The paper-faithful path: k-means cells from the IVF index."""
    from econdatapipeline_spark.operators.ivf import build_index, train_centroids

    cents = train_centroids(emb, nlist=4, iterations=2)
    idx = build_index(emb, cents).select("vec_id", "cluster")
    out = semantic_dedup(emb, tau=0.2, clusters=idx)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert {r["cluster"] for r in rows} <= {0, 1, 2, 3}


def test_centroids_match_manual(spark):
    df = _mk(spark, [(0, [1.0, 3.0]), (1, [3.0, 5.0])]).withColumn(
        "cluster", F.lit("c")
    )
    c = cluster_centroids(df, "cluster", "embedding").collect()[0]
    assert c["centroid"] == [2.0, 4.0]
