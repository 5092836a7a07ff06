"""Similarity-search operator tests on sf0.001 embeddings."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from econdatapipeline_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_brute_force_topk_exact(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    out = S.brute_force_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
        cosines = [r["cos"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_brute_force_matches_numpy(spark, emb):
    import numpy as np

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    q = 0
    sims = {
        i: float(vecs[q] @ v / (np.linalg.norm(vecs[q]) * np.linalg.norm(v)))
        for i, v in vecs.items() if i != q
    }
    expected_top = max(sims, key=lambda i: (sims[i], -i))
    out = S.brute_force_topk(emb, emb.filter(F.col("vec_id") == q), k=1).collect()[0]
    assert out["neighbor_id"] == expected_top
    assert math.isclose(out["cos"], sims[expected_top], abs_tol=1e-5)


def test_lsh_topk_subset_of_bucket(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    out = S.lsh_topk(emb, queries, k=5)
    # Approximate: every returned neighbor must share the query's bucket,
    # scores must be valid cosines.
    rows = out.collect()
    assert rows, "LSH returned nothing — buckets degenerate?"
    assert all(-1.0 <= r["cos"] <= 1.0 for r in rows)


def test_embedding_near_dups_symmetric_pairs(spark, emb):
    pairs = S.embedding_near_dups(emb, threshold=0.9).collect()
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert r["cos"] >= 0.9


def test_arrow_bruteforce_matches_expression_form(spark):
    from econdatapipeline_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_arrow,
    )
    from pyspark.sql import functions as F

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = e.filter(F.col("vec_id") < 4)
    expr = brute_force_topk(e, queries, k=5).collect()
    arrow = brute_force_topk_arrow(e, queries, k=5).collect()
    assert sorted(map(tuple, expr)) == sorted(map(tuple, arrow))


def test_bruteforce_size_gate_routes_large_query_side_to_arrow(spark):
    """Adversarial query side: above max_expr_queries the gate must
    route to the Arrow/BLAS twin and still produce the exact result.

    The gate is observable in the plan: the expression path has no
    Python stage, the Arrow path carries one (MapInPandas /
    ArrowEvalPython). A 40-query side with max_expr_queries=8 must
    take the Arrow kernel; the same call with the gate disabled
    (max_expr_queries large) must not.
    """
    from econdatapipeline_spark.operators.similarity import brute_force_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = e.filter(F.col("vec_id") < 40)  # > the pinned gate below

    gated = brute_force_topk(e, queries, k=3, max_expr_queries=8)
    ungated = brute_force_topk(e, queries, k=3, max_expr_queries=1_000_000)
    gated_plan = gated._jdf.queryExecution().executedPlan().toString()
    ungated_plan = ungated._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" in gated_plan or "ArrowEval" in gated_plan
    assert "InPandas" not in ungated_plan and "ArrowEval" not in ungated_plan

    # Same answer either side of the gate (ranks identical; cos to 6dp).
    g = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in gated.collect())
    u = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in ungated.collect())
    assert g == u


def test_embedding_centroids_exact_means(spark):
    from econdatapipeline_spark.operators.similarity import embedding_centroids

    df = spark.createDataFrame(
        [("x", [1.0, 2.0]), ("x", [3.0, 6.0]), ("y", [10.0, 0.0])],
        "label string, embedding array<double>",
    )
    out = {(r["label"], r["pos"]): r["centroid"]
           for r in embedding_centroids(df).collect()}
    assert out[("x", 0)] == 2.0 and out[("x", 1)] == 4.0
    assert out[("y", 0)] == 10.0 and out[("y", 1)] == 0.0
    assert len(out) == 4


def test_random_projection_preserves_neighborhoods(spark):
    """JL property where there IS structure to preserve: clustered
    vectors (5 noisy copies per center). Exact top-4 = the cluster
    mates; the 8-dim projected top-10 must recover most of them.
    (The benchmark embeddings table is near-uniform noise — cosine
    gaps there sit below JL distortion at any useful dim, which is the
    documented honest limit, not a bug.)"""
    import math
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from econdatapipeline_spark.functions.vectors import cosine
    from econdatapipeline_spark.operators.similarity import (
        projection_signs,
        random_projection,
    )

    rng = random.Random(7)
    rows = []
    for c in range(40):
        center = [rng.gauss(0, 1) for _ in range(64)]
        for m in range(5):
            v = [x + rng.gauss(0, 0.15) for x in center]
            n = math.sqrt(sum(x * x for x in v))
            rows.append((c * 5 + m, [x / n for x in v]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    signs = projection_signs(8, 64)
    proj = random_projection(e, signs)
    first = proj.first()
    assert first["proj"] is not None and len(first["proj"]) == 8
    # determinism
    a = {r["vec_id"]: tuple(r["proj"]) for r in proj.collect()}
    b = {r["vec_id"]: tuple(r["proj"]) for r in random_projection(e, signs).collect()}
    assert a == b

    # cluster mates (true top-4) must appear in the projected top-10
    pq = proj.selectExpr("vec_id as qid", "proj as qp")
    pc = proj.selectExpr("vec_id as nid", "proj as cp")
    scored = (
        pq.crossJoin(pc)
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", cosine(F.col("qp"), F.col("cp")).alias("c"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("nid"))
    top10 = scored.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 10)
    got: dict = {}
    for r in top10.collect():
        got.setdefault(r["qid"], set()).add(r["nid"])
    hits = total = 0
    for qid in range(200):
        mates = {qid // 5 * 5 + m for m in range(5)} - {qid}
        hits += len(mates & got[qid])
        total += len(mates)
    recall = hits / total
    assert recall >= 0.8, recall  # chance at 10/199 would be ~0.05


def test_mutual_nn_kills_hubs(spark):
    from econdatapipeline_spark.operators.similarity import mutual_nn

    # a1<->b1 mutual; hub b9 is a2's and a3's top-1 but b9's own top-1
    # is a2 only -> (a2,b9) mutual, (a3,b9) NOT
    a = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.1]),
            (3, [0.0, 0.9, 0.3]),
        ],
        "vec_id long, embedding array<float>",
    )
    b = spark.createDataFrame(
        [
            (11, [0.99, 0.05, 0.0]),
            (19, [0.0, 1.0, 0.12]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {(r["a_id"], r["b_id"]) for r in mutual_nn(a, b).collect()}
    assert (1, 11) in out and (2, 19) in out
    assert (3, 19) not in out and len(out) == 2


def test_bucket_purity_signal_vs_noise(spark):
    from econdatapipeline_spark.operators.similarity import bucket_purity

    # labels follow the sign of dim 0 exactly -> every bucket pure
    import random
    rnd = random.Random(7)
    rows = []
    for i in range(80):
        v = [rnd.uniform(-1, 1) for _ in range(64)]
        rows.append((1 if v[0] > 0 else 0, v))
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    r = bucket_purity(df).first()
    assert r["n"] == 80 and r["purity"] == 1.0
    # labels independent of the vector -> purity well below 1
    rows2 = [(i % 2, v) for i, (_, v) in enumerate(rows)]
    df2 = spark.createDataFrame(rows2, "label int, embedding array<float>")
    r2 = bucket_purity(df2).first()
    assert r2["purity"] < 1.0
    assert r2["majority_correct"] < r2["n"]
