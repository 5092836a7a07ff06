"""Batched property tests for the round-4 operator families.

Same discipline as test_property_batch.py: seeded random corpora,
one Spark job per property, independent pure-Python references.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F


def _rand_docs(spark, n, vocab, min_len=0, max_len=30, seed=13):
    rng = random.Random(seed)
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(min_len, max_len))))
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_coverage_invariants(spark):
    """dup_tokens <= n_tokens always; symmetric corpora flag symmetric
    coverage; coverage is a union (never exceeds the token span)."""
    from econdatapipeline_spark.operators.spans import substring_dup_stats

    rows, df = _rand_docs(spark, 120, ["a", "b", "c", "d"], 1, 25)
    out = substring_dup_stats(df, k=4).collect()
    assert len(out) == 120
    for r in out:
        assert 0 <= r["dup_tokens"] <= r["n_tokens"]
        assert 0.0 <= r["dup_frac"] <= 1.0
        assert r["flagged"] == (r["dup_tokens"] / r["n_tokens"] >= 0.3)


def test_lm_score_python_reference(spark):
    """Engine xent equals an independent Python bigram-LM evaluation."""
    from econdatapipeline_spark.operators.lm import lm_score

    rows, df = _rand_docs(spark, 60, ["x", "y", "z", "w"], 0, 12, seed=7)
    got = {r["doc_id"]: r for r in lm_score(df).collect()}

    from collections import Counter
    c2, c1, vocab = Counter(), Counter(), set()
    toks = {i: t.strip().lower().split() if t.strip() else [""] for i, t in rows}
    for i, ts in toks.items():
        vocab.update(w for w in ts if w)
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    for i, ts in toks.items():
        bgs = list(zip(ts, ts[1:]))
        if not bgs:
            assert got[i]["xent"] is None and got[i]["n_bigrams"] == 0
            continue
        xent = -sum(
            math.log((c2[bg] + 1.0) / (c1[bg[0]] + v)) for bg in bgs
        ) / len(bgs)
        assert got[i]["n_bigrams"] == len(bgs)
        assert abs(got[i]["xent"] - xent) < 1e-6, i


def test_rrf_rank_monotone(spark):
    """For single-list inputs RRF preserves rank order exactly."""
    from econdatapipeline_spark.operators.retrieval import rrf_fuse

    lst = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_id int, rank int"
    )
    out = rrf_fuse([lst], k=30).collect()
    ids = [r["doc_id"] for r in out]
    assert ids == list(range(30))


def test_minhash_unbiased_on_random_pairs(spark):
    """Over many candidate pairs the estimator's signed error averages
    near zero (pairwise-independent slots are unbiased per slot)."""
    from econdatapipeline_spark.operators.dedup import minhash_estimate_error

    rng = random.Random(23)
    base = [f"w{j}" for j in range(40)]
    rows = []
    for i in range(0, 120, 2):
        shared = rng.sample(base, 25)
        rows.append((i, " ".join(shared + rng.sample(base, 8))))
        rows.append((i + 1, " ".join(shared + rng.sample(base, 8))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_estimate_error(df, num_hashes=16, bands=4).collect()
    assert len(out) >= 20
    signed = [r["est_jaccard"] - r["exact_jaccard"] for r in out]
    assert abs(sum(signed) / len(signed)) < 0.08
    assert sum(r["abs_err"] for r in out) / len(out) < 0.15


def test_roc_auc_is_rank_statistic(spark):
    """AUC is invariant under any strictly monotone score transform."""
    from econdatapipeline_spark.operators.evaluation import roc_auc

    rng = random.Random(3)
    rows = [(rng.random() < 0.5, rng.random()) for _ in range(150)]
    df1 = spark.createDataFrame(rows, "label boolean, score double")
    df2 = spark.createDataFrame(
        [(l, s * s * 10 + 3) for l, s in rows], "label boolean, score double"
    )
    a1 = roc_auc(df1).collect()[0]["auc"]
    a2 = roc_auc(df2).collect()[0]["auc"]
    assert a1 == a2


def test_spearman_bounds_and_symmetry(spark):
    from econdatapipeline_spark.operators.stats import spearman_corr

    rng = random.Random(17)
    rows = [(round(rng.random(), 2), round(rng.random(), 2)) for _ in range(100)]
    df = spark.createDataFrame(rows, "a double, b double")
    r_ab = spearman_corr(df, "a", "b").collect()[0]["rho"]
    r_ba = spearman_corr(df, "b", "a").collect()[0]["rho"]
    assert -1.0 <= r_ab <= 1.0
    assert r_ab == r_ba


def test_ks_bounds_and_sensitivity_order(spark):
    from econdatapipeline_spark.operators.stats import ks_test

    rng = random.Random(29)
    base = [("a", rng.gauss(0, 1)) for _ in range(200)]
    small = [("b", rng.gauss(0.3, 1)) for _ in range(200)]
    big = [("c", rng.gauss(3.0, 1)) for _ in range(200)]
    df = spark.createDataFrame(base + small + big, "g string, v double")
    d_small = ks_test(df, "g", "v", "a", "b").collect()[0]["d_stat"]
    d_big = ks_test(df, "g", "v", "a", "c").collect()[0]["d_stat"]
    assert 0.0 <= d_small <= 1.0
    assert d_big > d_small  # bigger shift, bigger statistic
