"""Mixture sampling, vocabulary build, int8 quantization."""

import pytest
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.vectors import quantize, quantize_scale
from econdatapipeline_spark.operators.sampling import mixture_sample, vocab_topk


def test_mixture_sample_extremes_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(200)],
        "doc_id long, source string",
    )
    out = mixture_sample(df, {"keep": 1.0, "drop": 0.0})
    rows = out.collect()
    assert {r["source"] for r in rows} == {"keep"}
    assert len(rows) == 100  # weight 1.0 keeps every row
    # deterministic: second run identical row set
    again = mixture_sample(df, {"keep": 1.0, "drop": 0.0}).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in again)


def test_mixture_sample_fraction_approx(spark):
    df = spark.createDataFrame([(i, "s") for i in range(2000)], "doc_id long, source string")
    kept = mixture_sample(df, {"s": 0.3}).count()
    assert 0.25 < kept / 2000 < 0.35  # md5 buckets are uniform-ish


def test_mixture_sample_default_weight_and_validation(spark):
    df = spark.createDataFrame([(1, "unknown")], "doc_id long, source string")
    assert mixture_sample(df, {"x": 0.5}, default_weight=1.0).count() == 1
    assert mixture_sample(df, {"x": 0.5}).count() == 0
    with pytest.raises(ValueError):
        mixture_sample(df, {"x": 1.5})


def test_vocab_topk_order_and_min_count(spark):
    df = spark.createDataFrame(
        [(1, "a b b c c"), (2, "b c z")], "doc_id long, text string"
    )
    out = vocab_topk(df, k=10).collect()
    assert [(r["token"], r["n_docs"], r["n_occurrences"]) for r in out] == [
        ("b", 2, 3), ("c", 2, 3), ("a", 1, 1), ("z", 1, 1),
    ]
    assert [r["token"] for r in vocab_topk(df, k=10, min_count=2).collect()] == ["b", "c"]


def test_quantize_known_values(spark):
    df = spark.createDataFrame([(1, [127.0, -63.5, 0.0, 1.0])], "vec_id long, v array<double>")
    out = df.select(
        quantize_scale(F.col("v")).alias("s"),
        quantize(F.col("v"), quantize_scale(F.col("v"))).alias("q"),
    ).collect()[0]
    assert out["s"] == 1.0
    # floor(x + 0.5): -63.5 -> floor(-63.0) = -63 (round half toward +inf)
    assert out["q"] == [127, -63, 0, 1]


def test_stratified_sample_fraction_extremes_and_determinism(spark):
    from econdatapipeline_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(100)],
        "doc_id long, lang string",
    )
    out = stratified_sample(df, {"en": 0.0, "de": 1.0}, strata_col="lang")
    rows = out.collect()
    assert all(r["lang"] == "de" for r in rows) and len(rows) == 50
    # deterministic: identical result set on rerun
    again = stratified_sample(df, {"en": 0.0, "de": 1.0}, strata_col="lang").collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in again)
    # mid fraction keeps roughly the asked share of the stratum
    mid = stratified_sample(df, {"en": 0.5}, strata_col="lang").count()
    assert 10 <= mid <= 40


def test_stratified_sample_rejects_bad_fraction(spark):
    import pytest
    from econdatapipeline_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        stratified_sample(df, {"en": 1.5})


def test_weighted_sample_proportionality_and_clamp(spark):
    from econdatapipeline_spark.operators.sampling import weighted_sample

    # weights 1 and 9 around ref 5: light rows kept ~ f*1/5, heavy ~ f*9/5
    df = spark.createDataFrame(
        [(i, 1.0 if i < 2000 else 9.0) for i in range(4000)],
        "doc_id long, w double",
    )
    out = weighted_sample(df, "w", target_fraction=0.5, ref_weight=5.0)
    rows = out.collect()
    light = sum(1 for r in rows if r["w"] == 1.0)
    heavy = sum(1 for r in rows if r["w"] == 9.0)
    assert 0.05 < light / 2000 < 0.15  # p = 0.1
    assert 0.85 < heavy / 2000 <= 1.0  # p = 0.9
    # clamp: weight so large p saturates at 1.0 -> every row kept
    big = spark.createDataFrame([(i, 100.0) for i in range(50)], "doc_id long, w double")
    assert weighted_sample(big, "w", 0.5, ref_weight=5.0).count() == 50
    # deterministic across runs
    again = weighted_sample(df, "w", 0.5, ref_weight=5.0).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in again)


def test_weighted_sample_validation(spark):
    from econdatapipeline_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(1, 2.0)], "doc_id long, w double")
    with pytest.raises(ValueError):
        weighted_sample(df, "w", 1.5, ref_weight=1.0)
    with pytest.raises(ValueError):
        weighted_sample(df, "w", 0.5, ref_weight=0.0)


def test_cluster_split_no_leakage(spark):
    from econdatapipeline_spark.operators.dedup import star_components
    from econdatapipeline_spark.operators.sampling import cluster_split

    # chain 0-1-2, pair 10-11, singletons 20..29
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 10, 11] + list(range(20, 30))], "doc_id long"
    )
    labels = star_components(pairs)
    out = cluster_split(docs, labels, test_fraction=0.5).collect()
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    # the leakage invariant: every cluster lands entirely on ONE side
    assert all(len(sides) == 1 for sides in by_cluster.values())
    # chain members share cluster 0; pair shares cluster 10
    c = {r["doc_id"]: r["cluster_id"] for r in out}
    assert c[0] == c[1] == c[2] == 0 and c[10] == c[11] == 10
    assert all(c[i] == i for i in range(20, 30))
    # fraction 0 -> everything train; fraction 1 -> everything test
    all_train = cluster_split(docs, labels, test_fraction=0.0).collect()
    assert {r["split"] for r in all_train} == {"train"}
    all_test = cluster_split(docs, labels, test_fraction=1.0).collect()
    assert {r["split"] for r in all_test} == {"test"}


def test_corpus_shuffle_is_a_permutation_and_deterministic(spark):
    from econdatapipeline_spark.operators.sampling import corpus_shuffle

    df = spark.createDataFrame([(i, "s") for i in range(40)], "doc_id long, source string")
    out = corpus_shuffle(df, n_shards=4).collect()
    assert sorted(r["global_pos"] for r in out) == list(range(1, 41))
    # equal shards, contiguous in global order
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["global_pos"])
    assert {len(v) for v in by_shard.values()} == {10}
    for shard, poss in by_shard.items():
        poss.sort()
        assert poss == list(range(min(poss), min(poss) + 10))
    # shard_pos is 1..n within each shard following global order
    for r in out:
        assert r["shard_pos"] == r["global_pos"] - (r["shard_id"] - 1) * 10
    # deterministic across re-runs; different seed -> different permutation
    again = {r["doc_id"]: r["global_pos"] for r in corpus_shuffle(df, 4).collect()}
    assert again == {r["doc_id"]: r["global_pos"] for r in out}
    other = {r["doc_id"]: r["global_pos"] for r in corpus_shuffle(df, 4, seed="x").collect()}
    assert other != again


def test_domain_cap_keeps_topn_per_domain(spark):
    from econdatapipeline_spark.operators.sampling import domain_cap

    rows = [(i, "big", 100 + i) for i in range(10)] + [(100, "small", 5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars int")
    out = domain_cap(df, max_per_domain=3).collect()
    kept = {r["source"]: sorted(r2["doc_id"] for r2 in out if r2["source"] == r["source"]) for r in out}
    assert kept["big"] == [7, 8, 9]  # highest n_chars win
    assert kept["small"] == [100]
    assert all(1 <= r["domain_rank"] <= 3 for r in out)


def test_kfold_assign_partition_and_determinism(spark):
    from econdatapipeline_spark.operators.sampling import kfold_assign

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = kfold_assign(df, k=5).collect()
    folds = {r["doc_id"]: r["fold"] for r in out}
    assert set(folds.values()) <= set(range(5))
    # every fold non-trivially populated on 200 uniform ids
    from collections import Counter

    sizes = Counter(folds.values())
    assert len(sizes) == 5 and min(sizes.values()) > 10
    # deterministic; new seed re-deals
    again = {r["doc_id"]: r["fold"] for r in kfold_assign(df, k=5).collect()}
    assert again == folds
    other = {r["doc_id"]: r["fold"] for r in kfold_assign(df, 5, seed="z").collect()}
    assert other != folds

    import pytest

    with pytest.raises(ValueError):
        kfold_assign(df, k=1)


def test_negative_sample_shape_and_no_self(spark):
    from econdatapipeline_spark.operators.sampling import negative_sample

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    out = negative_sample(df, k=3, n_buckets=16).collect()
    by_anchor: dict = {}
    for r in out:
        assert r["neg_id"] != r["anchor_id"]
        by_anchor.setdefault(r["anchor_id"], set()).add(r["neg_rank"])
    # each anchor gets at most k negatives, ranks within 1..k
    assert all(ranks <= {1, 2, 3} for ranks in by_anchor.values())
    # dense ring: nearly every anchor gets all k
    assert sum(len(v) == 3 for v in by_anchor.values()) >= 95
    # deterministic
    again = sorted((r["anchor_id"], r["neg_rank"], r["neg_id"]) for r in
                   negative_sample(df, k=3, n_buckets=16).collect())
    assert again == sorted((r["anchor_id"], r["neg_rank"], r["neg_id"]) for r in out)


def test_negative_sample_odd_ring_still_leaves_own_bucket(spark):
    """Regression: on a non-power-of-two ring the stride must stay
    coprime — k=1 on 63 buckets previously probed the anchor's OWN
    bucket for every row."""
    from econdatapipeline_spark.operators.sampling import negative_sample

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    out = negative_sample(df, k=1, n_buckets=63).collect()
    assert len(out) > 250  # nearly every anchor got a negative
    assert all(r["neg_id"] != r["anchor_id"] for r in out)
    # negatives are not simply the anchor's own-bucket representative:
    # many distinct (anchor bucket -> neg) mappings must appear
    assert len({r["neg_id"] for r in out}) > 20


def test_negative_sample_rejects_k_not_below_ring(spark):
    from econdatapipeline_spark.operators.sampling import negative_sample

    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    with pytest.raises(ValueError, match="k must be < n_buckets"):
        negative_sample(df, k=4, n_buckets=4)
    # one below the ring size still yields k distinct negatives per anchor
    out = negative_sample(df, k=3, n_buckets=4).collect()
    per_anchor = {}
    for r in out:
        per_anchor.setdefault(r["anchor_id"], set()).add(r["neg_id"])
    assert all(len(v) <= 3 for v in per_anchor.values())


def test_priority_sample_exact_k_weighted_and_deterministic(spark):
    from econdatapipeline_spark.operators.sampling import priority_sample

    rows = [(i, 1000.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = priority_sample(df, k=100, weight_col="w")
    got = [r["doc_id"] for r in out.collect()]
    assert len(got) == 100
    # heavy rows (weight 1000, 5% of ids) must dominate the sample
    heavy = sum(1 for i in got if i < 50)
    assert heavy >= 40  # nearly all 50 heavy rows selected
    # deterministic across runs
    again = [r["doc_id"] for r in priority_sample(df, k=100, weight_col="w").collect()]
    assert sorted(got) == sorted(again)
    # non-positive weights are excluded entirely
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 1.0)],
                                "doc_id long, w double")
    assert [r["doc_id"] for r in priority_sample(df2, 5, "w").collect()] == [3]
    with pytest.raises(ValueError, match="k must be"):
        priority_sample(df, 0, "w")


def test_stratified_priority_sample_k_per_group(spark):
    from econdatapipeline_spark.operators.sampling import (
        stratified_priority_sample,
    )

    rows = [(i, "big", 10.0) for i in range(100)] + [
        (1000 + i, "small", 5.0) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")
    out = stratified_priority_sample(df, k_per_group=10, weight_col="w",
                                     group_col="source").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    assert len(by_group["big"]) == 10          # exactly k
    assert len(by_group["small"]) == 3         # undersized group keeps all
    assert {r["rank"] for r in by_group["big"]} == set(range(1, 11))
    # deterministic
    again = stratified_priority_sample(df, 10, "w", "source").collect()
    assert sorted((r["doc_id"]) for r in out) == sorted(r["doc_id"] for r in again)
    with pytest.raises(ValueError, match="k_per_group"):
        stratified_priority_sample(df, 0, "w")


def test_temperature_mixture_rebalances_and_validates(spark):
    from econdatapipeline_spark.operators.sampling import temperature_mixture

    rows = [(i, "big") for i in range(2000)] + [
        (10_000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture(df, alpha=0.5, target_fraction=0.5).collect()
    kept = {}
    for r in out:
        kept[r["source"]] = kept.get(r["source"], 0) + 1
    # alpha<1: the small source keeps a HIGHER fraction than the big one
    assert kept["small"] / 100 > kept["big"] / 2000
    # small source rate: 0.5 * (100/2100)^-0.5 ~ 2.29 -> clamped to 1.0
    assert kept["small"] == 100
    # alpha=1 degenerates to uniform target_fraction
    out1 = temperature_mixture(df, alpha=1.0, target_fraction=0.5).count()
    assert 0.4 < out1 / 2100 < 0.6
    # deterministic
    again = temperature_mixture(df, alpha=0.5, target_fraction=0.5).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mixture(df, alpha=-1.0)
    with pytest.raises(ValueError, match="target_fraction"):
        temperature_mixture(df, alpha=0.5, target_fraction=1.5)


def test_waterfill_budget_hand_values(spark):
    from econdatapipeline_spark.operators.sampling import waterfill_budget

    # supplies: a=10, b=40, c=100; budget 80 -> a fully funded (10),
    # remaining 70 over {b, c}: base 35 each (b capped at 35 < 40)
    rows = [("a", 10), ("b", 40), ("c", 100)]
    df = spark.createDataFrame(rows, "src string, tok long")
    out = {r["src"]: r for r in waterfill_budget(df, "src", "tok", 80).collect()}
    assert out["a"]["allocated"] == 10 and out["a"]["capped"] == 0
    assert out["b"]["allocated"] == 35 and out["b"]["capped"] == 1
    assert out["c"]["allocated"] == 35 and out["c"]["capped"] == 1
    assert sum(r["allocated"] for r in out.values()) == 80


def test_waterfill_budget_remainder_and_edges(spark):
    from econdatapipeline_spark.operators.sampling import waterfill_budget

    # budget 7 over supplies 5,5,5: base 2, remainder 1 -> first in
    # (supply, group) order gets the extra unit
    rows = [("x", 5), ("y", 5), ("z", 5)]
    df = spark.createDataFrame(rows, "src string, tok long")
    out = {r["src"]: r["allocated"] for r in waterfill_budget(df, "src", "tok", 7).collect()}
    assert out == {"x": 3, "y": 2, "z": 2}
    # budget >= total supply: everyone fully funded, nothing capped
    full = waterfill_budget(df, "src", "tok", 100).collect()
    assert all(r["allocated"] == r["supply"] and r["capped"] == 0 for r in full)
    # zero budget: all capped at 0
    zero = waterfill_budget(df, "src", "tok", 0).collect()
    assert all(r["allocated"] == 0 for r in zero)
    import pytest
    with pytest.raises(ValueError):
        waterfill_budget(df, "src", "tok", -1)
