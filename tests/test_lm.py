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


def test_dsir_prefers_target_like_docs(spark):
    # target corpus speaks "alpha beta"; raw corpus mixes target-like
    # and off-distribution docs — top-2 selection must pick the
    # target-like pair.
    target = _docs(spark, ["alpha beta alpha beta", "alpha beta gamma"])
    raw = spark.createDataFrame(
        [
            (0, "alpha beta alpha beta"),
            (1, "zz qq zz qq"),
            (2, "alpha beta gamma"),
            (3, "yy ww yy ww"),
        ],
        "doc_id int, text string",
    )
    from econdatapipeline_spark.operators.lm import dsir_select

    kept = dsir_select(raw, target, k=2).collect()
    assert sorted(r["doc_id"] for r in kept) == [0, 2]
    assert all(r["log_ratio"] > 0 for r in kept)


def test_dsir_short_docs_zero_ratio(spark):
    from econdatapipeline_spark.operators.lm import dsir_log_ratio

    target = _docs(spark, ["alpha beta"])
    raw = spark.createDataFrame(
        [(0, "single"), (1, "")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in dsir_log_ratio(raw, target).collect()}
    assert out[0]["n_bigrams"] == 0 and float(out[0]["log_ratio"]) == 0.0
    assert out[1]["n_bigrams"] == 0 and float(out[1]["log_ratio"]) == 0.0


def test_perplexity_buckets_balanced_and_ordered(spark):
    from econdatapipeline_spark.operators.lm import perplexity_buckets

    # 9 docs in one group: common phrasing scores lower xent than rare.
    rows = [(i, "the cat sat on the mat", "g") for i in range(6)]
    rows += [(i, "qq zz %d yy ww" % i, "g") for i in range(6, 9)]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    out = sorted(
        perplexity_buckets(df, n_buckets=3).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["n_docs"] for r in out] == [3, 3, 3]
    # tiles are contiguous in xent: max of bucket i <= min of bucket i+1
    for a, b in zip(out, out[1:]):
        assert a["max_xent"] <= b["min_xent"]
    # the rare-vocab docs land in the tail tile
    assert out[0]["mean_xent"] < out[2]["mean_xent"]


def test_perplexity_buckets_excludes_undefined(spark):
    from econdatapipeline_spark.operators.lm import perplexity_buckets

    rows = [(0, "a b a b", "g"), (1, "a b c", "g"), (2, "solo", "g")]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    out = perplexity_buckets(df, n_buckets=2).collect()
    assert sum(r["n_docs"] for r in out) == 2  # doc 2 has no bigrams


def test_loo_influence_ranks_unique_source_highest(spark):
    from econdatapipeline_spark.operators.lm import loo_source_influence

    # probe (doc_id % 2 == 0 via probe_mod=2) speaks "alpha beta";
    # source A supplies almost all the probe-distribution MASS, while
    # B and C are identical twins that each mention every word once
    # (so no source exclusively owns vocabulary — ablation moves
    # counts, not the smoothing floor; see the docstring caveat).
    # Removing A must hurt the probe far more than removing B.
    rows = [
        (0, "alpha beta alpha beta gamma", "probe_src"),
        (2, "alpha beta gamma alpha", "probe_src"),
        (1, "alpha beta alpha beta alpha beta", "A"),
        (3, "alpha beta gamma alpha beta", "A"),
        (5, "zz qq ww alpha beta gamma", "B"),
        (7, "zz qq ww alpha beta gamma", "C"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, source string")
    out = {
        r["source"]: r
        for r in loo_source_influence(df, probe_mod=2).collect()
    }
    assert set(out) == {"A", "B", "C"}
    assert out["A"]["influence"] > 0.1
    assert out["A"]["influence"] > 5 * abs(out["B"]["influence"])
    # redundant twins: ablating either leaves the other -> small,
    # SYMMETRIC effect (identical docs -> identical ablations)
    assert abs(out["B"]["influence"]) < 0.1
    assert out["B"]["influence"] == out["C"]["influence"]
    # full-model xent identical across rows (same probe, same model)
    assert len({r["xent_full"] for r in out.values()}) == 1


def test_loo_influence_validates_probe_mod(spark):
    import pytest

    from econdatapipeline_spark.operators.lm import loo_source_influence

    df = spark.createDataFrame(
        [(0, "a b", "s")], "doc_id int, text string, source string"
    )
    with pytest.raises(ValueError):
        loo_source_influence(df, probe_mod=1)


def test_oov_rate_counts_and_vocab_threshold(spark):
    from econdatapipeline_spark.operators.lm import oov_rate

    train = spark.createDataFrame(
        [(1, "a a b b c"), (2, "a b d")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(10, "a b c d e"), (11, "e e"), (12, "a a a")],
        "doc_id long, text string",
    )
    # min_count=2: vocab = {a (3x), b (3x)}; c and d are hapax-pruned
    out = {r["doc_id"]: r for r in oov_rate(train, score, min_count=2).collect()}
    assert out[10]["n_tokens"] == 5 and out[10]["n_oov"] == 3
    assert out[10]["oov_rate"] == 0.6
    assert out[11]["n_oov"] == 2 and out[11]["oov_rate"] == 1.0
    assert out[12]["n_oov"] == 0 and out[12]["oov_rate"] == 0.0


def test_oov_rate_counts_occurrences_not_types(spark):
    from econdatapipeline_spark.operators.lm import oov_rate

    train = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(10, "y y y x")], "doc_id long, text string"
    )
    row = oov_rate(train, score, min_count=1).collect()[0]
    # three OOV *occurrences* of the single OOV type
    assert row["n_tokens"] == 4 and row["n_oov"] == 3


def test_chao1_vocab_hand_values(spark):
    from econdatapipeline_spark.operators.lm import chao1_vocab

    # corpus: a a a b b c d -> N=7, V=4, F1=2 (c,d), F2=1 (b)
    # chao1 = 4 + 2*1/(2*2) = 4.5; coverage = 1 - 2/7
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c d")], "doc_id long, text string"
    )
    r = chao1_vocab(df).first()
    assert r["n_tokens"] == 7 and r["vocab"] == 4
    assert r["f1"] == 2 and r["f2"] == 1
    assert abs(r["chao1"] - 4.5) < 1e-9
    assert abs(r["coverage"] - round(1 - 2 / 7, 6)) < 1e-9


def test_chao1_vocab_exhaustive_sample_has_full_coverage(spark):
    from econdatapipeline_spark.operators.lm import chao1_vocab

    # every type seen >= 3 times: F1 = 0 -> chao1 == V, coverage == 1
    df = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y x y")], "doc_id long, text string"
    )
    r = chao1_vocab(df).first()
    assert r["f1"] == 0 and r["chao1"] == float(r["vocab"])
    assert r["coverage"] == 1.0


def test_chao1_vocab_grouped(spark):
    from econdatapipeline_spark.operators.lm import chao1_vocab

    df = spark.createDataFrame(
        [("s1", 1, "a a b"), ("s2", 2, "x y")],
        "source string, doc_id long, text string",
    )
    out = {r["source"]: r for r in chao1_vocab(df, group_col="source").collect()}
    assert out["s1"]["vocab"] == 2 and out["s1"]["f1"] == 1
    assert out["s2"]["vocab"] == 2 and out["s2"]["f1"] == 2
    assert out["s2"]["coverage"] == 0.0  # all singletons: zero coverage
