"""Text-analysis function tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from econdatapipeline_spark.functions import text as X


def _one(spark, s, col):
    return spark.createDataFrame([(s,)], "text string").select(col.alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, "a b  c", X.token_count(F.col("text"))) == 3
    assert _one(spark, "", X.token_count(F.col("text"))) == 0
    assert _one(spark, "  ", X.token_count(F.col("text"))) == 0


def test_bpe_ish_tokens(spark):
    out = _one(spark, "Hello, world42!", X.bpe_ish_tokens(F.col("text")))
    assert out == ["hello", ",", "world", "42", "!"]


def test_punct_and_quality(spark):
    assert _one(spark, "abcd", X.punct_ratio(F.col("text"))) == 0.0
    assert _one(spark, "a!!!", X.punct_ratio(F.col("text"))) == 0.75
    good = _one(spark, "the quick brown fox jumps over the lazy dog and runs in a field",
                X.quality_score(F.col("text")))
    bad = _one(spark, "!!! ### $$$", X.quality_score(F.col("text")))
    assert good > bad


def test_langid(spark):
    assert _one(spark, "the cat is in the house and it is warm", X.langid(F.col("text"))) == "en"
    assert _one(spark, "el gato esta en la casa y es de madrid", X.langid(F.col("text"))) == "es"
    assert _one(spark, "der hund und die katze von berlin mit ein", X.langid(F.col("text"))) == "de"
    assert _one(spark, "xyzzy qwerty", X.langid(F.col("text"))) == "und"


def test_fingerprint_normalizes_case_and_space(spark):
    a = _one(spark, "Hello   World", X.fingerprint(F.col("text")))
    b = _one(spark, "hello world", X.fingerprint(F.col("text")))
    c = _one(spark, "hello worlds", X.fingerprint(F.col("text")))
    assert a == b != c


def test_shingles(spark):
    out = _one(spark, "a b c d", X.shingles(F.col("text"), 3))
    assert out == ["a b c", "b c d"]
    short = _one(spark, "a b", X.shingles(F.col("text"), 3))
    assert short == ["a b"]


def test_minhash_similarity_ordering(spark):
    """Near-identical docs share more signature positions than unrelated."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "the quick brown fox jumps over the lazy dog near the river edge"),
            (3, "completely different words about spark engines and parquet files"),
        ],
        "doc_id long, text string",
    )
    sig = df.select(
        "doc_id", X.minhash_signature(X.shingles(F.col("text"), 3), 32).alias("sig")
    ).collect()
    sigs = {r["doc_id"]: r["sig"] for r in sig}
    agree_12 = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert agree_12 > agree_13
    assert agree_13 == 0


def test_minhash_hof_and_agg_forms_agree(spark):
    """The row-expression (HOF) MinHash used by streaming and the
    explode+aggregate MinHash used by batch LSH must produce IDENTICAL
    signatures — their composability (a stream probing a batch-built
    index) depends on it."""
    from pyspark.sql import functions as F

    from econdatapipeline_spark.functions.text import minhash_signature, shingles
    from econdatapipeline_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "spark engines shuffle parquet files across clusters"),
            (3, "a b c d e f g h i j k l m n o p"),
        ],
        "doc_id long, text string",
    )
    hof = {
        r["doc_id"]: list(r["sig"])
        for r in docs.select(
            "doc_id", minhash_signature(shingles(F.col("text")), 16).alias("sig")
        ).collect()
    }
    agg = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(docs, num_hashes=16).collect()
    }
    assert hof == agg
