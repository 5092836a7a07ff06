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


def test_luhn_valid_known_numbers(spark):
    from pyspark.sql import functions as F

    from econdatapipeline_spark.functions.text import luhn_valid

    rows = [
        ("4532015112830366", True),   # visa test number
        ("378282246310005", True),    # amex test number
        ("4532015112830367", False),  # bad check digit
        ("1234567890123", False),
        ("123", False),               # too short
        ("4532 0151 1283 0366", True),  # separators stripped
    ]
    df = spark.createDataFrame(rows, "c string, expect boolean")
    out = df.select("c", "expect", luhn_valid(F.col("c")).alias("got"))
    for r in out.collect():
        assert r["got"] == r["expect"], r["c"]


def test_luhn_check_digit_roundtrip(spark):
    from pyspark.sql import functions as F

    from econdatapipeline_spark.functions.text import (
        luhn_check_digit,
        luhn_valid,
    )

    # for arbitrary 15-digit bases, base || check_digit must validate
    df = spark.createDataFrame(
        [(str(444000000000000 + i * 7919),) for i in range(50)], "b string"
    )
    out = df.select(
        luhn_valid(
            F.concat(F.col("b"), luhn_check_digit(F.col("b")).cast("string"))
        ).alias("ok")
    )
    assert all(r["ok"] for r in out.collect())


def test_scrub_cards_redacts_only_valid(spark):
    from econdatapipeline_spark.operators.packing import scrub_cards

    rows = [
        (0, "pay 4532 0151 1283 0366 now"),
        (1, "ref 4532015112830367 invalid"),
        (2, "two cards 378282246310005 and 4532015112830366 here"),
        (3, "no digits at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r["text"] for r in scrub_cards(df).collect()}
    assert out[0] == "pay <CARD> now"
    assert out[1] == "ref 4532015112830367 invalid"
    assert out[2] == "two cards <CARD> and <CARD> here"
    assert out[3] == "no digits at all"


def test_mojibake_score_flags_damage(spark):
    from pyspark.sql import functions as F

    from econdatapipeline_spark.functions.text import mojibake_score

    rows = [("clean text here",), ("brÃ©ken tÃªxt Ã©verywhere",), ("",)]
    df = spark.createDataFrame(rows, "t string")
    out = [
        r["m"]
        for r in df.select(
            F.round(mojibake_score(F.col("t")), 4).alias("m")
        ).collect()
    ]
    assert out[0] == 0.0
    assert out[1] > 0.05
    assert out[2] == 0.0  # empty text: guarded denominator
