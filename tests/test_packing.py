"""Sequence packing, chunking, and PII scrubbing edge cases."""

import pytest
from pyspark.sql import functions as F

from econdatapipeline_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
    scrub_pii,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pack_sequences_contiguous(spark):
    # budget 5: docs of 3,3,4 tokens -> before = 0,3,6 -> seq 0,0,1
    df = _docs(
        spark,
        [(1, "a b c", "s"), (2, "d e f", "s"), (3, "g h i j", "s")],
    )
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=5).collect()}
    assert [(out[i]["seq_id"], out[i]["seq_offset"]) for i in (1, 2, 3)] == [
        (0, 0), (0, 3), (1, 1),
    ]


def test_pack_sequences_sharded(spark):
    # each source shard packs independently from offset 0
    df = _docs(spark, [(1, "a b c d", "x"), (2, "e f", "y")])
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=8, shard_col="source").collect()}
    assert out[1]["seq_offset"] == 0 and out[2]["seq_offset"] == 0


def test_chunk_exact_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(10))
    df = _docs(spark, [(1, words, "s")])
    out = sorted(
        chunk_documents(df, chunk_size=4, overlap=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    # stride 2: chunks start at 0,2,4,6 -> ceil((10-2)/2)=4 chunks
    assert [r["chunk_text"] for r in out] == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9",
    ]
    assert [r["chunk_tokens"] for r in out] == [4, 4, 4, 4]


def test_chunk_short_doc_emits_one_partial_chunk(spark):
    df = _docs(spark, [(1, "only two", "s")])
    out = chunk_documents(df, chunk_size=8, overlap=4).collect()
    assert len(out) == 1
    assert out[0]["chunk_text"] == "only two"
    assert out[0]["chunk_tokens"] == 2


def test_chunk_trailing_partial(spark):
    words = " ".join(f"w{i}" for i in range(11))
    out = sorted(
        chunk_documents(_docs(spark, [(1, words, "s")]), 4, 2).collect(),
        key=lambda r: r["chunk_id"],
    )
    # starts 0,2,4,6,8 -> last chunk has 3 tokens
    assert len(out) == 5 and out[-1]["chunk_tokens"] == 3


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, []), chunk_size=4, overlap=4)


@pytest.mark.parametrize(
    "text,expect",
    [
        ("mail bob.smith+x@sub.example.co.uk now", "mail <EMAIL> now"),
        ("ssn 123-45-6789.", "ssn <SSN>."),
        ("call (787) 555-0134 today", "call <PHONE> today"),
        ("call 787-555-0134 today", "call <PHONE> today"),
        ("call +1 787.555.0134 today", "call <PHONE> today"),
        ("call 1-787-555-0134 today", "call <PHONE> today"),
        # non-PII that superficially resembles it stays intact
        ("version 1.2.3-45 and date 2023-01-0155", "version 1.2.3-45 and date 2023-01-0155"),
    ],
)
def test_scrub_pii_patterns(spark, text, expect):
    df = _docs(spark, [(1, text, "s")])
    got = scrub_pii(df).collect()[0]["text"]
    assert got == expect


def test_pack_sequences_invariants_random_corpus(spark):
    """Property check over a seeded random corpus: every document
    packed exactly once, offsets equal the running pre-sum, and a
    document always starts inside its assigned sequence
    (seq_id * budget <= tokens_before < (seq_id + 1) * budget)."""
    import random

    random.seed(5)
    rows = [
        (i, " ".join(f"w{j}" for j in range(random.randrange(1, 30))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        pack_sequences(df, budget=64).collect(), key=lambda r: r["doc_id"]
    )
    assert [r["doc_id"] for r in out] == list(range(200))  # exactly once
    running = 0
    for r in out:
        assert r["seq_offset"] == running % 64
        assert r["seq_id"] == running // 64
        running += r["n_tokens"]
