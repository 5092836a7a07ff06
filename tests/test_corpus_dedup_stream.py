"""Streaming cross-corpus dedup + idempotent append sink
(streaming/corpus_dedup.py)."""

from __future__ import annotations

import datetime as dt

from econdatapipeline_spark.sources.warehouse import Warehouse
from econdatapipeline_spark.streaming import corpus_dedup as CD

DOC_SCHEMA = "doc_id long, ts timestamp, text string"
T0 = dt.datetime(2024, 1, 1, 10, 0)

DUP = "the quick brown fox jumps over the lazy dog again and again"
OTHER = "completely unrelated content with different words in every position"


def _corpus(spark):
    return spark.createDataFrame(
        [(100, DUP), (101, "nothing whatsoever like any other document here")],
        "doc_id long, text string",
    )


def test_batch_semantics_and_candidate_dedup(spark):
    idx = CD.banded_corpus_index(_corpus(spark))
    docs = spark.createDataFrame(
        [(1, T0, DUP), (2, T0, OTHER)], DOC_SCHEMA
    )
    out = CD.stream_near_dup_candidates(docs, idx).collect()
    # doc 1 matches corpus doc 100 exactly once despite sharing all 4
    # bands; doc 2 matches nothing
    assert [(r["id_left"], r["id_right"]) for r in out] == [(1, 100)]


def test_streaming_matches_batch(spark, tmp_path):
    idx = CD.banded_corpus_index(_corpus(spark))
    rows = [(1, T0, DUP), (2, T0, OTHER), (3, T0, DUP)]
    batch_docs = spark.createDataFrame(rows, DOC_SCHEMA)
    expect = {
        (r["id_left"], r["id_right"])
        for r in CD.stream_near_dup_candidates(batch_docs, idx).collect()
    }
    assert expect == {(1, 100), (3, 100)}

    src = str(tmp_path / "docs")
    batch_docs.write.parquet(src)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = (
        CD.stream_near_dup_candidates(stream, idx)
        .writeStream.format("memory")
        .queryName("cd_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["id_left"], r["id_right"])
        for r in spark.sql("SELECT * FROM cd_test").collect()
    }
    assert got == expect


def test_idempotent_sink_skips_replayed_batch(spark, tmp_path):
    """A replayed foreachBatch batch id must append exactly once."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    docs = spark.createDataFrame([(1, T0, DUP)], DOC_SCHEMA)
    src = str(tmp_path / "in")
    docs.write.parquet(src)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = CD.idempotent_append_sink(stream, wh, "landed", str(tmp_path / "ck1"))
    q.awaitTermination(120)
    assert wh.read("landed").count() == 1

    # simulate the crash-replay: re-run the same source with a FRESH
    # checkpoint so Spark re-delivers batch 0; the ledger must skip it
    stream2 = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q2 = CD.idempotent_append_sink(stream2, wh, "landed", str(tmp_path / "ck2"))
    q2.awaitTermination(120)
    assert wh.read("landed").count() == 1
