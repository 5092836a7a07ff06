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
    """A genuine crash-replay (same checkpoint, uncommitted batch)
    appends exactly once; a RECREATED checkpoint is a new query
    incarnation whose batch 0 carries new data and must land."""
    import os
    import shutil

    wh = Warehouse(spark, str(tmp_path / "wh"))
    docs = spark.createDataFrame([(1, T0, DUP)], DOC_SCHEMA)
    src = str(tmp_path / "in")
    docs.write.parquet(src)
    ck = str(tmp_path / "ck1")
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = CD.idempotent_append_sink(stream, wh, "landed", ck)
    q.awaitTermination(120)
    q.stop()
    assert wh.read("landed").count() == 1

    # crash-replay: drop the commit record (as if the crash landed
    # between the side effect and the checkpoint commit) and restart
    # from the SAME checkpoint — Spark re-delivers batch 0 under the
    # same query id; the ledger must skip it
    os.remove(os.path.join(ck, "commits", "0"))
    crc = os.path.join(ck, "commits", ".0.crc")
    if os.path.exists(crc):  # local-FS checksum sidecar of the commit
        os.remove(crc)
    stream2 = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q2 = CD.idempotent_append_sink(stream2, wh, "landed", ck)
    q2.awaitTermination(120)
    q2.stop()
    assert wh.read("landed").count() == 1

    # checkpoint deleted + recreated: batch ids restart at 0 but the
    # query id is new, so this incarnation's batch 0 (NEW data) must
    # NOT be mistaken for the old batch 0 and silently dropped
    shutil.rmtree(ck)
    spark.createDataFrame([(2, T0, "fresh doc two")], DOC_SCHEMA).write.mode(
        "append"
    ).parquet(src)
    stream3 = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q3 = CD.idempotent_append_sink(stream3, wh, "landed", ck)
    q3.awaitTermination(120)
    assert wh.read("landed").count() == 3
