"""Streaming curation gate/monitor tests (streaming/curation)."""

from __future__ import annotations

import datetime as dt

from econdatapipeline_spark.streaming.curation import (
    curation_gate,
    quality_monitor,
)

GOOD = (
    "the cats sat upon the mats and that dogs ran off to their new home "
    "while the birds flew over the tall trees near the old stone wall"
)

SCHEMA = "doc_id long, ts timestamp, text string"


def _rows(hours_and_texts):
    return [
        (i, dt.datetime(2024, 1, 1, h, 30, 0), t)
        for i, (h, t) in enumerate(hours_and_texts)
    ]


def test_gate_batch_keeps_good_docs(spark):
    df = spark.createDataFrame(
        _rows([(0, GOOD), (0, "junk"), (1, GOOD + " again")]), SCHEMA
    )
    kept = curation_gate(df, min_words=10, min_required_stops=1)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0, 2]
    row = kept.filter("doc_id = 0").first()
    assert row["text"].startswith("the cats")
    assert row["ok_words"] and row["ok_stops"]


def test_monitor_batch_counts_per_window(spark):
    df = spark.createDataFrame(
        _rows([(0, GOOD), (0, "junk"), (1, GOOD), (1, GOOD)]), SCHEMA
    )
    out = {
        r["window_start"].hour: r
        for r in quality_monitor(
            df, window="1 hour", min_words=10, min_required_stops=1
        ).collect()
    }
    assert out[0]["n_docs"] == 2 and out[0]["n_pass"] == 1
    assert out[0]["fail_words"] == 1  # "junk" is too short
    assert out[1]["n_docs"] == 2 and out[1]["n_pass"] == 2


def test_gate_and_monitor_streaming(spark, tmp_path):
    src = str(tmp_path / "src")
    # the hour-20 sentinel advances the watermark past the real windows
    # so append mode emits them; its own still-open window never shows
    spark.createDataFrame(
        _rows([(0, GOOD), (0, "junk"), (1, GOOD), (20, "sentinel")]),
        SCHEMA,
    ).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)

    gate_q = (
        curation_gate(stream, min_words=10, min_required_stops=1)
        .writeStream.format("memory")
        .queryName("cur_gate")
        .trigger(availableNow=True)
        .start()
    )
    gate_q.awaitTermination(60)
    kept = spark.sql("SELECT doc_id FROM cur_gate").collect()
    assert sorted(r["doc_id"] for r in kept) == [0, 2]

    mon_q = (
        quality_monitor(
            stream, window="1 hour", watermark="30 minutes",
            min_words=10, min_required_stops=1,
        )
        .writeStream.format("memory")
        .queryName("cur_mon")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    mon_q.awaitTermination(60)
    # availableNow + append: windows close once the watermark passes;
    # with one batch the 0h window (doc 0+1) is sealed by the 1h event.
    rows = spark.sql(
        "SELECT * FROM cur_mon ORDER BY window_start"
    ).collect()
    assert len(rows) >= 1
    first = rows[0]
    assert first["n_docs"] == 2 and first["n_pass"] == 1
    # batch and stream gates agree by construction (same expressions)
    batch = quality_monitor(
        spark.read.parquet(src), window="1 hour",
        min_words=10, min_required_stops=1,
    ).collect()
    bmap = {r["window_start"]: (r["n_docs"], r["n_pass"]) for r in batch}
    assert bmap[first["window_start"]] == (
        first["n_docs"], first["n_pass"]
    )
