"""Streaming PSI drift monitor tests (streaming/drift.py)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from econdatapipeline_spark.streaming.drift import psi_monitor

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, h, 0, i % 60), 1, "m", v, "{}")
            for i, (h, v) in enumerate(rows)
        ],
        EVENT_SCHEMA,
    )


def test_same_distribution_low_psi(spark):
    # window values drawn to match the baseline histogram exactly
    baseline = [10, 10, 10, 10]
    rows = [(10, v) for v in ([0.1] * 10 + [0.3] * 10 + [0.6] * 10 + [0.9] * 10)]
    out = psi_monitor(
        _events(spark, rows), baseline, window="1 hour", lo=0.0, hi=1.0
    ).collect()
    assert len(out) == 1
    assert out[0]["psi"] < 0.01 and not out[0]["drifted"]
    assert out[0]["n"] == 40


def test_shifted_distribution_alerts(spark):
    baseline = [30, 5, 3, 2]  # mass at the low end
    rows = [(10, 0.95)] * 40  # window mass entirely in the top bin
    out = psi_monitor(
        _events(spark, rows), baseline, window="1 hour", threshold=0.2
    ).collect()
    assert len(out) == 1
    assert out[0]["psi"] > 1.0 and out[0]["drifted"]


def test_multiple_windows_scored_independently(spark):
    baseline = [10, 10]
    rows = [(9, 0.25)] * 10 + [(9, 0.75)] * 10  # hour 9: balanced
    rows += [(11, 0.9)] * 20  # hour 11: all-high
    out = {r["window_start"].hour: r for r in psi_monitor(
        _events(spark, rows), baseline, window="1 hour"
    ).collect()}
    assert not out[9]["drifted"]
    assert out[11]["drifted"]


def test_out_of_range_clamps_to_edge_bins(spark):
    baseline = [10, 10]
    rows = [(10, -5.0)] * 10 + [(10, 99.0)] * 10
    out = psi_monitor(_events(spark, rows), baseline, window="1 hour").collect()
    assert out[0]["n"] == 20  # nothing dropped
    assert abs(out[0]["psi"]) < 0.01  # 10/10 split matches baseline


def test_validation(spark):
    df = _events(spark, [(10, 0.5)])
    with pytest.raises(ValueError):
        psi_monitor(df, [1.0])
    with pytest.raises(ValueError):
        psi_monitor(df, [1, 1], lo=1.0, hi=1.0)


def test_true_streaming_path(spark, tmp_path):
    """readStream parquet -> windowed PSI -> availableNow -> memory."""
    src = str(tmp_path / "src")
    # the hour-20 sentinel advances the watermark past both windows so
    # append mode emits them; its own (still-open) window never shows
    _events(
        spark,
        [(10, 0.1)] * 5 + [(10, 0.9)] * 5 + [(12, 0.9)] * 8 + [(20, 0.5)],
    ).write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    out = psi_monitor(stream, [5, 5], window="1 hour", watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("psi_mon")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["window_start"].hour: r for r in
            spark.sql("select * from psi_mon").collect()}
    assert 10 in rows and not rows[10]["drifted"]
    assert 12 in rows and rows[12]["drifted"]
