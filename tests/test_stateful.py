"""applyInPandasWithState: state must accumulate across micro-batches."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from econdatapipeline_spark.streaming.stateful import running_user_totals

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture()
def dirs():
    src = tempfile.mkdtemp()
    ckpt = tempfile.mkdtemp()
    yield src, ckpt
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def _write_batch(spark, src_dir: str, rows, name: str):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, name))


def _run_once(spark, src_dir: str, ckpt: str):
    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(src_dir)
    collected: list = []

    def sink(batch_df, _batch_id):
        collected.extend(batch_df.collect())

    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return collected


def test_state_accumulates_across_batches(spark, dirs):
    src, ckpt = dirs
    t0 = dt.datetime(2024, 1, 1)
    _write_batch(spark, src, [(1, t0, 10.0), (1, t0, 5.0), (2, t0, 1.0)], "b0")
    out1 = _run_once(spark, src, ckpt)
    got1 = {r["user_id"]: (r["n_events"], r["total_value"]) for r in out1}
    assert got1 == {1: (2, 15.0), 2: (1, 1.0)}

    # second batch: new file, same checkpoint -> state carries over
    _write_batch(spark, src, [(1, t0, 2.5), (3, t0, 7.0)], "b1")
    out2 = _run_once(spark, src, ckpt)
    got2 = {r["user_id"]: (r["n_events"], r["total_value"]) for r in out2}
    assert got2[1] == (3, 17.5)  # accumulated across batches
    assert got2[3] == (1, 7.0)
    assert 2 not in got2  # update mode: untouched keys not re-emitted


def test_quota_filter_enforces_budget_across_batches(spark, dirs):
    """transformWithStateInPandas: the spent ValueState must gate events
    across micro-batches (Spark 4 typed-state API)."""
    from pyspark.sql import types as TT

    from econdatapipeline_spark.streaming.stateful import quota_filter

    schema = TT.StructType(
        [
            TT.StructField("user_id", TT.LongType()),
            TT.StructField("event_id", TT.LongType()),
            TT.StructField("value", TT.DoubleType()),
        ]
    )
    src, ckpt = dirs

    def write(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    def run_once():
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(src)
        collected: list = []

        def sink(batch_df, _batch_id):
            collected.extend(batch_df.collect())

        q = (
            quota_filter(stream, budget=20.0)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return collected

    # batch 0: user 1 spends 15 of 20; the 10.0 event would overshoot
    # and is dropped, but the later 4.0 still fits (gate is per event)
    write([(1, 1, 10.0), (1, 2, 5.0), (1, 3, 10.0), (1, 4, 4.0)], "b0")
    out0 = run_once()
    assert [(r["event_id"], r["spent_after"]) for r in sorted(out0, key=lambda r: r["event_id"])] == [
        (1, 10.0), (2, 15.0), (4, 19.0)
    ]

    # batch 1: state carries — only 1.0 of budget remains
    write([(1, 5, 0.5), (1, 6, 2.0), (2, 7, 3.0)], "b1")
    out1 = run_once()
    got = {r["event_id"]: r["spent_after"] for r in out1}
    assert got == {5: 19.5, 7: 3.0}  # 6 dropped (over budget); user 2 fresh


def test_cusum_monitor_matches_batch_closed_form(spark, dirs):
    """The streaming recursion across TWO micro-batches must equal the
    batch operator's closed window form over the concatenated series."""
    from econdatapipeline_spark.streaming.stateful import cusum_monitor
    from econdatapipeline_spark.operators.timeseries import cusum_changepoint

    src, ckpt = dirs
    t = dt.datetime(2024, 1, 1)
    b0 = [(1, t + dt.timedelta(seconds=i), v) for i, v in enumerate([10.0, 11.0, 9.0])]
    b1 = [
        (1, t + dt.timedelta(seconds=3 + i), v)
        for i, v in enumerate([20.0, 22.0, 25.0])
    ]

    def run(src_dir, ckpt_dir):
        stream = spark.readStream.schema(EVENT_SCHEMA).option(
            "recursiveFileLookup", "true"
        ).parquet(src_dir)
        got: list = []

        def sink(batch_df, _bid):
            got.extend(batch_df.collect())

        q = (
            cusum_monitor(stream, threshold=15.0)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    _write_batch(spark, src, b0, "b0")
    out1 = run(src, ckpt)
    assert len(out1) == 1 and out1[0]["n_seen"] == 3 and not out1[0]["alarm"]

    _write_batch(spark, src, b1, "b1")
    out2 = run(src, ckpt)
    assert len(out2) == 1
    r = out2[0]
    assert r["n_seen"] == 6

    # batch twin over the full series: final S+/S- must agree
    allrows = [(1, i, v) for i, (_, _, v) in enumerate(b0 + b1)]
    df = spark.createDataFrame(allrows, "k long, t int, v double")
    last = (
        cusum_changepoint(df, "k", "t", "v", threshold=15.0)
        .orderBy("t")
        .collect()[-1]
    )
    assert (r["cusum_pos"], r["cusum_neg"]) == (last["cusum_pos"], last["cusum_neg"])
    assert r["alarm"] == last["alarm"] is True


def test_heavy_hitters_bound_and_cross_batch_state(spark, dirs):
    """Misra-Gries guarantees: (a) every item with true frequency >
    n_shard/(capacity+1) survives, (b) min_count never exceeds the true
    count and undershoots by at most n_shard/(capacity+1) — held across
    TWO micro-batches with state carried between them."""
    import collections

    from pyspark.sql import types as TT

    from econdatapipeline_spark.streaming.stateful import heavy_hitters

    src, ckpt = dirs
    schema = TT.StructType([TT.StructField("word", TT.StringType())])

    # skewed vocabulary: a few heavy items + a long tail
    batch1 = [("alpha",)] * 60 + [("beta",)] * 40 + [
        (f"tail{i}",) for i in range(50)
    ]
    batch2 = [("alpha",)] * 50 + [("gamma",)] * 45 + [
        (f"tail{i}",) for i in range(50, 100)
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "b1"))

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        rows: list = []

        def sink(batch_df, _bid):
            rows.extend(batch_df.collect())

        q = (
            heavy_hitters(stream, "word", capacity=8, shards=4)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return rows

    run()
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "b2"))
    rows = run()  # second incarnation resumes from the checkpoint

    # keep the LAST emission per (shard, item)
    latest = {}
    for r in rows:
        latest[(r["shard"], r["item"])] = r
    by_item = {item: r for (_s, item), r in latest.items()}

    truth = collections.Counter(w for w, in batch1 + batch2)
    # per-shard n and per-shard truth (items are hash-disjoint by shard)
    shard_n = {}
    for (s, _i), r in latest.items():
        shard_n[s] = max(shard_n.get(s, 0), r["n_shard"])

    for item, r in by_item.items():
        true = truth[item]
        assert r["min_count"] <= true, item
        assert true - r["min_count"] <= r["n_shard"] / (8 + 1) + 1e-9, item
    # alpha appears 110 times across both batches — far above any
    # shard's n/(capacity+1) — it MUST be present with a tight count
    assert "alpha" in by_item
    assert by_item["alpha"]["min_count"] >= 110 - by_item["alpha"]["n_shard"] / 9
    assert "beta" in by_item and "gamma" in by_item


def test_heavy_hitters_validates_params(spark):
    from econdatapipeline_spark.streaming.stateful import heavy_hitters

    df = spark.createDataFrame([("x",)], "word string")
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "word", capacity=0)
    with pytest.raises(ValueError, match="shards"):
        heavy_hitters(df, "word", shards=0)
