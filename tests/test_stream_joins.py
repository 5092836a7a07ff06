"""Stream-stream interval join + streaming dedup (streaming/joins.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from econdatapipeline_spark.sources.tables import load_events
from econdatapipeline_spark.streaming import joins as SJ

SF_DIR = "/root/testdata/sf0.001"
EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_interval_join_batch_semantics(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    clicks = spark.createDataFrame(
        [(1, t0, 7, "click", 0.0, "{}"), (2, t0, 8, "click", 0.0, "{}")], EVENT_SCHEMA
    )
    purchases = spark.createDataFrame(
        [
            (10, t0 + dt.timedelta(minutes=10), 7, "purchase", 5.0, "{}"),  # in window
            (11, t0 + dt.timedelta(minutes=40), 7, "purchase", 5.0, "{}"),  # too late
            (12, t0, 8, "purchase", 5.0, "{}"),                             # not strictly after
            (13, t0 + dt.timedelta(minutes=5), 9, "purchase", 5.0, "{}"),   # other user
        ],
        EVENT_SCHEMA,
    )
    out = SJ.interval_join(clicks, purchases, within="30 minutes").collect()
    assert [(r["left_id"], r["right_id"], r["lag_seconds"]) for r in out] == [(1, 10, 600)]


def test_interval_join_streaming_matches_batch(spark, tmp_path):
    """Real readStream both sides; availableNow result == batch result."""
    ev = load_events(spark, SF_DIR)
    clicks_dir, purch_dir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    ev.filter(F.col("event_type") == "click").write.parquet(clicks_dir)
    ev.filter(F.col("event_type") == "purchase").write.parquet(purch_dir)

    batch = SJ.interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    sc = spark.readStream.schema(EVENT_SCHEMA).parquet(clicks_dir)
    sp = spark.readStream.schema(EVENT_SCHEMA).parquet(purch_dir)
    q = (
        SJ.interval_join(sc, sp)
        .writeStream.format("memory")
        .queryName("ij_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["left_id"], r["right_id"])
        for r in spark.sql("select left_id, right_id from ij_test").collect()
    }
    want = {(r["left_id"], r["right_id"]) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_dedup_within_watermark_streaming(spark, tmp_path):
    """Duplicate event_ids across files collapse to one row each."""
    src = str(tmp_path / "src")
    ev = load_events(spark, SF_DIR).limit(200)
    ev.write.mode("append").parquet(src)
    ev.write.mode("append").parquet(src)  # exact duplicates

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        SJ.dedup_events(stream)
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("select count(distinct event_id) c, count(*) n from dedup_test").collect()[0]
    assert n["n"] == 200 and n["c"] == 200


def test_outer_interval_join_batch_semantics(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    clicks = spark.createDataFrame(
        [(1, t0, 7, "click", 0.0, "{}"), (2, t0, 8, "click", 0.0, "{}")], EVENT_SCHEMA
    )
    purchases = spark.createDataFrame(
        [(10, t0 + dt.timedelta(minutes=10), 7, "purchase", 5.0, "{}")], EVENT_SCHEMA
    )
    out = {
        r["left_id"]: r["right_id"]
        for r in SJ.interval_join(
            clicks, purchases, within="30 minutes", how="left_outer"
        ).collect()
    }
    assert out == {1: 10, 2: None}  # user 8's click kept, null-extended


def test_outer_interval_join_streaming_emits_unmatched(spark, tmp_path):
    """Unmatched clicks surface once the watermark passes their bound."""
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    clicks_dir, purch_dir = str(tmp_path / "c"), str(tmp_path / "p")
    spark.createDataFrame(
        [(1, t0, 7, "click", 0.0, "{}"), (2, t0, 8, "click", 0.0, "{}")], EVENT_SCHEMA
    ).write.parquet(clicks_dir)
    # user 7 converts; a far-future event on BOTH sides pushes the
    # watermark far enough for the engine to close user 8's window
    far = t0 + dt.timedelta(days=30)
    spark.createDataFrame(
        [
            (10, t0 + dt.timedelta(minutes=10), 7, "purchase", 5.0, "{}"),
            (99, far, 1, "purchase", 0.0, "{}"),
        ],
        EVENT_SCHEMA,
    ).write.parquet(purch_dir)
    spark.createDataFrame(
        [(98, far, 1, "click", 0.0, "{}")], EVENT_SCHEMA
    ).write.mode("append").parquet(clicks_dir)

    sc = spark.readStream.schema(EVENT_SCHEMA).parquet(clicks_dir)
    sp = spark.readStream.schema(EVENT_SCHEMA).parquet(purch_dir)
    q = (
        SJ.interval_join(sc, sp, within="30 minutes", how="left_outer")
        .writeStream.format("memory")
        .queryName("oij_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["left_id"], r["right_id"])
        for r in spark.sql("select left_id, right_id from oij_test").collect()
    }
    assert (1, 10) in got        # converted click
    assert (2, None) in got      # unmatched click emitted after watermark


def test_full_outer_interval_join_batch_semantics(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    clicks = spark.createDataFrame(
        [(1, t0, 7, "click", 0.0, "{}"), (2, t0, 8, "click", 0.0, "{}")], EVENT_SCHEMA
    )
    purchases = spark.createDataFrame(
        [
            (10, t0 + dt.timedelta(minutes=10), 7, "purchase", 5.0, "{}"),
            (11, t0 + dt.timedelta(minutes=5), 9, "purchase", 5.0, "{}"),  # no click
        ],
        EVENT_SCHEMA,
    )
    out = {
        (r["left_id"], r["right_id"]): r["user_id"]
        for r in SJ.interval_join(
            clicks, purchases, within="30 minutes", how="full_outer"
        ).collect()
    }
    # converted click, unmatched click, AND orphan purchase (key from right side)
    assert out == {(1, 10): 7, (2, None): 8, (None, 11): 9}


def test_enrich_stream_static_broadcast(spark, tmp_path):
    """readStream x static dim == batch join; no watermark, no state."""
    ev = load_events(spark, SF_DIR).limit(300)
    dim = spark.createDataFrame(
        [(int(r["user_id"]), f"name_{r['user_id']}", 7) for r in
         ev.select("user_id").distinct().limit(20).collect()],
        "c_custkey long, c_name string, c_nationkey long",
    )
    batch = SJ.enrich_stream(ev, dim).select("event_id", "c_name").collect()

    src = str(tmp_path / "src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        SJ.enrich_stream(stream, dim)
        .select("event_id", "c_name")
        .writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["event_id"], r["c_name"]) for r in spark.sql("select * from enrich_test").collect()}
    want = {(r["event_id"], r["c_name"]) for r in batch}
    assert got == want and len(want) == 300
    assert any(n is not None for _, n in want)  # some events actually enriched


def test_full_outer_interval_join_streaming_emits_both_unmatched(spark, tmp_path):
    """Watermark-gated null extension on BOTH sides in the real
    streaming engine (availableNow run over file sources)."""
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    far = t0 + dt.timedelta(days=30)
    clicks_dir, purch_dir = str(tmp_path / "c"), str(tmp_path / "p")
    spark.createDataFrame(
        [
            (1, t0, 7, "click", 0.0, "{}"),          # converts
            (2, t0, 8, "click", 0.0, "{}"),          # never converts
            (98, far, 1, "click", 0.0, "{}"),        # watermark pusher
        ],
        EVENT_SCHEMA,
    ).write.parquet(clicks_dir)
    spark.createDataFrame(
        [
            (10, t0 + dt.timedelta(minutes=10), 7, "purchase", 5.0, "{}"),
            (11, t0 + dt.timedelta(minutes=5), 9, "purchase", 5.0, "{}"),  # orphan
            (99, far, 1, "purchase", 0.0, "{}"),     # watermark pusher
        ],
        EVENT_SCHEMA,
    ).write.parquet(purch_dir)

    sc = spark.readStream.schema(EVENT_SCHEMA).parquet(clicks_dir)
    sp = spark.readStream.schema(EVENT_SCHEMA).parquet(purch_dir)
    q = (
        SJ.interval_join(sc, sp, within="30 minutes", how="full_outer")
        .writeStream.format("memory")
        .queryName("foij_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["left_id"], r["right_id"])
        for r in spark.sql("select left_id, right_id from foij_test").collect()
    }
    assert (1, 10) in got       # matched pair
    assert (2, None) in got     # unmatched left, null-extended
    assert (None, 11) in got    # unmatched right, null-extended


def test_semi_interval_join_batch_semantics(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    clicks = spark.createDataFrame(
        [(1, t0, 7, "click", 0.0, "{}"), (2, t0, 8, "click", 0.0, "{}")], EVENT_SCHEMA
    )
    purchases = spark.createDataFrame(
        [
            # user 7: TWO purchases in window -> click 1 emits ONCE
            (10, t0 + dt.timedelta(minutes=5), 7, "purchase", 5.0, "{}"),
            (11, t0 + dt.timedelta(minutes=10), 7, "purchase", 5.0, "{}"),
            # user 8: only a too-late purchase -> click 2 absent
            (12, t0 + dt.timedelta(minutes=40), 8, "purchase", 5.0, "{}"),
        ],
        EVENT_SCHEMA,
    )
    out = SJ.interval_join(
        clicks, purchases, within="30 minutes", how="left_semi"
    ).collect()
    assert [(r["user_id"], r["left_id"]) for r in out] == [(7, 1)]
    assert set(out[0].asDict()) == {"user_id", "left_id", "left_ts"}


def test_semi_interval_join_streaming_matches_batch(spark, tmp_path):
    ev = load_events(spark, SF_DIR)
    clicks_dir, purch_dir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    ev.filter(F.col("event_type") == "click").write.parquet(clicks_dir)
    ev.filter(F.col("event_type") == "purchase").write.parquet(purch_dir)

    batch = SJ.interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        how="left_semi",
    )
    sc = spark.readStream.schema(EVENT_SCHEMA).parquet(clicks_dir)
    sp = spark.readStream.schema(EVENT_SCHEMA).parquet(purch_dir)
    q = (
        SJ.interval_join(sc, sp, how="left_semi")
        .writeStream.format("memory")
        .queryName("semi_ij_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_semi"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM semi_ij_test")
    assert sorted(r["left_id"] for r in got.collect()) == sorted(
        r["left_id"] for r in batch.collect()
    )
