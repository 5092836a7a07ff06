"""Streaming windowed aggregation + late-data upsert.

The reference is strictly batch (SURVEY §2.11): its closest streaming
concepts are the per-dataset last_run watermark and smart_update's
handling of revised ('late') values. This module is the Structured
Streaming generalization for the ``events`` table:

- tumbling / sliding / session windows with an event-time watermark
  (late rows beyond the watermark are dropped by Spark; within it they
  update the window — the streaming analog of the 24h gate + revision
  capture);
- ``foreachBatch`` upsert applying the same smart_update MERGE per
  micro-batch, so late corrections generate revision rows exactly as
  the batch pipeline does.

Every builder also accepts a *batch* DataFrame: the window expressions
are identical (Spark's unified model), which is how the DuckDB oracle
checks these operators (CORRECTNESS gate runs the batch form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.operators.merge import smart_update
from econdatapipeline_spark.sources.warehouse import Warehouse


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, event_type) count + value sum, tumbling windows."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window_size).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window average value per event_type."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_size, slide).alias("w"), "event_type"
        )
        .agg(F.round(F.avg("value"), 6).alias("avg_value"), F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "avg_value",
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user: a session closes after `gap` of silence."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Sessionization behind F.session_window -> one row per session
    (user, session_start, session_end, n_events[, total_value],
    duration_s) — the STREAMING twin of the batch gaps-and-islands
    operator (operators/sessions.sessionize), certified equal on
    shared input by tests/test_streaming.py (the stream_vwap
    certification pattern, VERDICT r7 #4).

    session_window's native end is last-event + gap; it is shifted
    back by the gap here so the output schema and values match the
    batch operator exactly (session_end = max event ts, duration_s =
    span of observed events). session_seq is NOT produced — numbering
    a user's sessions needs cross-session order, which append-mode
    streaming cannot provide; the batch operator remains the backfill
    path for that column.

    ONE documented semantic seam: session_window is right-open, so an
    event arriving EXACTLY gap after the previous one starts a new
    session here, while the batch operator's strict `> gap` break
    keeps it. Off-boundary inputs agree row-for-row — both operators
    compare FULL-PRECISION timestamps (the batch break is an exact
    unix_micros diff since r9; its earlier whole-second truncation
    kept e.g. a 1800.8 s gap joined that session_window split).

    Scale: the engine's native session state store, keyed by user —
    parallel across users, watermark-bounded state, append output of
    closed sessions only.
    """
    gap = f"{int(gap_minutes)} minutes"
    src = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events")]
    if value_col:
        aggs.append(
            F.round(
                F.sum(F.col(value_col).cast("decimal(28,6)")).cast(
                    "double"
                ),
                6,
            ).alias("total_value")
        )
    out = src.groupBy(
        F.session_window(F.col(ts_col), gap).alias("w"),
        F.col(user_col).alias("user"),
    ).agg(*aggs)
    end = F.col("w.end") - F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    return out.select(
        "user",
        F.col("w.start").alias("session_start"),
        end.alias("session_end"),
        "n_events",
        *(["total_value"] if value_col else []),
        (
            F.unix_timestamp(end) - F.unix_timestamp(F.col("w.start"))
        ).cast("long").alias("duration_s"),
    )


def stream_upsert_sink(
    stream: DataFrame,
    wh: Warehouse,
    table: str,
    key_cols: list[str],
    value_cols: list[str],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """writeStream -> foreachBatch MERGE (the streaming J1).

    Each micro-batch applies smart_update against the current table
    state: new keys insert, changed keys update + revision rows. This is
    how late/corrected events reconcile instead of being dropped —
    exactly the reference's revision semantics, per micro-batch.
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # ONE pinned timestamp per micro-batch (smart_update requires
        # it): every revision row in the batch carries the same
        # revision_date, deterministic within the batch.
        from datetime import datetime, timezone  # noqa: PLC0415

        batch_ts = datetime.now(timezone.utc).replace(tzinfo=None)
        schema_df = batch_df.select(*key_cols, *value_cols)
        existing = wh.read_or_empty(table, schema_df.schema)
        res = smart_update(
            existing,
            schema_df,
            key_cols=key_cols,
            value_cols=value_cols,
            dataset=table,
            run_ts=batch_ts,
        )
        wh.apply_merge(res, table)

    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ohlc_bars(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-window OHLC bars of the value stream -> (window_start,
    window_end, open, high, low, close, volume, total).

    The streaming form of operators/timeseries.ohlc_resample: open and
    close ride min_by/max_by over a lexicographic (second-resolution
    timestamp + zero-padded tiebreak) string key, which makes the
    whole aggregate MAP-SIDE COMBINABLE — the precondition for running
    identically as a watermarked streaming aggregation (append mode
    emits each bar once, when the watermark closes its window) and as
    the batch twin the oracle certifies. Same-second events tie-break
    on the id, the documented contract on both engines.
    """
    src = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    from econdatapipeline_spark.functions.parsing import (  # noqa: PLC0415
        padded_tiebreak,
    )

    k = F.concat(
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss"),
        padded_tiebreak(F.col(tiebreak_col)),
    )
    v = F.col(value_col).cast("double")
    return (
        src.select(
            F.col(ts_col), k.alias("__k"), v.alias("__v")
        )
        .groupBy(F.window(F.col(ts_col), window_size).alias("w"))
        .agg(
            F.min_by("__v", "__k").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max_by("__v", "__k").alias("close"),
            F.count(F.lit(1)).cast("long").alias("volume"),
            F.round(
                F.sum(F.col("__v").cast("decimal(28,6)")).cast("double"), 6
            ).alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "total",
        )
    )


def vwap_bars(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    price_col: str = "value",
    qty_col: str = "qty",
) -> DataFrame:
    """Per-window volume-weighted average price -> (window_start,
    window_end, vwap, volume, notional).

    The streaming form of operators/timeseries.vwap and the weighted
    companion to ohlc_bars: Σ(p·q)/Σq where the notional rides
    decimal-exact products, so the aggregate is two order-free SUMs —
    map-side combinable, append-mode streamable behind a watermark,
    and bit-identical run as a batch twin (the stream_ohlc
    certification pattern: same function, both modes).
    """
    src = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    p = F.col(price_col).cast("decimal(18,6)")
    q = F.col(qty_col).cast("long")
    return (
        src.select(
            F.col(ts_col),
            (p * q).cast("decimal(38,6)").alias("__pq"),
            q.alias("__q"),
        )
        .groupBy(F.window(F.col(ts_col), window_size).alias("w"))
        .agg(
            F.sum("__pq").alias("notional6"),
            F.sum("__q").cast("long").alias("volume"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.round(
                F.when(
                    F.col("volume") > 0,
                    F.col("notional6").cast("double")
                    / F.col("volume").cast("double"),
                ),
                6,
            ).alias("vwap"),
            "volume",
            F.round(F.col("notional6").cast("double"), 6).alias("notional"),
        )
    )
