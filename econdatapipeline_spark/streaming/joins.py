"""Stream-stream interval join and streaming deduplication.

Two more Structured Streaming operators the reference's batch world has
no analog for (SURVEY §2.11), completing the streaming surface next to
windows.py / stateful.py / rollup.py:

- **interval_join**: correlate two event streams on a key within an
  event-time bound (purchase within N minutes of the click). In
  streaming form both sides carry watermarks and the time-bound join
  condition lets Spark expire state — without the bound, stream-stream
  join state grows forever. In batch form the identical expressions
  run as a plain range-predicate join (how the DuckDB oracle checks
  it).
- **dedup_events**: drop duplicate events by key. Streaming form uses
  ``dropDuplicatesWithinWatermark`` so the dedup state is bounded by
  the watermark horizon (the 100 TB requirement: state that survives
  exactly as long as a duplicate can still arrive); batch form is
  ``dropDuplicates``.

Both builders accept a batch OR streaming DataFrame (Spark's unified
model), mirroring windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Rows of `right` following a `left` row on `key` within `within`.

    Output: (key, left event id/ts, right event id/ts, lag_seconds).
    Expects both inputs to carry (event_id, ts, key) columns.

    ``how="left_outer"`` keeps unmatched left rows with null right
    columns (the funnel question: which clicks did NOT convert). In
    streaming form Spark emits the null-extended row only once the
    watermark proves no match can still arrive — which is why outer
    stream-stream joins REQUIRE both the watermark and the event-time
    bound in the join condition; state stays bounded by the same
    horizon as the inner join. ``how="full_outer"`` additionally keeps
    unmatched right rows (both funnels at once: clicks that never
    converted AND purchases with no preceding click), with the same
    watermark-gated null emission on both sides.
    """
    if how not in ("inner", "left_outer", "full_outer", "left_semi"):
        raise ValueError(f"unsupported join type {how!r}")
    if left.isStreaming:
        left = left.withWatermark(ts_col, watermark)
    if right.isStreaming:
        right = right.withWatermark(ts_col, watermark)
    l = left.select(
        F.col(key).alias("k"),
        F.col("event_id").alias("left_id"),
        F.col(ts_col).alias("left_ts"),
    )
    r = right.select(
        F.col(key).alias("rk"),
        F.col("event_id").alias("right_id"),
        F.col(ts_col).alias("right_ts"),
    )
    cond = (
        (F.col("k") == F.col("rk"))
        & (F.col("right_ts") > F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"INTERVAL {within}"))
    )
    if how == "left_semi":
        # Existence-only funnel (which clicks converted at all): each
        # left row emits at most once, so no pair fan-out reaches the
        # sink and the streaming form keeps the same bounded state as
        # the inner join without its output amplification.
        return l.join(r, cond, "left_semi").select(
            F.col("k").alias(key), "left_id", "left_ts"
        )
    return (
        l.join(r, cond, how)
        .select(
            # full_outer: the key survives whichever side is present.
            F.coalesce(F.col("k"), F.col("rk")).alias(key),
            "left_id",
            "left_ts",
            "right_id",
            "right_ts",
            (F.unix_timestamp("right_ts") - F.unix_timestamp("left_ts")).alias("lag_seconds"),
        )
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: tuple[str, ...] = ("c_name", "c_nationkey"),
    how: str = "left_outer",
) -> DataFrame:
    """Stream-static join: decorate an event stream with dimension columns.

    The static side is broadcast (``F.broadcast``): every micro-batch
    joins map-side against the replicated dimension with ZERO stream
    shuffle and ZERO state store — unlike a stream-stream join there is
    nothing to watermark, because the static side is complete by
    definition. This is THE 100 TB enrichment shape (events × customer
    profile): the stream stays partitioned as it arrives, and a
    dimension of millions of rows still broadcasts in MBs. Spark
    re-reads the static side per micro-batch, so a slowly-changing
    dimension picks up updates between batches.

    Works identically on a batch frame (the unified model) — which is
    how the DuckDB oracle checks it.
    """
    d = F.broadcast(
        dim.select(F.col(dim_key).alias("__dk"), *[F.col(c) for c in dim_cols])
    )
    return events.join(d, events[key] == d["__dk"], how).drop("__dk")


def dedup_events(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Duplicate-drop by key with watermark-bounded state when streaming."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
    return events.dropDuplicates(list(keys))
