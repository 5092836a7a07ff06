"""Batch sessionization: gaps-and-islands over an event stream.

The batch twin of the streaming session window
(streaming/windows.py session_window): group each user's events into
sessions separated by more than a gap threshold, entirely with
per-user windows — the classic gaps-and-islands form, which is also
how a warehouse backfills the session table the streaming job
maintains forward.

Reference parity: the reference's pipeline logs runs with start/end
timestamps per dataset run (core_local/pipeline.py run-summary
construction); sessionization is the same episode-building operation
applied to the event domain.

Scale: both windows are PARTITIONED BY the user key — parallel across
users, no global sort; state per task is one row (lag) plus a running
sum. Session rows are output-sized; nothing exceeds the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str | None = "value",
) -> DataFrame:
    """Events -> one row per session:
    (user, session_seq, session_start, session_end, n_events,
    duration_s[, total_value]).

    A session breaks when the gap to the user's previous event exceeds
    ``gap_minutes``; ``session_seq`` numbers a user's sessions in time
    order (deterministic — it counts boundary flags, not row ids).
    Equal timestamps always land in the same session regardless of
    intra-tie order (gap 0 <= threshold), so the output is
    tie-order-independent.

    The break compares EXACT MICROSECONDS (r9 ADVICE fix): a
    whole-second ``unix_timestamp`` diff truncates, so a real gap of
    1800.8 s (unix diff 1800) would stay joined here while the
    full-precision streaming twin (streaming/windows.stream_sessionize
    via session_window) splits it. Timestamp subtraction yields an
    exact day-time interval for BOTH timestamp and timestamp_ntz
    inputs, so with the interval break the two operators differ ONLY
    at the exact-at-gap boundary (strict ``>`` here, right-open ``>=``
    there), as the twin's docstring documents.
    """
    gap_s = int(gap_minutes) * 60
    base = df.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("__ts"),
        *(
            [F.col(value_col).cast("decimal(28,6)").alias("__v")]
            if value_col
            else []
        ),
    )
    w = Window.partitionBy("user").orderBy(F.col("__ts").asc())
    prev = F.lag(F.col("__ts")).over(w)
    new_flag = F.when(
        prev.isNull()
        | (
            F.col("__ts") - prev > F.expr(f"INTERVAL {gap_s} SECOND")
        ),
        1,
    ).otherwise(0)
    flagged = base.withColumn(
        "session_seq",
        F.sum(new_flag).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    aggs = [
        F.min("__ts").alias("session_start"),
        F.max("__ts").alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    ]
    if value_col:
        aggs.append(
            F.round(F.sum("__v").cast("double"), 6).alias("total_value")
        )
    out = flagged.groupBy("user", "session_seq").agg(*aggs)
    return out.withColumn(
        "duration_s",
        (
            F.unix_timestamp("session_end")
            - F.unix_timestamp("session_start")
        ).cast("long"),
    )

