"""Custom stateful streaming operators via applyInPandasWithState.

Where windows.py covers the declarative window surface (tumbling /
sliding / session + watermark), this module is the escape hatch for
state machines Spark's built-ins can't express: arbitrary per-key state
carried across micro-batches, updated by an Arrow-batched Python
kernel. The canonical training-data-pipeline uses: running per-user
aggregates for rate limiting / quota tracking, and custom sessionizers
whose close conditions aren't a fixed gap.

Scale notes: state lives in the state store keyed by the grouping
columns — one shuffle per batch on the key, state size O(distinct
keys), not O(events). Kernels receive whole per-key pandas chunks
(Arrow transfer), so the Python boundary is batch-granular, never
per-row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _running_totals_kernel(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime (n_events, total_value), updated every batch.

    State: one (count, sum) pair per user, carried across micro-batches
    — the streaming generalization of the reference's per-dataset
    watermark bookkeeping (azure_connector.py:552-617), where the
    'state' is whatever the pipeline must remember between runs.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_kernel,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )



QUOTA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("spent_after", T.DoubleType()),
    ]
)

_QUOTA_STATE_SCHEMA = T.StructType([T.StructField("spent", T.DoubleType())])


def quota_filter(events: DataFrame, budget: float = 50.0) -> DataFrame:
    """Per-user value-budget gate: emit events (in event_id order within
    each batch) only while cumulative value stays within the budget;
    an event that would overshoot is dropped, later smaller ones may
    still fit. The classic rate-limit/quota state machine — the spent
    counter is per-key state carried across micro-batches.

    Same state-store scale shape as running_user_totals: one shuffle on
    the key per batch, state O(distinct users), Arrow-batched kernel.
    (Spark 4's transformWithStateInPandas expresses this with typed
    ValueState handles, but its driver worker needs google.protobuf,
    absent in this environment — the GroupState form below is
    semantically identical and runs everywhere.)
    """

    def kernel(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        spent = state.get[0] if state.exists else 0.0
        # A group spanning multiple Arrow chunks (>maxRecordsPerBatch
        # rows) must still be gated in ONE event_id order — sorting each
        # chunk independently would make which events are dropped depend
        # on the chunk boundaries (nondeterministic across retries and
        # checkpoint recovery). Groups here are per-user batches, so the
        # concat is bounded by one user's events in one micro-batch.
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("event_id")
        keep_ids, keep_vals, keep_spent = [], [], []
        for eid, val in zip(pdf["event_id"], pdf["value"]):
            if spent + float(val) > budget:
                continue
            spent += float(val)
            keep_ids.append(int(eid))
            keep_vals.append(float(val))
            keep_spent.append(round(spent, 6))
        if keep_ids:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(keep_ids),
                    "event_id": keep_ids,
                    "value": keep_vals,
                    "spent_after": keep_spent,
                }
            )
        state.update((spent,))

    return events.groupBy("user_id").applyInPandasWithState(
        kernel,
        outputStructType=QUOTA_OUTPUT_SCHEMA,
        stateStructType=_QUOTA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("cusum_pos", T.DoubleType()),
        T.StructField("cusum_neg", T.DoubleType()),
        T.StructField("alarm", T.BooleanType()),
    ]
)

_CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("base", T.DoubleType()),
        T.StructField("s_pos", T.DoubleType()),
        T.StructField("s_neg", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def cusum_monitor(events: DataFrame, threshold: float = 100.0) -> DataFrame:
    """Streaming two-sided CUSUM drift alarm per key: the live twin of
    ``operators.timeseries.cusum_changepoint``.

    Page's recursions run natively here — streaming state IS the
    sequential accumulator the batch operator had to rewrite in closed
    window form:

        S+ := max(0, S+ + (x - base)) ; S- := max(0, S- - (x - base))

    with ``base`` pinned to the key's first-ever observation (carried
    in the state store, so restarts and late batches keep the same
    reference level). One (base, S+, S-, n) tuple per key; each batch
    emits the key's updated detector and alarm flag.

    Events are processed in (ts, value) order after a single
    per-group-batch concat — chunk-local sorts would make the
    intermediate S trajectories depend on Arrow chunk boundaries
    (same determinism rule as quota_filter). The FINAL S after the
    batch is order-independent only in the batch twin's closed form;
    the trajectory (and thus when the alarm first fires) is not, so
    the order contract matters.
    """

    def kernel(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            base, s_pos, s_neg, n = state.get
        else:
            base, s_pos, s_neg, n = None, 0.0, 0.0, 0
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts", "value"])
        for x in pdf["value"]:
            v = float(x)
            if base is None:
                base = v
            s_pos = max(0.0, s_pos + (v - base))
            s_neg = max(0.0, s_neg - (v - base))
            n += 1
        state.update((base, s_pos, s_neg, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_seen": [n],
                "cusum_pos": [round(s_pos, 6)],
                "cusum_neg": [round(s_neg, 6)],
                "alarm": [s_pos > threshold or s_neg > threshold],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        kernel,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HEAVY_HITTERS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("item", T.StringType()),
        T.StructField("min_count", T.LongType()),
        T.StructField("n_shard", T.LongType()),
    ]
)

_HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
    ]
)


def heavy_hitters(
    events: DataFrame,
    item_col: str,
    capacity: int = 16,
    shards: int = 8,
) -> DataFrame:
    """Streaming heavy hitters (trending tokens/domains) with BOUNDED
    state: a sharded Misra-Gries summary maintained across micro-batches
    -> (shard, item, min_count, n_shard) per surviving counter.

    Exact running top-k over an unbounded stream needs O(distinct)
    state; Misra-Gries keeps ``capacity`` counters with the guarantee

        true_count - n/(capacity+1)  <=  min_count  <=  true_count

    (n = items seen), so every item with frequency > n/(capacity+1) is
    GUARANTEED present — the deterministic sketch the mergeable-
    summaries literature builds on (Misra & Gries 1982; Agarwal et al.
    2012 for the merge rule used here: sum counters, then subtract the
    (capacity+1)-th largest and drop non-positive).

    Sharding makes it distributed: items route to a shard by hash, so
    each shard's summary covers a DISJOINT item set — the global
    answer is the plain union of shard outputs (no cross-shard merge),
    state is capacity x shards counters total, and each shard's error
    bound tightens to ITS n. One shuffle per batch on the shard key;
    the kernel processes items in sorted order so the surviving set is
    deterministic for a given batch partitioning (the bound holds
    regardless).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")

    def kernel(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n = state.get
            summary = dict(zip(list(items), [int(c) for c in counts]))
            n = int(n)
        else:
            summary, n = {}, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        vc = batch["__hh_item"].value_counts()
        n += int(vc.sum())
        # mergeable-summaries combine: add, then decrement by the
        # (capacity+1)-th largest count and drop the non-positive
        for item in sorted(vc.index):
            summary[item] = summary.get(item, 0) + int(vc[item])
        if len(summary) > capacity:
            cut = sorted(summary.values(), reverse=True)[capacity]
            summary = {i: c - cut for i, c in summary.items() if c > cut}
        state.update((list(summary.keys()), list(summary.values()), n))
        if summary:
            ordered = sorted(summary.items())
            yield pd.DataFrame(
                {
                    "shard": [key[0]] * len(ordered),
                    "item": [i for i, _ in ordered],
                    "min_count": [c for _, c in ordered],
                    "n_shard": [n] * len(ordered),
                }
            )

    keyed = events.select(
        F.col(item_col).cast("string").alias("__hh_item"),
        F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(shards)).alias(
            "__hh_shard"
        ),
    )
    return keyed.groupBy("__hh_shard").applyInPandasWithState(
        kernel,
        outputStructType=HEAVY_HITTERS_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
