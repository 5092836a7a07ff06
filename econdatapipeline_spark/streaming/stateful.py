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
