"""SCD2 intervals and point-in-time reconstruction over the revision log.

The reference stores an append-only audit of every changed value
(reference: core_local/azure_data_tracker.py:116-127 — rows of
``(dataset, data_date, value_field, old_value, new_value,
revision_date)``) but offers only a flat newest-first listing of it
(``get_revision_history``, reference: azure_data_tracker.py:167-233).
These operators answer the two questions such a log exists for and the
reference cannot:

- ``scd2_intervals``  — "over which time ranges did each value hold?"
  (the slowly-changing-dimension type-2 build)
- ``value_asof``      — "what did the table say at time T?"
  (time travel / audit reconstruction)

Both are single-window-pass shapes partitioned by the revision key, so
they scale with the log: no self-joins, no per-key driver loops. At
100 TB the log is append-only Parquet partitioned by dataset — the
window shuffle is keyed on exactly that partition layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

REV_KEY = ["dataset", "data_date", "value_field"]


def scd2_intervals(revisions: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Build SCD2 validity intervals from an append-only revision log.

    For every key that ever changed, emits one row per value epoch:
    ``(*key, value, valid_from, valid_to, is_current)`` where
    ``valid_from`` is NULL for the key's original value (held since
    before auditing began), ``valid_to`` is NULL for the value in
    effect now, and half-open ``[valid_from, valid_to)`` intervals
    tile the timeline with no gaps.

    One shuffle: a window over the key ordered by ``revision_date``
    derives each revision's epoch via ``lead``; the initial epoch is
    the ``old_value`` of the key's first revision (a ``row_number = 1``
    branch of the same window, so no second shuffle).

    Two same-timestamp revisions of one key have NO well-defined order
    (the log does not record intra-timestamp sequence), so the timeline
    of such a key is inherently ambiguous; ties are broken by
    ``new_value`` purely so reruns stay deterministic. ``smart_update``
    stamps one ``run_ts`` per batch and changes a (key, field) at most
    once per batch, so ties only arise from caller error (two batches
    merged with an identical run_ts).
    """
    key = key_cols or REV_KEY
    w = Window.partitionBy(*key).orderBy("revision_date", "new_value")
    annotated = revisions.select(
        *key,
        "old_value",
        "new_value",
        "revision_date",
        F.row_number().over(w).alias("__rn"),
        F.lead("revision_date").over(w).alias("__next_ts"),
    )
    current_epochs = annotated.select(
        *key,
        F.col("new_value").alias("value"),
        F.col("revision_date").alias("valid_from"),
        F.col("__next_ts").alias("valid_to"),
        F.col("__next_ts").isNull().alias("is_current"),
    )
    initial_epoch = annotated.filter(F.col("__rn") == 1).select(
        *key,
        F.col("old_value").alias("value"),
        F.lit(None).cast("timestamp").alias("valid_from"),
        F.col("revision_date").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    return initial_epoch.unionByName(current_epochs)


def scd2_join(
    facts: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    how: str = "left",
) -> DataFrame:
    """Event-time dimension lookup: each fact row picks the SCD2 epoch
    in effect at its own timestamp.

    The third member of the SCD family: ``scd2_intervals`` builds the
    timeline, ``value_asof`` reconstructs ONE point in time for the
    whole table, this joins EVERY fact to its own point in time — the
    fact-to-dimension pattern of warehouse modeling (what price/rate/
    status did this key have when this event happened?).

    Join condition: key equality plus containment in the half-open
    epoch ``[valid_from, valid_to)``, with NULL ends open (the initial
    epoch reaches back forever, the current epoch forward). Because
    the intervals tile each key's timeline with no gaps, every fact on
    a tracked key matches EXACTLY one epoch; untracked keys survive via
    the left join with NULL dimension columns.

    Plan shape: an equi-join on the key (broadcast or sort-merge as
    sizes dictate) with the range containment as a post-join filter —
    epochs per key are few (one per revision), so the filter scans a
    handful of rows per fact. No window, no explode.
    """
    dim_out = [c for c in intervals.columns if c not in key_cols]
    clash = sorted(set(dim_out) & set(facts.columns))
    if clash:
        # emitting both sides' columns under one name would succeed
        # here and then fail far away with AMBIGUOUS_REFERENCE; fail
        # fast with the cause instead
        raise ValueError(
            f"fact and dimension share non-key column name(s) {clash}; "
            "rename one side before scd2_join"
        )
    f, d = facts.alias("__f"), intervals.alias("__d")
    ts = F.col(f"__f.{ts_col}")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(f"__f.{k}") == F.col(f"__d.{k}"))
    cond = (
        cond
        & (F.col("__d.valid_from").isNull() | (ts >= F.col("__d.valid_from")))
        & (F.col("__d.valid_to").isNull() | (ts < F.col("__d.valid_to")))
    )
    dim_cols = [c for c in intervals.columns if c not in key_cols]
    return f.join(d, cond, how).select(
        *[F.col(f"__f.{c}") for c in facts.columns],
        *[F.col(f"__d.{c}").alias(c) for c in dim_cols],
    )


def value_asof(
    current: DataFrame,
    revisions: DataFrame,
    ts: Column,
    key_cols: list[str],
    value_col: str,
    rev_key_cols: list[str] | None = None,
) -> DataFrame:
    """Reconstruct ``current`` as it stood at time ``ts``.

    A key's as-of value is the ``old_value`` of its EARLIEST revision
    strictly after ``ts`` (that revision overwrote what was in effect);
    keys with no later revision still hold their current value. Keys
    inserted after ``ts`` cannot be detected from the revision log
    alone (the reference logs updates only, not inserts) and are
    reported with their current value — callers needing insert
    awareness should also filter on an ingestion-date column.

    ``revisions`` must be keyed uniquely by ``rev_key_cols`` per
    logical value: the shared audit table keys rows by (dataset,
    data_date, value_field), so PRE-FILTER it to one dataset and one
    value field before passing it here — an unfiltered log would let
    another dataset's or field's old_value win the min_by and silently
    corrupt the reconstruction.

    Plan: filter the log to ``revision_date > ts`` (a pushed-down scan
    predicate on the append-only log), take ``min_by(old_value,
    revision_date)`` per key — one map-side-combinable aggregate, no
    window — and left-join onto ``current``. The min_by ordering key
    includes ``old_value`` so same-timestamp ties resolve
    deterministically (same caveat as scd2_intervals: such ties mean
    the log itself is ambiguous).
    """
    rev_key = rev_key_cols or key_cols
    if len(rev_key) != len(key_cols):
        raise ValueError(
            f"rev_key_cols has {len(rev_key)} columns but key_cols has "
            f"{len(key_cols)} — the join would silently drop keys"
        )
    later = (
        revisions.filter(F.col("revision_date") > ts)
        .groupBy(*rev_key)
        .agg(
            F.min_by(
                "old_value", F.struct("revision_date", "old_value")
            ).alias("__asof_value")
        )
    )
    joined = current.join(
        later,
        [current[k] == later[rk] for k, rk in zip(key_cols, rev_key)],
        "left",
    )
    return joined.select(
        *[current[k] for k in current.columns if k != value_col],
        F.coalesce(F.col("__asof_value"), current[value_col]).alias(value_col),
    )
