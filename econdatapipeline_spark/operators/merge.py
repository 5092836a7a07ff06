"""smart_update: upsert with revision audit, as declarative joins.

The reference's central operator (reference: core_local/
azure_data_tracker.py:54-165) streams incoming rows against an
in-memory hash map of the full existing table:

- key absent                     -> INSERT               (left-anti join)
- key present, |new-old| > tol   -> UPDATE + revision row (inner join + filter)
- otherwise                      -> no-op
- value that fails float()       -> change silently skipped (:128-130)

Here the same contract is two joins over DataFrames. No join strategy
is forced: Catalyst's 64 MB auto-broadcast threshold (session.py) plus
AQE pick broadcast-hash for the reference's O(10^2-10^3)-row batches
and fall back to sort-merge when the incoming side is large — the
correct 100 TB behavior. Callers that KNOW the batch is tiny can pass
``broadcast=True`` to pin the hint; an unconditional hint would build
a 100 GB batch as a hash relation on every executor (OOM), so it is
opt-in, never the default. The existing side is only ever scanned,
never collected.

Null semantics match the reference's float() guard: a comparison where
either side is NULL is not "changed" (float(None) raises -> skipped),
so ``abs(s - t) > tol`` being NULL-falsy is exactly right.

Determinism: one ``run_ts`` literal per batch stamps every revision row
(the reference takes per-row utcnow() at :119,125, nondeterministic
under retry — SURVEY §4 flags this; a single literal is the fix).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_TOLERANCE = 0.001  # reference: azure_data_tracker.py:113


@dataclass
class MergeResult:
    """Outputs of one smart_update batch (all lazy DataFrames)."""

    merged: DataFrame  # post-merge state of the dataset table
    inserts: DataFrame  # incoming rows with unseen keys
    updates: DataFrame  # incoming rows that changed an existing key
    revisions: DataFrame  # one row per changed (key, value_field)

    def counts(self) -> dict[str, int]:
        """{'new': n, 'updated': m, 'revisions': k} — triggers execution.

        Mirrors the reference's result dict (azure_data_tracker.py:136-165).
        One Spark job, not three: the branches are unioned under a tag
        and counted in a single aggregate, so the shared scans and the
        broadcast of the incoming batch execute once.
        """
        u = (
            self.inserts.select(F.lit("new").alias("__branch"))
            .unionAll(self.updates.select(F.lit("updated").alias("__branch")))
            .unionAll(self.revisions.select(F.lit("revisions").alias("__branch")))
        )
        got = {r["__branch"]: r["n"] for r in u.groupBy("__branch").agg(F.count(F.lit(1)).alias("n")).collect()}
        return {k: int(got.get(k, 0)) for k in ("new", "updated", "revisions")}


def smart_update(
    existing: DataFrame,
    incoming: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    dataset: str,
    *,
    run_ts: datetime,
    tolerance: float = DEFAULT_TOLERANCE,
    broadcast: bool | None = None,
) -> MergeResult:
    """MERGE incoming into existing, capturing revisions for changed values.

    Equivalent SQL (Delta syntax, for reference):

        MERGE INTO existing t USING incoming s ON <keys>
        WHEN NOT MATCHED THEN INSERT *
        WHEN MATCHED AND (abs(s.v1-t.v1) > tol OR ...) THEN UPDATE SET *

    plus an INSERT INTO datarevisions SELECT ... per changed value field.

    ``broadcast``: None (default) lets Catalyst/AQE choose the join
    strategy from size estimates; True pins a broadcast hint on the
    incoming side (only safe when the caller knows the batch is small);
    False suppresses any hint from this function (Catalyst may still
    auto-broadcast under its threshold).

    ``run_ts`` is REQUIRED and KEYWORD-ONLY (a legacy positional
    caller passing tolerance sixth would otherwise silently bind a
    float to run_ts — Spark casts it to 1970-era timestamps without
    error, corrupting revision_date): one pinned timestamp per batch, generated
    once at the pipeline/sink entry point — never inside this operator.
    The reference stamps utcnow() per ROW (azure_data_tracker.py:119),
    which makes revision rows nondeterministic under retries; a
    defaulted utcnow() here would quietly re-introduce that (SURVEY §7)
    and datetime.utcnow() is deprecated besides.
    """
    out_cols = key_cols + value_cols
    src = incoming.select(*out_cols)
    if broadcast:
        src = F.broadcast(src)
    src = src.alias("s")
    tgt = existing.select(*out_cols).alias("t")

    inserts = src.join(tgt, on=key_cols, how="left_anti")

    pairs = src.join(tgt, on=key_cols, how="inner").select(
        *[F.col(f"s.{k}").alias(k) for k in key_cols],
        *[F.col(f"s.{c}").alias(f"new_{c}") for c in value_cols],
        *[F.col(f"t.{c}").alias(f"old_{c}") for c in value_cols],
    )
    changed_any = None
    for c in value_cols:
        cond = F.abs(F.col(f"new_{c}") - F.col(f"old_{c}")) > F.lit(tolerance)
        changed_any = cond if changed_any is None else (changed_any | cond)
    changed = pairs.filter(changed_any)

    updates = changed.select(
        *key_cols, *[F.col(f"new_{c}").alias(c) for c in value_cols]
    )

    # One revision row per changed field: unpivot the changed pairs.
    date_key = key_cols[-1]  # (dataset-implicit, date) — date is the row key
    rev_parts = []
    for c in value_cols:
        rev_parts.append(
            changed.filter(
                F.abs(F.col(f"new_{c}") - F.col(f"old_{c}")) > F.lit(tolerance)
            ).select(
                F.lit(dataset).alias("dataset"),
                # String key: ISO 'yyyy-MM-dd' for date keys (matching the
                # reference's stored format), str(key) otherwise.
                F.col(date_key).cast("string").alias("data_date"),
                F.lit(c).alias("value_field"),
                F.col(f"old_{c}").cast("double").alias("old_value"),
                F.col(f"new_{c}").cast("double").alias("new_value"),
                F.lit(run_ts).cast("timestamp").alias("revision_date"),
            )
        )
    revisions = rev_parts[0]
    for part in rev_parts[1:]:
        revisions = revisions.unionByName(part)

    upd_keys = updates.select(*key_cols)
    if broadcast:
        upd_keys = F.broadcast(upd_keys)
    untouched = tgt.join(upd_keys, key_cols, "left_anti")
    merged = untouched.unionByName(updates).unionByName(inserts)

    return MergeResult(merged=merged, inserts=inserts, updates=updates, revisions=revisions)
