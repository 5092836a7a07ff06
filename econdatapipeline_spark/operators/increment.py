"""Incremental aggregate maintenance (materialized-rollup upsert).

At 100 TB you cannot re-scan the fact table because a day of new rows
arrived; you maintain a materialized rollup by combining it with the
delta batch's partial aggregates. The reference has no aggregate
surface at all (SURVEY §2.4) — this is the engine-exceeds direction the
training-pipeline brief asks for, and it is the canonical use of
aggregate DECOMPOSABILITY: SUM and COUNT are additive, AVG is derived
as SUM/COUNT at read time, so a rollup keyed on (group keys) with
(sum, count) columns can absorb any delta with key-local arithmetic.

Shuffle story — the part that matters at scale:

- the delta is aggregated first (map-side combine; the shuffle is
  delta-sized, not fact-table-sized);
- the rollup absorbs it through a LEFT join plus a LEFT-ANTI union, and
  BOTH joins broadcast the delta-agg side (left-outer and left-anti are
  broadcastable build shapes; FULL OUTER is not, which is exactly why
  this is not written as one full-outer join), so the existing rollup
  is never shuffled — each of its partitions is updated in place;
- with the rollup stored bucketed on the group keys
  (Warehouse.write_bucketed) even a sort-merge fallback for a huge
  delta is co-located.

``maintain_rollup(partial_agg(hist), partial_agg(delta))`` is
guaranteed to equal ``partial_agg(hist UNION delta)`` — the invariant
the contract query's oracle certifies with a plain GROUP BY over the
full fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_agg(
    facts: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Decomposable partial aggregate: per-key SUMs plus a row COUNT.

    Sums are carried as decimal(28,6) so maintenance additions are
    associative to the cent regardless of combine order — the same
    determinism discipline as the engine's other money aggregates.
    """
    aggs = [
        F.sum(F.col(c).cast("decimal(28,6)")).alias(c) for c in sum_cols
    ] + [F.count(F.lit(1)).alias(count_col)]
    return facts.groupBy(*key_cols).agg(*aggs)


def maintain_rollup(
    rollup: DataFrame,
    delta_agg: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Absorb a delta's partial aggregates into a materialized rollup.

    Existing keys get key-local addition; keys new in the delta are
    appended. The ROLLUP SIDE IS NEVER SHUFFLED OR BROADCAST: the delta
    is the build side of every hash join —

    1. ``updated``: rollup LEFT-join broadcast(delta) + key-local adds;
    2. ``matched``: rollup LEFT-SEMI broadcast(delta-keys) — a second
       key-only pass over the rollup (column-pruned scan, no exchange)
       whose OUTPUT is at most delta-key-sized;
    3. ``fresh``: delta LEFT-ANTI broadcast(matched) — both sides tiny.

    Step 2/3 exist because the direct form (delta anti-join rollup)
    would make the 100 TB rollup the hash-build side, and FULL OUTER —
    the one-join phrasing — has no broadcast implementation at all.
    """
    d = F.broadcast(
        delta_agg.select(
            *key_cols,
            *[F.col(c).alias(f"__d_{c}") for c in sum_cols],
            F.col(count_col).alias("__d_n"),
        )
    )
    updated = rollup.join(d, key_cols, "left").select(
        *key_cols,
        *[
            (
                # BOTH sides need the null guard: a rollup key whose
                # stored sum is NULL (all-NULL measures in history)
                # must not swallow the delta
                F.coalesce(F.col(c), F.lit(0).cast("decimal(28,6)"))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0).cast("decimal(28,6)"))
            ).cast("decimal(28,6)").alias(c)
            for c in sum_cols
        ],
        (F.col(count_col) + F.coalesce(F.col("__d_n"), F.lit(0))).alias(count_col),
    )
    matched = rollup.select(*key_cols).join(
        F.broadcast(delta_agg.select(*key_cols)), key_cols, "left_semi"
    )
    fresh = delta_agg.join(F.broadcast(matched), key_cols, "left_anti")
    return updated.unionByName(fresh.select(*key_cols, *sum_cols, count_col))
