"""Audit analytics: SCD2 timeline and time travel over the revision log.

Run from the repo root:  python examples/audit_timeline.py

The reference records every changed value in an append-only audit table
(reference: core_local/azure_data_tracker.py:116-127) but can only list
it newest-first. This walkthrough shows what the engine does with the
same log: ingest three batches of a series where published values get
restated, then

  1. build the SCD2 validity timeline per value (operators.scd),
  2. reconstruct the table exactly as it stood between two batches,
  3. cross-check the reconstruction against the actual batch-2 state.
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from econdatapipeline_spark import get_spark, Warehouse
from econdatapipeline_spark.operators.merge import smart_update
from econdatapipeline_spark.operators.scd import scd2_intervals, value_asof

T1 = dt.datetime(2025, 6, 1, 2, 0)
T2 = dt.datetime(2025, 6, 2, 2, 0)
T3 = dt.datetime(2025, 6, 3, 2, 0)

BATCHES = [
    # (run_ts, rows) — unemployment-rate style series with restatements
    (T1, [("2025-01-01", 11.2), ("2025-02-01", 11.0), ("2025-03-01", 10.9)]),
    (T2, [("2025-01-01", 11.3), ("2025-02-01", 11.0), ("2025-03-01", 10.9),
          ("2025-04-01", 10.7)]),
    (T3, [("2025-01-01", 11.3), ("2025-02-01", 10.8), ("2025-03-01", 11.1),
          ("2025-04-01", 10.7)]),
]


def main() -> None:
    spark = get_spark(app_name="audit_timeline", master="local[4]", shuffle_partitions=4)
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="warehouse_"))
    name = "unemployment_sim"

    for run_ts, rows in BATCHES:
        batch = spark.createDataFrame(
            [(dt.date.fromisoformat(d), v) for d, v in rows],
            "date date, value double",
        )
        existing = wh.read_or_empty(name, batch.schema)
        counts = wh.apply_merge(
            smart_update(existing, batch, ["date"], ["value"], name, run_ts=run_ts),
            name,
        )
        print(f"batch @ {run_ts:%Y-%m-%d}: {counts}")

    print("\nSCD2 timeline of every restated value:")
    timeline = scd2_intervals(wh.revisions()).orderBy(
        "data_date", F.col("valid_from").asc_nulls_first()
    )
    timeline.show(truncate=False)

    asof_ts = dt.datetime(2025, 6, 2, 12, 0)  # between batches 2 and 3
    print(f"table as of {asof_ts:%Y-%m-%d %H:%M} (after batch 2, before 3):")
    # The shared audit table holds every dataset and value field —
    # value_asof's contract requires narrowing to exactly one of each.
    rev = (
        wh.revisions()
        .filter((F.col("dataset") == name) & (F.col("value_field") == "value"))
        .withColumn("date", F.to_date("data_date"))
    )
    reconstructed = value_asof(
        wh.read(name), rev, F.lit(asof_ts), key_cols=["date"], value_col="value"
    )
    reconstructed.orderBy("date").show()

    got = {str(r["date"]): r["value"] for r in reconstructed.collect()}
    want = {d: v for d, v in BATCHES[1][1]}
    assert got == want, (got, want)
    print("time travel matches the actual batch-2 state:", got == want)


if __name__ == "__main__":
    main()
