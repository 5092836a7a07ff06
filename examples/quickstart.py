"""Quickstart: the reference's full workflow on this engine.

Run from the repo root:  python examples/quickstart.py

Walks the reference user's day: ingest three source shapes into the
warehouse, re-ingest revised data (revision audit), query the read
surface (point lookup, revision history, date-aligned export), and run
one corpus operator over the benchmark documents table.
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from econdatapipeline_spark import Warehouse, get_spark
from econdatapipeline_spark.pipeline import run_pipeline, save_run_summary
from econdatapipeline_spark.plans.queries import export_wide, get_revision_history
from econdatapipeline_spark.registry import EDB_SPECS, FRED_SPECS


def edb_fetcher(spec):
    grid = [["", 2024, 2025]]
    months = ["July", "August", "September", "October", "November", "December",
              "January", "February", "March", "April", "May", "June"]
    return grid + [[m, str(100 + i), str(200 + i)] for i, m in enumerate(months)]


def edb_fetcher_revised(spec):
    grid = edb_fetcher(spec)
    grid[1][2] = "999"  # July FY2025 revised upward
    return grid


def fred_fetcher(spec):
    return {"observations": [
        {"date": "2024-01-01", "value": "4.33"},
        {"date": "2024-02-01", "value": "."},       # FRED missing sentinel
        {"date": "2024-03-01", "value": "4.58"},
    ]}


def main() -> None:
    spark = get_spark(app_name="quickstart", master="local[4]", shuffle_partitions=4)
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="warehouse_"))
    specs = (EDB_SPECS[0], EDB_SPECS[1], FRED_SPECS[0])

    # Day 1: first ingestion (concurrent datasets).
    s1 = run_pipeline(
        spark, wh, {"edb_monthly": edb_fetcher, "fred": fred_fetcher},
        specs=specs, run_ts=dt.datetime(2025, 6, 1, 2, 0), max_workers=2,
    )
    print("day 1:", {k: s1[k] for k in ("updated", "no_update_needed", "failed")})

    # Day 2: one source revised a published value -> audit rows appear.
    s2 = run_pipeline(
        spark, wh, {"edb_monthly": edb_fetcher_revised, "fred": fred_fetcher},
        specs=specs, run_ts=dt.datetime(2025, 6, 2, 2, 0), max_workers=2,
    )
    print("day 2:", {k: s2[k] for k in ("updated", "no_update_needed", "failed")})
    print("summary saved to:", save_run_summary(wh, s2))

    name = specs[0].name
    print("\nlatest rows of", name)
    wh.read(name).orderBy(F.desc("date")).show(3)

    print("revision history (the reference's read-side SELECT):")
    get_revision_history(wh, dataset=name, limit=5).show(truncate=False)

    print("date-aligned export across datasets:")
    export_wide(wh, [s.name for s in specs]).orderBy(F.desc("date")).show(5)


if __name__ == "__main__":
    main()
