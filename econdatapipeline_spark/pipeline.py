"""Pipeline orchestration: per-dataset run loop, status taxonomy, summary.

Mirrors the reference's driver (reference: core_local/main_azure.py:
38-332): a factory dispatches each DatasetSpec to its normalizer, each
dataset runs isolated (one failure never aborts the run), a freshness
gate skips recently-updated datasets, and the run ends with a nested
summary dict persisted as JSON (S9).

Fetchers are injected: a fetcher takes a spec and returns the raw
payload (grid rows / FRED JSON / sheet rows) — in production that is
driver-side HTTP with a landing-zone cache (reference:
azure_common_scrapers.py:35-64); in tests it is a fixture. Keeping
I/O at the edge keeps everything after ``normalize`` lazy and
distributed.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from econdatapipeline_spark.operators.merge import smart_update
from econdatapipeline_spark.registry import ALL_SPECS, DatasetSpec
from econdatapipeline_spark.sources.excel_grid import normalize_edb_grid
from econdatapipeline_spark.sources.fred import normalize_fred_observations
from econdatapipeline_spark.sources.nyu import normalize_nyu_sheet
from econdatapipeline_spark.sources.warehouse import Warehouse

# Status taxonomy (reference: main_azure.py:53-126).
UPDATED = "updated"
NO_UPDATE_NEEDED = "no_update_needed"
FAILED = "failed"

Fetcher = Callable[[DatasetSpec], object]


def normalize(spark: SparkSession, spec: DatasetSpec, payload) -> DataFrame:
    """Scraper factory (C1): dispatch spec.source to its normalizer."""
    if spec.source == "edb_monthly":
        return normalize_edb_grid(spark, payload, spec, quarterly=False)
    if spec.source == "edb_quarterly":
        return normalize_edb_grid(spark, payload, spec, quarterly=True)
    if spec.source == "fred":
        return normalize_fred_observations(spark, payload, spec)
    if spec.source == "nyu_stern":
        return normalize_nyu_sheet(spark, payload)
    raise ValueError(f"unknown source type: {spec.source}")


def run_dataset(
    spark: SparkSession,
    wh: Warehouse,
    spec: DatasetSpec,
    fetcher: Fetcher,
    run_ts: datetime | None = None,
    update_frequency_hours: float = 24.0,
    force: bool = False,
) -> dict:
    """One dataset end-to-end: gate -> fetch -> normalize -> merge -> watermark.

    Exceptions are isolated per dataset (C2): the result carries
    status='failed' plus the error instead of propagating.
    """
    run_ts = run_ts or datetime.now(timezone.utc).replace(tzinfo=None)
    result: dict = {"dataset": spec.name, "status": FAILED}
    try:
        if not force and not wh.should_update(spec.name, update_frequency_hours, now=run_ts):
            result["status"] = NO_UPDATE_NEEDED
            return result
        payload = fetcher(spec)
        incoming = normalize(spark, spec, payload)
        existing = wh.read_or_empty(spec.name, spec.spark_schema())
        merge = smart_update(
            existing,
            incoming,
            key_cols=["date"],
            value_cols=list(spec.value_columns),
            dataset=spec.name,
            run_ts=run_ts,
        )
        counts = wh.apply_merge(merge, spec.name)
        wh.update_last_run(spec.name, run_ts)
        result.update(status=UPDATED, **counts)
    except Exception as exc:  # noqa: BLE001 — per-dataset isolation is the contract
        result["error"] = f"{type(exc).__name__}: {exc}"
    return result


def run_pipeline(
    spark: SparkSession,
    wh: Warehouse,
    fetchers: dict[str, Fetcher],
    specs: tuple[DatasetSpec, ...] = ALL_SPECS,
    run_ts: datetime | None = None,
    force: bool = False,
    max_workers: int = 1,
) -> dict:
    """Full run over all specs with a run-summary dict (C3 + S9).

    ``fetchers`` maps source type -> fetcher; specs with no fetcher are
    skipped (e.g. a FRED-only refresh).

    ``max_workers > 1`` runs datasets concurrently from a driver thread
    pool: each dataset is an independent table (as in the reference,
    where each is its own Azure table), so their Spark jobs interleave
    freely on the cluster scheduler — the win is overlapping one
    dataset's fetch/plan latency with another's execution, exactly what
    the reference's serial ~26-dataset loop leaves on the table. The
    two shared tables (watermarks, revision log) are serialized inside
    Warehouse by a write lock. Result order matches spec order either
    way, and per-dataset failures stay isolated (C2 status taxonomy).
    """
    run_ts = run_ts or datetime.now(timezone.utc).replace(tzinfo=None)
    start = time.monotonic()
    wh.initialize([s.name for s in specs])
    todo = [s for s in specs if s.source in fetchers]
    if max_workers > 1:
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            details = list(
                pool.map(
                    lambda spec: run_dataset(
                        spark, wh, spec, fetchers[spec.source], run_ts=run_ts, force=force
                    ),
                    todo,
                )
            )
    else:
        details = [
            run_dataset(spark, wh, spec, fetchers[spec.source], run_ts=run_ts, force=force)
            for spec in todo
        ]
    statuses = [d["status"] for d in details]
    summary = {
        "run_ts": run_ts.isoformat(),
        "duration_seconds": round(time.monotonic() - start, 3),
        "datasets_total": len(details),
        "updated": statuses.count(UPDATED),
        "no_update_needed": statuses.count(NO_UPDATE_NEEDED),
        "failed": statuses.count(FAILED),
        "details": details,
    }
    return summary


def save_run_summary(wh: Warehouse, summary: dict) -> str:
    """JSON log sink (S9): logs/run_summary_<ts>.json under the warehouse."""
    logs_dir = os.path.join(wh.root, "logs")
    os.makedirs(logs_dir, exist_ok=True)
    ts = summary.get("run_ts", datetime.now(timezone.utc).replace(tzinfo=None).isoformat()).replace(":", "-")
    path = os.path.join(logs_dir, f"run_summary_{ts}.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2, default=str)
    return path
