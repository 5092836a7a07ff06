"""Replica of the driver's correctness-window ORACLE footprint.

The driver harness runs its ~50-query window through ONE DuckDB
connection at DEFAULT settings (no memory_limit tuning, no
reconnects). In r10 the recursive-CTE oracles' untracked transient
allocations (see ORACLE_PARITY.md "Round 11") stacked in that shared
connection and OOM'd six queries, five of them unrelated. This tool
replays exactly that shape locally so the hazard is measured before
the driver hits it:

    python tools/oracle_window_sweep.py [sf_dir] [correctness_json]

- sf_dir defaults to /root/testdata/sf0.01 (the driver's scale);
- correctness_json (default: latest CORRECTNESS_r*.json) supplies the
  window's query names in driver order; queries without an oracle are
  skipped (rows-only by design);
- with --all, sweeps EVERY oracle_sql() entry instead (pre-flight for
  whatever window the next round draws).

Prints per-oracle rows, wall time, and peak-RSS delta; exits non-zero
on any oracle error. Keep the final peak under ~1 GB: the driver box
also holds the Spark JVM, so oracle headroom is what stands between a
green window and a cascade of OutOfMemoryException rows.
"""

from __future__ import annotations

import glob
import json
import os
import re
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def latest_correctness() -> str | None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cands = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    return cands[-1] if cands else None


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    sweep_all = "--all" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    oracles = entrymod.oracle_sql()
    if sweep_all:
        window = list(oracles)
    else:
        src = args[1] if len(args) > 1 else latest_correctness()
        window = list(json.load(open(src))) if src else list(oracles)
        print(f"window: {len(window)} queries from {src}")

    con = duckdb.connect()  # default memory_limit, no temp spill —
    # deliberately the driver's untuned shape.
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    prev = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    errors = 0
    for name in window:
        if name not in oracles:
            print(f"{name:30s} (rows-only, no oracle)")
            continue
        t0 = time.time()
        try:
            rows = con.execute(oracles[name]).fetchall()
            err = ""
        except Exception as exc:  # noqa: BLE001 — report and continue
            rows, err = [], f"  ERROR {type(exc).__name__}: {str(exc)[:120]}"
            errors += 1
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        delta, prev = rss - prev, rss
        print(
            f"{name:30s} rows={len(rows):6d} dt={time.time() - t0:6.2f}s"
            f" rss_delta={delta:5d}MB total={rss}MB{err}",
            flush=True,
        )
    print(f"FINAL peak RSS: {prev} MB, errors: {errors}")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
