"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf_dir and
compares against oracle_sql() via DuckDB: row count, sorted column
names, and an order-insensitive exact value comparison (NaN-safe).
Usage: python tools/check_parity.py [sf_dir] [query ...]

Env:
  PARITY_JSON_OUT  path to write a machine-readable artifact: one
                   object with per-query {status, rows, hash} rows,
                   where hash is sha256 over the normalized sorted
                   rows (identical normalization for spark + oracle,
                   so "hash_match": true is an exact-value claim).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from econdatapipeline_spark.session import get_spark

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="parity", master="local[8]", shuffle_partitions=8)

    # A single DuckDB connection accumulated enough working memory
    # across ~380 oracle executions to OOM the box mid-run (r10:
    # 36 late-position oracles died on 16KB allocations while the JVM
    # held 8g). Three guards: a hard memory_limit with disk spill, a
    # bounded thread pool, and a FRESH connection every RECONNECT
    # queries (views re-registered) so nothing can leak run-long.
    RECONNECT = 25

    def fresh_con():
        c = duckdb.connect()
        c.execute("PRAGMA memory_limit='24GB'")
        c.execute("PRAGMA threads=8")
        c.execute("PRAGMA temp_directory='/tmp/duckdb_parity_spill'")
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return c

    con = fresh_con()
    since_reconnect = 0

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    report: dict[str, dict] = {}

    def rowhash(norm) -> str:
        h = hashlib.sha256()
        for row in norm:
            h.update(repr(row).encode())
        return h.hexdigest()[:16]

    for name, fn in queries.items():
        if only and name not in only:
            continue
        since_reconnect += 1
        if since_reconnect >= RECONNECT:
            con.close()
            con = fresh_con()
            since_reconnect = 0
            import gc

            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()  # noqa: SLF001
            except Exception:  # noqa: BLE001 — hygiene only
                pass
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            report[name] = {"status": "fail", "error": f"spark {type(exc).__name__}: {exc}"}
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only)")
            sh = rowhash(norm_rows(scols, [tuple(r) for r in srows]))
            report[name] = {
                "status": "rows_only" if srows else "fail",
                "rows": len(srows),
                "hash": sh,
                "spark_hash": sh,
            }
            if not srows:
                failures.append(name)
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            report[name] = {"status": "fail", "error": f"oracle {type(exc).__name__}: {exc}"}
            print(f"FAIL  {name}: oracle error {type(exc).__name__}: {exc}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            report[name] = {"status": "fail", "error": f"columns {sorted(scols)} != {sorted(ocols)}"}
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            report[name] = {"status": "fail", "error": f"rowcount {len(srows)} != {len(orows)}"}
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            continue
        sn = norm_rows(scols, [tuple(r) for r in srows])
        on = norm_rows(ocols, orows)
        # both engines' hashes always recorded (VERDICT r6 #4: a
        # driver-vs-local divergence must be localizable to engine +
        # query without re-deriving anything)
        shash, ohash = rowhash(sn), rowhash(on)
        if sn != on:
            failures.append(name)
            ndiff = sum(1 for a, b in zip(sn, on) if a != b)
            report[name] = {
                "status": "fail",
                "rows": len(sn),
                "error": f"{ndiff}/{len(sn)} rows differ",
                "spark_hash": shash,
                "oracle_hash": ohash,
            }
            print(f"FAIL  {name}: {ndiff}/{len(sn)} rows differ")
            for a, b in zip(sn, on):
                if a != b:
                    print(f"      spark : {a}")
                    print(f"      oracle: {b}")
                    break
        else:
            report[name] = {
                "status": "hash_match",
                "rows": len(srows),
                "hash": shash,
                "spark_hash": shash,
                "oracle_hash": ohash,
            }
            print(f"ok    {name}: {len(srows)} rows")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    out_path = os.environ.get("PARITY_JSON_OUT")
    if out_path:
        summary = {
            "sf_dir": sf_dir,
            "n_queries": len(report),
            "n_hash_match": sum(1 for r in report.values() if r["status"] == "hash_match"),
            "n_rows_only": sum(1 for r in report.values() if r["status"] == "rows_only"),
            "n_fail": len(failures),
            "queries": report,
        }
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=False)
            fh.write("\n")
        print(f"wrote {out_path}")
    hashes_path = os.environ.get("HASHES_JSON_OUT")
    if hashes_path:
        hashes = {
            name: {
                "spark_hash": r.get("spark_hash"),
                "oracle_hash": r.get("oracle_hash"),
                "rows": r.get("rows"),
                "status": r["status"],
            }
            for name, r in report.items()
        }
        with open(hashes_path, "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "queries": hashes}, fh,
                indent=1, sort_keys=True,
            )
            fh.write("\n")
        print(f"wrote {hashes_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
