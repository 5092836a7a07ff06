"""Mechanical oracle output-type audit (the ORACLE_PARITY.md invariant).

DuckDB silently widens integer SUM() to HUGEINT (int128) and keeps
round()/decimal arithmetic as DECIMAL; a typed value-hasher then
diverges from Spark's int64/double even when every value is equal —
the round-3 `json_extract` driver red, and (round 7 diagnosis) the
round-6 `kaplan_meier` / `bpe_rounds_exact` driver reds, where
`SUM(...) OVER` and an uncast final `SUM(freq)` leaked HUGEINT
n_risk / pair_count columns that the local pandas-normalizing
comparator masked.

This runs `DESCRIBE (<oracle>)` for EVERY oracle_sql() entry against
the sf views (binding only — no execution) and flags any output
column typed HUGEINT/UHUGEINT/DECIMAL. Zero flags is the invariant;
a DECIMAL output is only acceptable when the Spark side emits decimal
too (none do today — Spark-side outputs are long/double/string/date/
bool/arrays), so it flags unconditionally.

Usage: python tools/audit_oracle_types.py [sf_dir]
Exit 0 = clean, 1 = flagged columns (listed on stdout).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    flagged: list[tuple[str, str, str]] = []
    errors: list[tuple[str, str]] = []
    oracles = entrymod.oracle_sql()
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as exc:  # noqa: BLE001
            errors.append((name, str(exc).splitlines()[0][:200]))
            continue
        for col, typ, *_ in desc:
            if any(b in typ.upper() for b in BAD):
                flagged.append((name, col, typ))

    for name, col, typ in flagged:
        print(f"FLAG {name}.{col}: {typ}")
    for name, err in errors:
        print(f"ERROR {name}: {err}")
    print(
        f"audited {len(oracles)} oracles: "
        f"{len(flagged)} flagged columns, {len(errors)} describe errors"
    )
    return 1 if (flagged or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
