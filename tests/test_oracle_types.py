"""Oracle output-type invariant (ORACLE_PARITY.md): no oracle may
emit HUGEINT/UHUGEINT/DECIMAL output columns.

DuckDB widens integer SUM() to int128 and keeps decimal arithmetic as
DECIMAL; a typed value-hasher then diverges from Spark's int64/double
even when every value is equal. This bit three times before the audit
existed (round-3 json_extract; round-6 kaplan_meier.n_risk and
bpe_rounds_exact.pair_count, both via uncast SUMs) — the local
comparator normalizes through pandas and masks it, so only this
DESCRIBE-level check catches it before the driver does.

Binding-only (DESCRIBE never executes), so the whole 269-oracle sweep
runs in seconds against the sf0.001 views.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/orders.parquet"),
    reason="driver testdata not present",
)
def test_no_hugeint_or_decimal_oracle_outputs():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    flagged = []
    errors = []
    for name, sql in sorted(entrymod.oracle_sql().items()):
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as exc:  # noqa: BLE001
            errors.append((name, str(exc).splitlines()[0][:200]))
            continue
        for col, typ, *_ in desc:
            if any(b in typ.upper() for b in BAD):
                flagged.append((name, col, typ))
    assert not errors, errors
    assert not flagged, flagged
