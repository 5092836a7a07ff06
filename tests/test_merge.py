"""smart_update contract tests — the reference's executable spec.

Ported from /root/reference/tests/test_azure_connector.py:171-249 (the
only behavioral test in the reference) plus the tolerance-boundary and
multi-field cases FIXTURES.md A5 calls out.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F  # noqa: F401

from econdatapipeline_spark.operators.merge import smart_update

RUN_TS = dt.datetime(2025, 6, 1, 12, 0, 0)


def _df(spark, rows, value_cols=("value",)):
    schema = "date date, " + ", ".join(f"{c} double" for c in value_cols)
    return spark.createDataFrame(rows, schema)


def test_initial_insert(spark):
    existing = _df(spark, [])
    incoming = _df(
        spark,
        [(dt.date(2025, 1, 1), 100.0), (dt.date(2025, 2, 1), 200.0), (dt.date(2025, 3, 1), 300.0)],
    )
    res = smart_update(existing, incoming, ["date"], ["value"], "testdataset", run_ts=RUN_TS)
    assert res.counts() == {"new": 3, "updated": 0, "revisions": 0}
    assert res.merged.count() == 3


def test_update_with_revisions(spark):
    existing = _df(
        spark,
        [(dt.date(2025, 1, 1), 100.0), (dt.date(2025, 2, 1), 200.0), (dt.date(2025, 3, 1), 300.0)],
    )
    incoming = _df(
        spark,
        [(dt.date(2025, 1, 1), 110.0), (dt.date(2025, 2, 1), 200.0), (dt.date(2025, 3, 1), 310.0)],
    )
    res = smart_update(existing, incoming, ["date"], ["value"], "testdataset", run_ts=RUN_TS)
    # Exact reference assertion: updated==2 and revisions==2
    # (test_azure_connector.py:219-236).
    assert res.counts() == {"new": 0, "updated": 2, "revisions": 2}

    revs = {
        (r["data_date"], r["value_field"], r["old_value"], r["new_value"], r["revision_date"])
        for r in res.revisions.collect()
    }
    assert ("2025-01-01", "value", 100.0, 110.0, RUN_TS) in revs
    assert ("2025-03-01", "value", 300.0, 310.0, RUN_TS) in revs

    merged = {(r["date"], r["value"]) for r in res.merged.collect()}
    assert merged == {
        (dt.date(2025, 1, 1), 110.0),
        (dt.date(2025, 2, 1), 200.0),
        (dt.date(2025, 3, 1), 310.0),
    }


def test_tolerance_boundary(spark):
    """|delta| must be strictly greater than 0.001 (azure_data_tracker.py:113).

    Note the reference compares IEEE doubles, so an exactly-at-boundary
    literal like 100.001 actually differs by 0.001000000000004775 and IS
    flagged changed — we pin clearly-inside (0.0005) and clearly-outside
    (0.002) deltas, which is the contract both engines agree on.
    """
    existing = _df(spark, [(dt.date(2025, 1, 1), 100.0), (dt.date(2025, 2, 1), 100.0)])
    incoming = _df(spark, [(dt.date(2025, 1, 1), 100.0005), (dt.date(2025, 2, 1), 100.002)])
    res = smart_update(existing, incoming, ["date"], ["value"], "ds", run_ts=RUN_TS)
    assert res.counts() == {"new": 0, "updated": 1, "revisions": 1}
    rev = res.revisions.collect()[0]
    assert rev["data_date"] == "2025-02-01"


def test_multi_value_field(spark):
    """NYU shape: 3 value cols, change 1 -> 1 update, 1 revision (A5)."""
    cols = ("tbond_rate", "erp_t12m", "expected_return")
    existing = _df(spark, [(dt.date(2025, 1, 1), 0.04, 0.05, 0.09)], cols)
    incoming = _df(spark, [(dt.date(2025, 1, 1), 0.04, 0.06, 0.09)], cols)
    res = smart_update(existing, incoming, ["date"], list(cols), "equityriskpremium", run_ts=RUN_TS)
    assert res.counts() == {"new": 0, "updated": 1, "revisions": 1}
    rev = res.revisions.collect()[0]
    assert rev["value_field"] == "erp_t12m"
    assert rev["old_value"] == 0.05 and rev["new_value"] == 0.06


def test_null_value_skipped(spark):
    """float(None) fails in the reference -> change silently skipped (:128-130)."""
    existing = _df(spark, [(dt.date(2025, 1, 1), None), (dt.date(2025, 2, 1), 5.0)])
    incoming = _df(spark, [(dt.date(2025, 1, 1), 100.0), (dt.date(2025, 2, 1), None)])
    res = smart_update(existing, incoming, ["date"], ["value"], "ds", run_ts=RUN_TS)
    assert res.counts() == {"new": 0, "updated": 0, "revisions": 0}


def test_mixed_insert_update(spark):
    existing = _df(spark, [(dt.date(2025, 1, 1), 1.0)])
    incoming = _df(spark, [(dt.date(2025, 1, 1), 2.0), (dt.date(2025, 2, 1), 3.0)])
    res = smart_update(existing, incoming, ["date"], ["value"], "ds", run_ts=RUN_TS)
    assert res.counts() == {"new": 1, "updated": 1, "revisions": 1}
    assert res.merged.count() == 2


def test_compact_collapses_small_files(spark, tmp_path):
    from econdatapipeline_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(100).selectExpr("id", "id * 2 as v")
    for _ in range(5):
        wh.append(df.repartition(4), "log")
    import os

    files_before = [
        f for f in os.listdir(wh.path("log")) if f.endswith(".parquet")
    ]
    assert len(files_before) >= 20
    n = wh.compact("log")
    files_after = [
        f for f in os.listdir(wh.path("log")) if f.endswith(".parquet")
    ]
    assert n == 1 and len(files_after) == 1
    got = wh.read("log").groupBy().agg(
        __import__("pyspark.sql.functions", fromlist=["sum"]).sum("v")
    ).collect()[0][0]
    assert got == 5 * sum(2 * i for i in range(100))


def test_failed_write_leaves_table_intact_and_no_staging(spark, tmp_path):
    import os

    import pytest
    from pyspark.sql import functions as F
    from econdatapipeline_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    wh.write_dataset(spark.range(10).selectExpr("id", "id * 2 as v"), "t")
    before = sorted(r["id"] for r in wh.read("t").collect())

    # a plan that fails mid-job (ANSI division by zero on some rows)
    bad = spark.range(10).select("id", (F.lit(1) / (F.col("id") - 5)).alias("v"))
    with pytest.raises(Exception):
        wh.write_dataset(bad, "t")

    assert sorted(r["id"] for r in wh.read("t").collect()) == before
    assert not os.path.isdir(wh.path("t") + "__staging")
