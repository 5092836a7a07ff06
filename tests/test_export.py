"""Python DataSource write API: exactly-once JSONL export sink."""

from __future__ import annotations

import glob
import json
import os


def test_jsonl_export_round_trip_and_success_marker(spark, tmp_path):
    from pyspark.sql import functions as F

    from econdatapipeline_spark.sources.export import JsonlExportDataSource

    spark.dataSource.register(JsonlExportDataSource)
    out = str(tmp_path / "export")
    df = spark.range(0, 100).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    df.write.format("jsonl_export").option("path", out).mode("append").save()

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    rows = []
    for f in sorted(glob.glob(os.path.join(out, "part-*.jsonl"))):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == 100
    assert {r["id"] for r in rows} == set(range(100))
    assert all(r["name"] == f"n{r['id']}" for r in rows)
    # no temp debris after commit
    assert not glob.glob(os.path.join(out, ".tmp-*"))
    # the export reads back through Spark's own json reader
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 100


def test_jsonl_export_overwrite_replaces_previous(spark, tmp_path):
    from econdatapipeline_spark.sources.export import JsonlExportDataSource

    spark.dataSource.register(JsonlExportDataSource)
    out = str(tmp_path / "export")
    spark.range(0, 10).write.format("jsonl_export").option("path", out).mode(
        "append"
    ).save()
    spark.range(100, 103).write.format("jsonl_export").option("path", out).mode(
        "overwrite"
    ).save()
    rows = []
    for f in glob.glob(os.path.join(out, "part-*.jsonl")):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == [100, 101, 102]


def test_jsonl_export_abort_leaves_no_partial_files(spark, tmp_path):
    """A failing task must not leave committed-looking output."""
    import pytest
    from pyspark.sql import functions as F

    from econdatapipeline_spark.sources.export import JsonlExportDataSource

    spark.dataSource.register(JsonlExportDataSource)
    out = str(tmp_path / "export")
    bad = spark.range(0, 10).select(
        (F.lit(1) / (F.col("id") - 5)).alias("boom")  # div-by-zero at id=5 (ANSI)
    )
    with pytest.raises(Exception):
        bad.write.format("jsonl_export").option("path", out).mode("append").save()
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not glob.glob(os.path.join(out, "part-*.jsonl"))


def test_vacuum_revisions_archives_then_deletes(spark, tmp_path):
    import datetime as dt
    import glob
    import json

    from econdatapipeline_spark.registry import REVISIONS_SCHEMA
    from econdatapipeline_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    old_ts = dt.datetime(2024, 1, 1)
    new_ts = dt.datetime(2025, 6, 1)
    rows = [
        ("ds1", "2023-01-01", "value", 1.0, 2.0, old_ts),
        ("ds1", "2023-02-01", "value", 2.0, 3.0, old_ts),
        ("ds2", "2023-01-01", "value", 5.0, 6.0, new_ts),
    ]
    wh.append_revisions(spark.createDataFrame(rows, REVISIONS_SCHEMA))

    arch = str(tmp_path / "archive")
    removed = wh.vacuum_revisions(dt.datetime(2025, 1, 1), archive_path=arch)
    assert removed == 2
    # live log keeps only the fresh row
    live = wh.revisions().collect()
    assert len(live) == 1 and live[0]["dataset"] == "ds2"
    # archive holds exactly the expired rows, committed
    assert os.path.exists(os.path.join(arch, "_SUCCESS"))
    archived = []
    for f in glob.glob(os.path.join(arch, "part-*.jsonl")):
        with open(f) as fh:
            archived += [json.loads(line) for line in fh]
    assert {(r["dataset"], r["data_date"]) for r in archived} == {
        ("ds1", "2023-01-01"),
        ("ds1", "2023-02-01"),
    }
    # idempotent: nothing left to vacuum
    assert wh.vacuum_revisions(dt.datetime(2025, 1, 1)) == 0


def test_jsonl_export_append_accumulates(spark, tmp_path):
    """Regression: a second mode('append') commit must ADD files, not
    clobber the first export's part names (the retention archive's
    'never lossy' contract depends on it)."""
    from econdatapipeline_spark.sources.export import JsonlExportDataSource

    spark.dataSource.register(JsonlExportDataSource)
    out = str(tmp_path / "export")
    spark.range(0, 10).write.format("jsonl_export").option("path", out).mode(
        "append"
    ).save()
    spark.range(100, 105).write.format("jsonl_export").option("path", out).mode(
        "append"
    ).save()
    rows = []
    for f in glob.glob(os.path.join(out, "part-*.jsonl")):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == list(range(10)) + list(range(100, 105))


def test_jsonl_export_scoped_debris_and_accumulated_success(spark, tmp_path):
    from econdatapipeline_spark.sources.export import JsonlExportDataSource

    spark.dataSource.register(JsonlExportDataSource)
    out = str(tmp_path / "export")
    os.makedirs(out)
    # a temp file from a DIFFERENT in-flight job must survive this
    # job's commit-time debris sweep
    foreign = os.path.join(out, ".tmp-otherjob-deadbeef.jsonl")
    with open(foreign, "w") as fh:
        fh.write('{"id": 1}\n')

    spark.range(0, 10).write.format("jsonl_export").option("path", out).mode(
        "append"
    ).save()
    assert os.path.exists(foreign)
    with open(os.path.join(out, "_SUCCESS")) as fh:
        assert fh.read().strip() == "10"

    # append mode accumulates the _SUCCESS row count
    spark.range(0, 5).write.format("jsonl_export").option("path", out).mode(
        "append"
    ).save()
    with open(os.path.join(out, "_SUCCESS")) as fh:
        assert fh.read().strip() == "15"
    os.remove(foreign)
