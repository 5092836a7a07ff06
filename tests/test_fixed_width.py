"""Fixed-width source/sink tests (sources/fixed_width.py)."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.sources.fixed_width import (
    FixedCol,
    format_fixed_width,
    parse_fixed_width,
    read_fixed_width,
)

SPECS = [
    FixedCol("dataset", 1, 10),
    FixedCol("yr", 11, 4, "int"),
    FixedCol("val", 15, 10, "double"),
]


def test_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("retail", 2023, 12.5), ("autos", 2024, 7.25)],
        "dataset string, yr int, val double",
    )
    path = str(tmp_path / "fw")
    format_fixed_width(df, SPECS).coalesce(1).write.text(path)
    back = read_fixed_width(spark, path, SPECS)
    assert sorted((r["dataset"], r["yr"], r["val"]) for r in back.collect()) == [
        ("autos", 2024, 7.25),
        ("retail", 2023, 12.5),
    ]


def test_malformed_numeric_nulls_not_fails(spark):
    lines = spark.createDataFrame(
        [("retail    2023      12.5",), ("autos     20XX      oops",)], "value string"
    )
    rows = {r["dataset"]: r for r in parse_fixed_width(lines, SPECS).collect()}
    assert rows["retail"]["yr"] == 2023
    assert rows["autos"]["yr"] is None and rows["autos"]["val"] is None


def test_short_line_and_blank_fields_null(spark):
    lines = spark.createDataFrame([("retail",)], "value string")
    r = parse_fixed_width(lines, SPECS).collect()[0]
    assert r["dataset"] == "retail" and r["yr"] is None and r["val"] is None


def test_skip_header(spark, tmp_path):
    path = str(tmp_path / "hdr")
    content = "DATASET   YR  VALUE\nretail    2023      12.5\n"
    spark.createDataFrame(
        [(l,) for l in content.rstrip("\n").split("\n")], "value string"
    ).coalesce(1).write.text(path)
    out = read_fixed_width(spark, path, SPECS, skip_header=1).collect()
    assert len(out) == 1 and out[0]["dataset"] == "retail"


def test_too_wide_value_raises(spark):
    df = spark.createDataFrame(
        [("a-very-long-dataset-name", 2023, 1.0)],
        "dataset string, yr int, val double",
    )
    with pytest.raises(Exception, match="too wide"):
        format_fixed_width(df, SPECS).collect()


def test_spec_validation(spark):
    lines = spark.createDataFrame([("x",)], "value string")
    with pytest.raises(ValueError):
        parse_fixed_width(lines, [])
    with pytest.raises(ValueError):
        parse_fixed_width(lines, [FixedCol("a", 0, 5)])
