"""Z-order layout tests (operators/layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from econdatapipeline_spark.operators.layout import (
    zorder_extents,
    zorder_key,
    zorder_layout,
    zvalue,
)


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zvalue_matches_reference_morton(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y", zvalue([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _morton2(r["x"], r["y"], 3)


def test_zorder_key_clamps_and_scales(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "v double"
    )
    out = zorder_key(df, [("v", 0.0, 100.0)], bits=4).collect()
    zs = {r["v"]: r["z"] for r in out}
    assert zs[-5.0] == 0 and zs[0.0] == 0
    assert zs[100.0] == 15 and zs[200.0] == 15
    assert zs[50.0] == 8  # 0.5 * 16 = 8, single dim -> identity layout


def test_zorder_key_validates_bounds(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        zorder_key(df, [("v", 5.0, 5.0)])
    with pytest.raises(ValueError):
        zvalue([F.col("v")] * 4, bits=16)  # 64 bits > signed BIGINT


def test_zorder_layout_shrinks_file_rectangles(spark, tmp_path):
    # 64x64 grid of points; 16 output files. A layout sorted by x alone
    # gives each file the FULL y spread; the z-order layout must give
    # every file a small rectangle in both dimensions.
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    zpath = str(tmp_path / "zordered")
    npath = str(tmp_path / "naive")
    bounds = [("x", 0.0, 63.0), ("y", 0.0, 63.0)]
    zorder_layout(df, bounds, bits=6, num_files=16).write.parquet(zpath)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        npath
    )

    import pyarrow.parquet as pq
    import glob as g

    def max_area(path):
        areas = []
        for f in g.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            if md.num_rows == 0:
                continue
            lo = {"x": 1 << 30, "y": 1 << 30}
            hi = {"x": -1, "y": -1}
            for rg in range(md.num_row_groups):
                for ci in range(md.row_group(rg).num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in ("x", "y") and col.statistics is not None:
                        lo[name] = min(lo[name], col.statistics.min)
                        hi[name] = max(hi[name], col.statistics.max)
            areas.append((hi["x"] - lo["x"] + 1) * (hi["y"] - lo["y"] + 1))
        return max(areas)

    # naive: every file spans all 64 y values -> area >= 64 * (64/16)
    # z-order: 16 files over a 64x64 grid -> each is a 16x16 quadrant
    assert max_area(zpath) <= 16 * 16
    assert max_area(npath) >= 64 * 4


def test_zorder_extents_cover_all_rows(spark):
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = zorder_extents(
        df, [("x", 0.0, 31.0), ("y", 0.0, 31.0)], bits=5, bucket_bits=2
    ).collect()
    assert sum(r["n_rows"] for r in out) == 32 * 32
    # 4 top-level buckets of the 2-D Morton curve = the 4 quadrants
    assert len(out) == 4
    for r in out:
        assert (r["max_x"] - r["min_x"]) <= 16
        assert (r["max_y"] - r["min_y"]) <= 16
