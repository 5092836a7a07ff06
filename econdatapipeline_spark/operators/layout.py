"""Z-order (Morton) data layout for multi-dimensional data skipping.

The Delta/Iceberg OPTIMIZE ZORDER pattern rebuilt from first
principles (Morton 1966; the public Delta Lake design): interleave the
bits of several scan-predicate columns into one integer key, then
range-partition and sort the table by that key before writing. Because
the Morton curve preserves locality in EVERY interleaved dimension,
each output file's min/max footer stats become tight rectangles in all
of them at once — so a predicate on ANY of the columns prunes most
files, where a plain sort only serves its leading column.

Everything is pure column expressions (shift/mask/or terms unrolled at
plan-build time — whole-stage codegen, no UDF), so the key costs one
narrow projection; the layout itself is the one range-exchange the
rewrite needs anyway.

At 100 TB: this is a write-amplification-vs-scan-speed trade made once
per table rewrite. The range exchange samples the z-key distribution
(Spark's RangePartitioner) so skewed dimensions still ship balanced
files; bits=16 per dimension keeps the key in one BIGINT for up to 4
dimensions.

This module is the single Morton implementation: the warehouse IO
path (sources/warehouse.Warehouse.write_zordered) delegates here for
its key, and zorder_extents is the k-dimensional audit/contract
surface. No reference analog (the reference stores CSVs in blob
storage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_grid(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Affine-map a numeric column onto the integer grid [0, 2^bits):
    values at/below lo -> 0, at/above hi -> 2^bits - 1. Fixed, caller-
    declared bounds (not a data scan) so the mapping is stable across
    incremental rewrites of different table slices."""
    top = (1 << bits) - 1
    x = col.cast("double")
    scaled = F.floor((x - F.lit(lo)) / F.lit(hi - lo) * F.lit(top + 1))
    return (
        F.when(x <= lo, F.lit(0))
        .when(x >= hi, F.lit(top))
        .otherwise(scaled)
        .cast("long")
    )


def zvalue(
    grid_cols: list[Column],
    bits: int = 16,
) -> Column:
    """Morton-interleave already-gridded integer columns (each in
    [0, 2^bits)) into one BIGINT. Bit b of column j lands at position
    b * k + j, so the curve alternates dimensions at every bit level.
    Unrolls to k * bits shift/mask/add terms — pure codegen."""
    k = len(grid_cols)
    if k < 1:
        raise ValueError("zvalue needs at least one column")
    if k * bits > 62:
        raise ValueError(
            f"{k} dims x {bits} bits = {k * bits} exceeds a signed BIGINT"
        )
    z = F.lit(0).cast("long")
    for j, c in enumerate(grid_cols):
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + j
            ).cast("long")
    return z


def zorder_key(
    df: DataFrame,
    col_bounds: list[tuple[str, float, float]],
    bits: int = 16,
    out_col: str = "z",
) -> DataFrame:
    """Append the z-order key for the given (column, lo, hi) dims."""
    for name, lo, hi in col_bounds:
        if not hi > lo:
            raise ValueError(f"need hi > lo for {name}: lo={lo}, hi={hi}")
    grids = [
        _scale_to_grid(F.col(name), lo, hi, bits)
        for name, lo, hi in col_bounds
    ]
    return df.withColumn(out_col, zvalue(grids, bits))


def zorder_layout(
    df: DataFrame,
    col_bounds: list[tuple[str, float, float]],
    bits: int = 16,
    num_files: int | None = None,
) -> DataFrame:
    """Rewrite ``df`` into z-order: range-partition by the Morton key
    (one sampled exchange) and sort within each partition, so each
    output parquet file covers a contiguous z-range — a small rectangle
    in every interleaved dimension. Write the result with
    ``.write.parquet`` and per-file footer min/max stats do the
    multi-dimensional pruning on read.
    """
    keyed = zorder_key(df, col_bounds, bits)
    if num_files is not None:
        keyed = keyed.repartitionByRange(num_files, F.col("z"))
    else:
        keyed = keyed.repartitionByRange(F.col("z"))
    return keyed.sortWithinPartitions("z")


def zorder_extents(
    df: DataFrame,
    col_bounds: list[tuple[str, float, float]],
    bits: int = 16,
    bucket_bits: int = 4,
) -> DataFrame:
    """Skipping audit: carve the z-keyed table into 2^bucket_bits
    top-bit ranges (a stand-in for output files) and report each
    range's row count plus per-dimension min/max extents. Tight extents
    on every dimension = the pruning the layout buys; compare against
    the same report on an unsorted layout to quantify it.
    """
    keyed = zorder_key(df, col_bounds, bits)
    total_bits = bits * len(col_bounds)
    bucket = F.shiftright(F.col("z"), total_bits - bucket_bits)
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for name, _, _ in col_bounds:
        aggs.append(F.min(name).alias(f"min_{name}"))
        aggs.append(F.max(name).alias(f"max_{name}"))
    return (
        keyed.groupBy(bucket.cast("int").alias("bucket"))
        .agg(*aggs)
    )
