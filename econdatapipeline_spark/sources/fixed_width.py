"""Fixed-width text file source/sink (mainframe & legacy-feed format).

Statistical agencies and banks still publish column-aligned text —
every field at a fixed byte offset, right-padded with spaces. The
reference's world (economic indicator feeds) is exactly where these
appear. Spark has no built-in reader; the idiomatic expression is
``spark.read.text`` (one row per line, splittable, parallel) plus one
``substring`` + ``trim`` + ``try_cast`` column expression per field —
the whole parse stays in whole-stage codegen, and a malformed numeric
becomes null (the engine-wide ``pd.to_numeric(errors='coerce')``
equivalent, functions/parsing.py) rather than a task failure.

Column specs are (name, start, width, type) with 1-based byte starts,
mirroring how fixed-width layouts are documented in feed specs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FixedCol:
    name: str
    start: int  # 1-based byte offset, as feed specs document them
    width: int
    dtype: str = "string"  # any Spark SQL type name


def parse_fixed_width(lines: DataFrame, cols: list[FixedCol]) -> DataFrame:
    """(value: string) lines -> typed columns via substring expressions."""
    if not cols:
        raise ValueError("need at least one column spec")
    out = []
    for c in cols:
        if c.start < 1 or c.width < 1:
            raise ValueError(f"bad spec for {c.name}: start/width must be >= 1")
        raw = F.trim(F.substring(F.col("value"), c.start, c.width))
        # empty field -> null (a run of pad spaces is absence, not "")
        typed = F.when(raw == "", None).otherwise(raw)
        if c.dtype != "string":
            typed = typed.try_cast(c.dtype)
        out.append(typed.alias(c.name))
    return lines.select(*out)


def read_fixed_width(
    spark: SparkSession, path: str, cols: list[FixedCol], skip_header: int = 0
) -> DataFrame:
    """Read a fixed-width file (or directory of them) into typed columns.

    ``skip_header``: drop the first N PHYSICAL lines of each file —
    implemented as a monotonically-safe filter on the per-file line
    offset Spark's text source exposes, so it works across splits (a
    plain LIMIT-complement would be nondeterministic under
    parallelism). Lines shorter than a field's span yield nulls for
    the missing tail — fixed-width feeds often right-trim trailing
    blanks.
    """
    lines = spark.read.text(path)
    if skip_header:
        # text source reads each file in order within a split; use the
        # line's byte offset via input metadata — simplest portable
        # form: filter on a per-file row_number computed from the
        # (file, monotonically increasing id) pair.
        from pyspark.sql import Window  # noqa: PLC0415

        w = Window.partitionBy(F.input_file_name()).orderBy(
            F.monotonically_increasing_id()
        )
        lines = (
            lines.withColumn("__ln", F.row_number().over(w))
            .filter(F.col("__ln") > skip_header)
            .drop("__ln")
        )
    return parse_fixed_width(lines, cols)


def format_fixed_width(df: DataFrame, cols: list[FixedCol]) -> DataFrame:
    """Typed columns -> (value: string) lines, right-padded per spec.

    The sink half (for fixtures and for feeding downstream legacy
    consumers): values longer than their field width are an error a
    silent truncation would corrupt — they raise at action time via
    ``raise_error``, the engine's fail-fast convention.
    """
    parts = []
    for c in cols:
        s = F.coalesce(F.col(c.name).cast("string"), F.lit(""))
        over = F.length(s) > c.width
        checked = F.when(
            over,
            F.raise_error(
                F.concat(
                    F.lit(f"value too wide for {c.name} ({c.width}): "), s
                )
            ),
        ).otherwise(F.rpad(s, c.width, " "))
        parts.append(checked)
    return df.select(F.concat(*parts).alias("value"))
