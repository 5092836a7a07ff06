"""Corpus file-format ingestion: JSONL, CSV, ORC next to Parquet.

Real document corpora arrive as JSONL dumps and CSV exports long before
anyone converts them to Parquet. These readers enforce three rules that
matter at 100 TB and are easy to get wrong:

1. **Explicit schema, never inference.** Schema inference reads the
   whole input once before the real job (a second full scan at corpus
   scale) and silently widens types on dirty data. Every reader here
   requires a DDL schema string.
2. **Quarantine, don't crash / don't drop.** PERMISSIVE mode routes
   unparseable lines into a ``_corrupt_record`` column;
   ``split_corrupt`` separates clean rows from quarantined raw lines so
   a bad shard is auditable instead of silently shrinking the corpus.
3. **Splittability is the reader's problem.** Plain-text JSONL/CSV
   split by line offsets for free; the writers emit the same layout so
   round-trips stay distributed. (Compressed .gz corpora do NOT split —
   at scale, recompress to zstd-parquet on landing, which is what
   ``to_parquet_landing`` does.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: str) -> str:
    return f"{schema}, {CORRUPT_COL} string"


_PARSE_OPTS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}


def _parse_lines(lines: DataFrame, parsed) -> DataFrame:
    """Expand a parsed struct, guaranteeing the raw line lands in the
    quarantine column whenever the parse produced nothing usable.

    Deliberately NOT the file-source corrupt-record pseudo-column:
    parsing as a *function* over a text scan has none of that path's
    restrictions (a filter touching only the quarantine column is
    illegal against raw JSON/CSV scans —
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) and keeps the
    original line verbatim for the audit trail.
    """
    out = lines.select(F.col("value").alias("__raw"), parsed.alias("__r"))
    return out.select(
        "__r.*",
        F.coalesce(F.col(f"__r.{CORRUPT_COL}"), F.when(F.col("__r").isNull(), F.col("__raw"))).alias("__bad"),
    ).drop(CORRUPT_COL).withColumnRenamed("__bad", CORRUPT_COL)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Line-delimited JSON with corrupt-line quarantine column."""
    lines = spark.read.text(path)
    return _parse_lines(
        lines, F.from_json("value", _with_corrupt(schema), _PARSE_OPTS)
    )


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """CSV over a line scan + from_csv.

    ``header=True`` drops lines equal to the header built from the
    schema's field names (per-file header position is meaningless after
    a distributed line scan; a data row that exactly equals the header
    is indistinguishable from one — acceptable for machine exports).
    """
    lines = spark.read.text(path)
    if header:
        names = [f.split()[0].strip("`") for f in schema.split(",")]
        lines = lines.filter(F.col("value") != ",".join(names))
    return _parse_lines(
        lines, F.from_csv("value", _with_corrupt(schema), _PARSE_OPTS)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC is self-describing (schema in the footer, like Parquet)."""
    return spark.read.orc(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_quarantine_col, quarantined_full_rows).

    The quarantine side keeps every column (partial parses + the raw
    line) — both for the audit trail and because Spark refuses a scan
    that references ONLY the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    """
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def to_parquet_landing(df: DataFrame, path: str) -> None:
    """Rewrite a text-format corpus as zstd Parquet on landing.

    One pass at ingest buys every later query columnar pruning,
    row-group statistics, and splittable compression — text formats
    are for transport, not for being queried twice.
    """
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)
