"""Loaders for the benchmark/test star-schema tables.

One quirk: the driver-generated ``events.parquet`` stores ``ts`` as
Parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects
([PARQUET_TYPE_ILLEGAL]). ``spark.sql.legacy.parquet.nanosAsLong``
reads it as nanosecond longs; ``load_events`` then converts to a
proper TimestampType (microsecond floor — byte-identical to how
DuckDB/pandas surface the same values).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        # Integer division: float division of int64 nanos exceeds the
        # 53-bit double mantissa and corrupts the low microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def fan_out(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Spread a few-partition input across cores before a compute-heavy
    narrow transform (shingling, hashing, vector math).

    A small table often arrives as ONE parquet split, which would serialize
    an expensive map stage onto a single core. Repartitioning a KB..MB-sized
    input is a trivial shuffle; the 8-16x map parallelism it buys dominates.
    No-op when the scan already has >= target splits — the 100 TB case,
    where reshuffling the input would be the bug, not the fix.

    The default target is capped at 16: a few-partition input is by
    definition small (Spark splits big splittable files by
    maxPartitionBytes on its own), and beyond ~16 tasks the per-task
    scheduling overhead outweighs extra parallelism on KB..MB inputs.
    Reserve fan_out for operators whose per-row work is heavy; for cheap
    kernels the extra shuffle is pure overhead.
    """
    spark = df.sparkSession
    target = parallelism or min(spark.sparkContext.defaultParallelism, 16)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
