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
