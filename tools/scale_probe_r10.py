"""Round-10 scale probes (the r9 20M-probe discipline): big-shape
timings for the new operators on synthetic relations built with
spark.range — no testdata writes, local[32].

- hp_filter / whittaker_level: 20 series x 100k points (2M rows) —
  the max_len-contract shape: each Arrow task runs one O(n)
  sequential solve, 20 run in parallel.
- var_fit / var_irf / cochrane_orcutt: 10,000 groups x 200 rows
  (2M rows) — the many-systems shape: one hash aggregate per group,
  10k VAR/GLS fits in one job.
"""
import time

from pyspark.sql import functions as F

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from econdatapipeline_spark.session import get_spark
from econdatapipeline_spark.operators.timeseries import (
    cochrane_orcutt,
    hp_filter,
    var_fit,
    var_irf,
    whittaker_level,
)

spark = get_spark(app_name="probe10", master="local[32]", shuffle_partitions=64)
spark.range(1_000_000).selectExpr("sum(id)").collect()


def timed(label, df):
    t0 = time.monotonic()
    n = df.count()
    dt = time.monotonic() - t0
    print(f"{label}: {n} rows in {dt:.1f}s", flush=True)


# --- smoothers: 20 series x 100k ---------------------------------------
series = (
    spark.range(2_000_000)
    .select(
        (F.col("id") % 20).cast("string").alias("dataset"),
        (F.col("id") / F.lit(20)).cast("long").alias("date"),
        (
            F.sin(F.col("id") / 5000.0) * 10.0
            + (F.hash("id") % 1000) / 100.0
        ).alias("v"),
    )
)
timed("hp_filter 20x100k", hp_filter(series, "v", max_len=150_000))
timed("whittaker 20x100k", whittaker_level(series, "v", max_len=150_000))

# --- many-systems: 10k groups x 200 rows --------------------------------
panel = (
    spark.range(2_000_000)
    .select(
        (F.col("id") % 10_000).cast("string").alias("dataset"),
        (F.col("id") / F.lit(10_000)).cast("long").alias("date"),
        ((F.hash("id") % 1000) / 100.0 + 10.0).alias("a"),
        ((F.hash("id", F.lit(1)) % 1000) / 100.0 + 5.0).alias("b"),
        ((F.hash("id", F.lit(2)) % 1000) / 100.0 + 1.0).alias("c"),
    )
)
timed("var_fit 10k systems", var_fit(panel, ["a", "b", "c"], order_col="date", lags=2, many_groups=True))
timed("var_irf 10k systems", var_irf(panel, ["a", "b", "c"], order_col="date", lags=2, many_groups=True))
timed(
    "cochrane_orcutt 10k systems",
    cochrane_orcutt(panel, "a", "b", order_col="date"),
)
