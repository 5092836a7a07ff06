"""Round-11 scale probe: the 10k-system VAR shape on BOTH step-chain
paths, after the default path moved to liveness-pruned one-SQL
segments behind lazy checkpoint barriers (_apply_steps_one_sql).

Question it answers: does the new default path beat the explicit
many_groups=True barrier mode at the many-systems shape, and does it
stay sane (the r10 pathology was 40.7s of optimizer walk at 10k
groups)? Shapes mirror tools/scale_probe_r10.py exactly.
"""
import time

from pyspark.sql import functions as F

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from econdatapipeline_spark.session import get_spark
from econdatapipeline_spark.operators.timeseries import var_fit, var_irf

spark = get_spark(app_name="probe11", master="local[32]", shuffle_partitions=64)
spark.range(1_000_000).selectExpr("sum(id)").collect()


def timed(label, build):
    # time CONSTRUCTION + a noop-sink write: eager paths work at build
    # time, and the noop sink materializes EVERY output column —
    # count() would let Catalyst prune projection-only work (bk_filter
    # "ran" in 0.4s under count because the window never executed).
    t0 = time.monotonic()
    df = build()
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    print(f"{label}: in {dt:.1f}s", flush=True)


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
for mg in (True, False):
    timed(f"var_fit 10k systems many_groups={mg}",
          lambda mg=mg: var_fit(panel, ["a", "b", "c"], order_col="date", lags=2, many_groups=mg))
    timed(f"var_irf 10k systems many_groups={mg}",
          lambda mg=mg: var_irf(panel, ["a", "b", "c"], order_col="date", lags=2, many_groups=mg))

# --- round-11 additions at the 2M-row shapes -----------------------------
from econdatapipeline_spark.operators.timeseries import (  # noqa: E402
    bk_filter,
    hamilton_filter,
    var_irf_orth,
)

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
timed("bk_filter 20x100k", lambda: bk_filter(series, "v"))
timed(
    "hamilton_filter 20x100k",
    lambda: hamilton_filter(series, "v", h=24, p=4),
)
timed(
    "var_irf_orth 10k systems many_groups=True",
    lambda: var_irf_orth(
        panel, ["a", "b", "c"], order_col="date", lags=2, horizons=2,
        many_groups=True,
    ),
)
timed(
    "var_irf_orth 10k systems default",
    lambda: var_irf_orth(
        panel, ["a", "b", "c"], order_col="date", lags=2, horizons=2,
    ),
)
