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
    # time CONSTRUCTION + count: the many_groups path materializes
    # eagerly inside the operator, so building the DataFrame is where
    # its work happens.
    t0 = time.monotonic()
    n = build().count()
    dt = time.monotonic() - t0
    print(f"{label}: {n} rows in {dt:.1f}s", flush=True)


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
