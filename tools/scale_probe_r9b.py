"""Round-9 continuation scale probe: the new causal/GLM/eval
operators at ~1000x contract shapes — aipw_ate / logistic_glm /
iv_2sls at 20M subjects, roc_auc_ci at 20M scored rows (1M distinct
scores), fleming_harrington at 20M subjects with ~2.5M distinct
event times.

Synthetic deterministic inputs (arithmetic hash, no RNG) built with
spark.range; wall-clock per op printed and recorded in SCALE.md. Run:

    python tools/scale_probe_r9b.py [op ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from econdatapipeline_spark.session import get_spark

N = 20_000_000


def _causal(spark, n=N):
    return spark.range(n).select(
        ((F.col("id") % 7) < 3).cast("int").alias("treat"),
        (
            ((F.col("id") * 48271 + 3) % 9973).cast("double") / 100.0
        ).alias("y"),
        (F.col("id") % 2).cast("double").alias("x1"),
        (
            ((F.col("id") * 2654435761 + 7) % 997).cast("double") / 997.0
        ).alias("x2"),
    )


def probe_aipw_ate(spark):
    from econdatapipeline_spark.operators.evaluation import aipw_ate

    t0 = time.monotonic()
    aipw_ate(
        _causal(spark), "treat", "y", ["x1", "x2"], rounds=4
    ).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0, "20M subjects, p=2, 4 IRLS rounds + 2 arm OLS + augmented pass"


def probe_logistic_glm(spark):
    from econdatapipeline_spark.operators.glm import logistic_glm

    subj = spark.range(N).select(
        ((F.col("id") * 7919 + 1) % 5 < 2).cast("int").alias("y"),
        (F.col("id") % 2).cast("double").alias("x1"),
        (
            ((F.col("id") * 2654435761 + 7) % 997).cast("double") / 997.0
        ).alias("x2"),
    )
    t0 = time.monotonic()
    logistic_glm(subj, "y", ["x1", "x2"], rounds=6).write.format(
        "noop"
    ).mode("overwrite").save()
    return time.monotonic() - t0, "20M subjects, p=2, 6 Newton rounds + SE solves"


def probe_iv_2sls(spark):
    from econdatapipeline_spark.operators.evaluation import iv_2sls

    subj = spark.range(N).select(
        (
            ((F.col("id") * 48271 + 3) % 9973).cast("double") / 100.0
        ).alias("y"),
        (
            ((F.col("id") * 2654435761 + 7) % 997).cast("double") / 10.0
        ).alias("x"),
        (
            ((F.col("id") * 69621 + 11) % 1009).cast("double") / 10.0
        ).alias("z"),
        (F.col("id") % 5).alias("g"),
    )
    t0 = time.monotonic()
    iv_2sls(subj, "y", "x", "z", "g").write.format("noop").mode(
        "overwrite"
    ).save()
    return time.monotonic() - t0, "20M rows, 5 groups, one aggregate + closed forms"


def probe_roc_auc_ci(spark):
    from econdatapipeline_spark.operators.evaluation import roc_auc_ci

    scored = spark.range(N).select(
        ((F.col("id") * 7919) % 3 < 1).cast("int").alias("label"),
        (
            ((F.col("id") * 48271 + F.col("id") % 3 * 137) % 999983)
            .cast("double")
            / 999983.0
        ).alias("score"),
    )
    t0 = time.monotonic()
    roc_auc_ci(scored, "label", "score").write.format("noop").mode(
        "overwrite"
    ).save()
    return time.monotonic() - t0, "20M scored rows, ~1M distinct scores, distributed two-pass cumsum"


def probe_fleming_harrington(spark):
    from econdatapipeline_spark.operators.survival import (
        fleming_harrington,
    )

    subj = spark.range(N).select(
        (1 + (F.col("id") * 48271 + 11) % 2_499_999).alias("duration"),
        ((F.col("id") % 10) < 8).cast("int").alias("event"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("grp"),
    )
    t0 = time.monotonic()
    fleming_harrington(
        subj, "grp", "a", "b", rho=1.0
    ).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0, "20M subjects, ~2.5M distinct times, distributed exclusive ln-cumsum"


PROBES = {
    "aipw_ate": probe_aipw_ate,
    "logistic_glm": probe_logistic_glm,
    "iv_2sls": probe_iv_2sls,
    "roc_auc_ci": probe_roc_auc_ci,
    "fleming_harrington": probe_fleming_harrington,
}


def main():
    only = sys.argv[1:] or list(PROBES)
    spark = get_spark(
        app_name="scale_probe_r9b", master="local[32]",
        shuffle_partitions=64,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in only:
        wall, shape = PROBES[name](spark)
        print(f"PROBE {name}: {wall:.1f} s  [{shape}]", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
