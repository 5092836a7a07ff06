"""Round-9 scale probe: the round-8/9 statistical additions at ~1000x
shapes (VERDICT r8 #8 + #2) — cox_ph_multi / ipw_ate_multi /
cumulative_incidence at 20M subjects, weibull_aft / grays_test (new
this round) at the same scale, and the k-means|| seeding race at
2M x 64 / k = 64 (rounds-not-k corpus passes).

Synthetic deterministic inputs (arithmetic-hash, no RNG) built with
spark.range; wall-clock per op printed and recorded in SCALE.md. Run:

    python tools/scale_probe_r9.py [op ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from econdatapipeline_spark.session import get_spark

N = 20_000_000


def _subjects(spark, n=N):
    """n survival subjects: ~2.5M distinct durations, 80% events,
    one binary + one continuous covariate, 3 groups, 2 causes."""
    return spark.range(n).select(
        (1 + (F.col("id") * 48271 + 11) % 2_499_999).alias("duration"),
        ((F.col("id") % 10) < 8).cast("int").alias("event"),
        (F.col("id") % 2).cast("double").alias("x1"),
        (
            ((F.col("id") * 2654435761 + 7) % 997).cast("double") / 997.0
        ).alias("x2"),
        F.when(F.col("id") % 3 == 0, "A")
        .when(F.col("id") % 3 == 1, "B")
        .otherwise("C")
        .alias("grp"),
        F.when((F.col("id") * 7919) % 5 < 3, "a").otherwise("b").alias(
            "cause"
        ),
    )


def probe_cox_ph_multi(spark):
    from econdatapipeline_spark.operators.survival import cox_ph_multi

    t0 = time.monotonic()
    cox_ph_multi(
        _subjects(spark), "duration", "event", ["x1", "x2"], rounds=4
    ).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0, "20M subjects, p=2, 4 Newton rounds, ~2.5M event times"


def probe_ipw_ate_multi(spark):
    from econdatapipeline_spark.operators.evaluation import ipw_ate_multi

    subj = spark.range(N).select(
        ((F.col("id") % 7) < 3).cast("int").alias("treat"),
        (
            ((F.col("id") * 48271 + 3) % 9973).cast("double") / 100.0
        ).alias("y"),
        (F.col("id") % 2).cast("double").alias("x1"),
        (
            ((F.col("id") * 2654435761 + 7) % 997).cast("double") / 997.0
        ).alias("x2"),
    )
    t0 = time.monotonic()
    ipw_ate_multi(
        subj, "treat", "y", ["x1", "x2"], rounds=4
    ).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0, "20M subjects, p=2, 4 IRLS rounds"


def probe_cumulative_incidence(spark):
    from econdatapipeline_spark.operators.survival import (
        cumulative_incidence,
    )

    t0 = time.monotonic()
    cumulative_incidence(
        _subjects(spark), causes=["a", "b"]
    ).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0, "20M subjects, 2 causes, ~2.5M distinct times"


def probe_weibull_aft(spark):
    from econdatapipeline_spark.operators.survival import weibull_aft

    t0 = time.monotonic()
    weibull_aft(
        _subjects(spark), "duration", "event", ["x1", "x2"], rounds=8
    ).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0, "20M subjects, p=2, 8 Newton rounds"


def probe_grays_test(spark):
    from econdatapipeline_spark.operators.survival import grays_test

    t0 = time.monotonic()
    grays_test(
        _subjects(spark),
        "grp",
        ["A", "B", "C"],
        "duration",
        "event",
        "cause",
        "a",
    ).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0, "20M subjects, 3 groups, 2 causes, ~2.5M distinct times"


def probe_kmeanspar_seeds(spark):
    from econdatapipeline_spark.operators.kmeans import (
        _kmeanspar_md5_seeds,
    )

    d = 64
    cols = [
        (
            ((F.col("id") * (j * 2654435761 + 40503) % 999983).cast(
                "double"
            ) / 999983.0) * 2.0 - 1.0
        ).alias(f"c{j}")
        for j in range(1, d + 1)
    ]
    vecs = spark.range(2_000_000).select(
        F.col("id"), F.array(*cols).alias("v")
    ).localCheckpoint(eager=True)
    t0 = time.monotonic()
    seeds = _kmeanspar_md5_seeds(vecs, 64)
    assert len(set(seeds)) == 64
    return time.monotonic() - t0, "2M x 64, k=64, ell=128, 5 rounds (12 corpus passes vs 63 sequential races)"


PROBES = {
    "cox_ph_multi": probe_cox_ph_multi,
    "ipw_ate_multi": probe_ipw_ate_multi,
    "cumulative_incidence": probe_cumulative_incidence,
    "weibull_aft": probe_weibull_aft,
    "grays_test": probe_grays_test,
    "kmeanspar_seeds": probe_kmeanspar_seeds,
}


def main():
    only = sys.argv[1:] or list(PROBES)
    spark = get_spark(
        app_name="scale_probe_r9", master="local[32]",
        shuffle_partitions=64,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in only:
        wall, shape = PROBES[name](spark)
        print(f"PROBE {name}: {wall:.1f} s  [{shape}]", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
