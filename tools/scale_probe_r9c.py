"""Round-9 session-3 scale probe: the new trend/spectral/agreement/
basket/graph operators at ~1000x contract shapes.

- quantile_regression: 20M (x, y) rows, 5 groups — 8 bounded passes
  (OLS seed + percentile shift + 6 IRLS aggregates).
- arch_test / ar_fit: 20M-row series across 2,000 groups (10k points
  each) — partitioned lag windows, ONE normal-equation aggregate.
- yuen_ttest (threshold path): 20M rows, two arms — two aggregates,
  zero windows (the rank path would sort each arm in one task; the
  auto-gate flips above 2M rows).
- hits: the 20M-edge random digraph from the pagerank probe shape,
  2 iterations, partitioned transport.
- association_rules: 20M (basket, item) rows, baskets of ~8 over a
  100k-item vocabulary — sum(basket^2) pair join.
- fleiss_kappa / cronbach_alpha: 20M ratings over 5M subjects x 4.
- rfm_segments: 20M orders over 2M customers.
- periodogram: one 2M-point series, k <= 12 — the n*k grid.

Synthetic deterministic inputs (arithmetic hash, no RNG) built with
spark.range; wall-clock per op printed and recorded in SCALE.md. Run:

    python tools/scale_probe_r9c.py [op ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from econdatapipeline_spark.session import get_spark

N = 20_000_000


def _series(spark, n=N, groups=2000):
    return spark.range(n).select(
        (F.col("id") % groups).cast("string").alias("dataset"),
        (F.col("id") / groups).cast("long").alias("date"),
        (
            ((F.col("id") * 48271 + 3) % 9973).cast("double") / 100.0
        ).alias("value"),
    )


def probe_quantile_regression(spark):
    from econdatapipeline_spark.operators.timeseries import (
        quantile_regression,
    )

    df = spark.range(N).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (((F.col("id") * 2654435761 + 7) % 997).cast("double") / 99.7).alias("x"),
        (
            ((F.col("id") * 48271 + 3) % 9973).cast("double") / 100.0
        ).alias("y"),
    )
    t0 = time.monotonic()
    quantile_regression(df, "y", "x", tau=0.75, group_col="g").write.format(
        "noop"
    ).mode("overwrite").save()
    return time.monotonic() - t0, "20M rows, 5 groups, seed+shift+6 IRLS passes"


def probe_arch_test(spark):
    from econdatapipeline_spark.operators.timeseries import arch_test

    t0 = time.monotonic()
    arch_test(_series(spark), "value", "date", "dataset", lags=2).write.format(
        "noop"
    ).mode("overwrite").save()
    return time.monotonic() - t0, "20M rows, 2000 partitioned series, lags=2"


def probe_ar_fit(spark):
    from econdatapipeline_spark.operators.timeseries import ar_fit

    t0 = time.monotonic()
    ar_fit(_series(spark), "value", "date", "dataset", order=3).write.format(
        "noop"
    ).mode("overwrite").save()
    return time.monotonic() - t0, "20M rows, 2000 partitioned series, AR(3)"


def probe_yuen_threshold(spark):
    from econdatapipeline_spark.operators.evaluation import yuen_ttest

    df = spark.range(N).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (
            ((F.col("id") * 48271 + 3) % 9973).cast("double") / 100.0
        ).alias("v"),
    )
    t0 = time.monotonic()
    yuen_ttest(df, "v", "arm", "a", "b", method="threshold").write.format(
        "noop"
    ).mode("overwrite").save()
    return time.monotonic() - t0, "20M rows, 2 arms, percentile fences (no sort)"


def probe_hits(spark):
    from econdatapipeline_spark.operators.graph import hits

    edges = spark.range(N).select(
        ((F.col("id") * 48271 + 3) % 2_000_000).alias("src"),
        ((F.col("id") * 2654435761 + 7) % 2_000_000).alias("dst"),
    ).filter("src != dst")
    t0 = time.monotonic()
    hits(edges, iterations=2, partitioned=True).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.monotonic() - t0, "20M edges, 2M nodes, 2 iterations, partitioned"


def probe_association_rules(spark):
    from econdatapipeline_spark.operators.rules import association_rules

    df = spark.range(N).select(
        (F.col("id") / 8).cast("long").alias("basket"),
        ((F.col("id") * 2654435761 + F.col("id") % 8) % 100_000).alias("item"),
    )
    t0 = time.monotonic()
    association_rules(
        df, "basket", "item", min_pair_support=50
    ).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0, "20M rows, 2.5M baskets of ~8, 100k items"


def probe_fleiss_kappa(spark):
    from econdatapipeline_spark.operators.stats import fleiss_kappa

    df = spark.range(N).select(
        (F.col("id") / 4).cast("long").alias("subject"),
        ((F.col("id") * 48271 + 3) % 5).cast("string").alias("label"),
    )
    t0 = time.monotonic()
    fleiss_kappa(df, "subject", "label", n_raters=4).write.format(
        "noop"
    ).mode("overwrite").save()
    return time.monotonic() - t0, "20M ratings, 5M subjects x 4 raters, 5 cats"


def probe_rfm_segments(spark):
    from econdatapipeline_spark.operators.econ import rfm_segments

    df = spark.range(N).select(
        (F.col("id") % 2_000_000).alias("cust"),
        F.date_add(
            F.lit("1995-01-01").cast("date"),
            ((F.col("id") * 48271) % 1400).cast("int"),
        ).alias("d"),
        (
            ((F.col("id") * 2654435761 + 7) % 9973).cast("double") / 10.0
        ).alias("v"),
    )
    t0 = time.monotonic()
    rfm_segments(df, "cust", "d", "v", "1999-01-01", n_bins=5).write.format(
        "noop"
    ).mode("overwrite").save()
    return time.monotonic() - t0, "20M orders, 2M customers, 3 exact quantile sets"


def probe_periodogram(spark):
    from econdatapipeline_spark.operators.timeseries import periodogram

    df = spark.range(2_000_000).select(
        F.lit("s").alias("dataset"),
        F.col("id").alias("date"),
        (
            ((F.col("id") * 48271 + 3) % 9973).cast("double") / 100.0
        ).alias("value"),
    )
    t0 = time.monotonic()
    periodogram(df, "value", "date", "dataset", max_k=12).write.format(
        "noop"
    ).mode("overwrite").save()
    return time.monotonic() - t0, "one 2M-point series, 24M-row k-grid"


def probe_periodogram_indexed(spark):
    from econdatapipeline_spark.operators.timeseries import periodogram

    df = spark.range(2_000_000).select(
        F.lit("s").alias("dataset"),
        F.col("id").alias("date"),
        (
            ((F.col("id") * 48271 + 3) % 9973).cast("double") / 100.0
        ).alias("value"),
    )
    t0 = time.monotonic()
    periodogram(
        df, "value", "date", "dataset", max_k=12, assume_indexed=True
    ).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0, "same 2M series, dense index, zero windows"


PROBES = {
    "quantile_regression": probe_quantile_regression,
    "arch_test": probe_arch_test,
    "ar_fit": probe_ar_fit,
    "yuen_threshold": probe_yuen_threshold,
    "hits": probe_hits,
    "association_rules": probe_association_rules,
    "fleiss_kappa": probe_fleiss_kappa,
    "rfm_segments": probe_rfm_segments,
    "periodogram": probe_periodogram,
    "periodogram_indexed": probe_periodogram_indexed,
}


def main():
    only = sys.argv[1:] or list(PROBES)
    spark = get_spark(
        app_name="scale_probe_r9c", master="local[32]",
        shuffle_partitions=64,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in only:
        wall, shape = PROBES[name](spark)
        print(f"PROBE {name}: {wall:.1f} s  [{shape}]", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
