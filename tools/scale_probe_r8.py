"""Round-8 scale probe: the standing top-five bench queries at
~1000x shapes (VERDICT r7 #7 — every >4 s query gets a 20M-scale
shape measurement on record).

Synthetic deterministic inputs (md5/arithmetic-derived, no RNG) in
/tmp; wall-clock per op printed and recorded in SCALE.md. Run:

    python tools/scale_probe_r8.py [op ...]

Ops: pca_power pagerank_partitioned bradley_terry als_factorize
mmr_select (default: all).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from econdatapipeline_spark.session import get_spark


def _embeddings(spark, n=2_000_000, d=64):
    """n deterministic d-dim vectors: component j of row i is a cheap
    arithmetic hash scaled into [-1, 1]."""
    cols = [
        (
            ((F.col("id") * (j * 2654435761 + 40503) % 999983).cast("double")
             / 999983.0) * 2.0 - 1.0
        ).alias(f"c{j}")
        for j in range(1, d + 1)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*cols).alias("embedding"),
    )


def probe_pca_power(spark):
    from econdatapipeline_spark.operators.pca import pca_power

    x = _embeddings(spark)
    t0 = time.monotonic()
    pca_power(x, dims=64, rounds=8).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.monotonic() - t0, "2M x 64, 8 rounds"


def probe_pagerank_partitioned(spark):
    from econdatapipeline_spark.operators.graph import pagerank

    # 20M edges over 2M nodes, out-degree 10, arithmetic-hash targets
    edges = spark.range(20_000_000).select(
        (F.col("id") % 2_000_000).alias("src"),
        ((F.col("id") * 2654435761 + 12289) % 2_000_000).alias("dst"),
    )
    t0 = time.monotonic()
    pagerank(
        edges, iterations=3, partitioned=True
    ).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0, "20M edges, 2M nodes, 3 rounds, partitioned"


def probe_bradley_terry(spark):
    from econdatapipeline_spark.operators.preference import bradley_terry

    # 20M comparisons over 200k items (forces the distributed path:
    # n_items > driver_items_threshold)
    cmp_df = spark.range(20_000_000).select(
        (F.col("id") % 200_000).alias("a"),
        ((F.col("id") * 48271 + 11) % 200_000).alias("b"),
    ).select(
        F.least("a", "b").alias("winner"),
        F.greatest("a", "b").alias("loser"),
    ).filter(F.col("winner") != F.col("loser"))
    t0 = time.monotonic()
    bradley_terry(cmp_df, rounds=8).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.monotonic() - t0, "20M comparisons, 200k items, 8 MM rounds (distributed path)"


def probe_als_factorize(spark):
    from econdatapipeline_spark.operators.als import als_factorize

    ratings = spark.range(20_000_000).select(
        (F.col("id") % 1_000_000).alias("user"),
        ((F.col("id") * 2654435761 + 7) % 100_000).alias("item"),
        ((F.col("id") % 5) + 1).cast("double").alias("r"),
    )
    t0 = time.monotonic()
    uf, itf, rmse = als_factorize(ratings, k=4, iters=3, track_rmse="final")
    uf.write.format("noop").mode("overwrite").save()
    itf.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0, "20M ratings, 1M users x 100k items, k=4, 3 sweeps"


def probe_mmr_select(spark):
    from econdatapipeline_spark.operators.diversity import mmr_select

    cands = _embeddings(spark).select(
        "vec_id",
        ((F.col("vec_id") % 997).cast("double") / 997.0).alias("rel"),
        "embedding",
    )
    t0 = time.monotonic()
    mmr_select(cands, k=10).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.monotonic() - t0, "2M candidates x 64, k=10"


PROBES = {
    "pca_power": probe_pca_power,
    "pagerank_partitioned": probe_pagerank_partitioned,
    "bradley_terry": probe_bradley_terry,
    "als_factorize": probe_als_factorize,
    "mmr_select": probe_mmr_select,
}


def main():
    only = sys.argv[1:] or list(PROBES)
    spark = get_spark(
        app_name="scale_probe_r8", master="local[32]",
        shuffle_partitions=64,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in only:
        wall, shape = PROBES[name](spark)
        print(f"PROBE {name}: {wall:.1f} s  [{shape}]", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
