"""SemDeDup-style semantic deduplication over an embedding column.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): cluster the embedding space, and
within each cluster drop all but one member of every semantic-duplicate
group, keeping the member LEAST similar to the cluster centroid (the
"edge" example carries the most marginal information).

This implementation is cluster-source-agnostic: pass any (id, cluster)
assignment — k-means cells from ``operators.ivf.build_index`` are the
paper-faithful choice — or let it default to sign-LSH buckets
(``functions.vectors.sign_bucket``), which keeps the whole operator
SQL-expressible for the exact-value oracle.

Pruning rule (deterministic, one join — no greedy chain): doc *j* is
dropped iff some doc *i* in the same cluster has cos(i, j) >= tau and
*i* has strictly lower centroid-similarity than *j* (ties broken by id
ascending). Survivors are exactly the minimal elements of the
dominance relation — order-free, so the distributed answer equals the
set-logic oracle row-for-row.

Scale shape: centroids are an exploded decimal-exact mean (map-side
partial sums, |clusters| x dim output); the pair stage is an in-cluster
self-join bounded by cluster cardinality (same Σ bucket² bound as
MinHash LSH); the dominance test adds no extra shuffle beyond the pair
join. Nothing is all-pairs, nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.vectors import dot, norm, sign_bucket
from econdatapipeline_spark.sources.tables import fan_out


def cluster_centroids(
    assigned: DataFrame,
    cluster_col: str = "cluster",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, centroid array<double>) — decimal-exact per-dim means.

    Same engine-portable arithmetic as similarity.embedding_centroids:
    exact decimal(28,12) sums divided by counts, rounded to 6 at the
    edge, re-assembled in dimension order.
    """
    ex = assigned.select(
        F.col(cluster_col).alias("cluster"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
    )
    means = ex.groupBy("cluster", "pos").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("m")
    )
    return means.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
        ).alias("centroid")
    )


def semantic_dedup(
    df: DataFrame,
    tau: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    clusters: DataFrame | None = None,
    dims: tuple[int, ...] = (0, 7, 19, 33, 51),
) -> DataFrame:
    """Per-document SemDeDup verdicts: (id, cluster, centroid_cos, kept).

    ``clusters``: optional (id_col, cluster) assignment (e.g. IVF cell
    ids). Defaults to sign-LSH buckets over ``dims`` — deterministic
    and oracle-portable. ``kept=false`` rows are the semantic
    duplicates a curation pass would drop; downstream keeps
    ``filter(kept)``.
    """
    base = fan_out(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if clusters is not None:
        base = base.join(
            clusters.select(F.col(id_col).alias("id"), "cluster"), "id"
        )
    else:
        base = base.withColumn("cluster", sign_bucket(F.col("v"), dims))
    cents = cluster_centroids(base, "cluster", "v")
    scored = (
        base.join(cents, "cluster")
        .select(
            "cluster",
            "id",
            "v",
            norm(F.col("v")).alias("n"),
            F.round(
                dot(F.col("v"), F.col("centroid"))
                / (norm(F.col("v")) * norm(F.col("centroid"))),
                6,
            ).alias("centroid_cos"),
        )
    )
    a, b = scored.alias("a"), scored.alias("b")
    # a dominates b: same cluster, near-dup, and a is the better keep
    # (lower centroid similarity, id-ascending tiebreak)
    dominated = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.id") != F.col("b.id"))
            & (
                (F.col("a.centroid_cos") < F.col("b.centroid_cos"))
                | (
                    (F.col("a.centroid_cos") == F.col("b.centroid_cos"))
                    & (F.col("a.id") < F.col("b.id"))
                )
            ),
        )
        .filter(
            F.round(
                dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 6
            )
            >= tau
        )
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    return (
        scored.join(dominated.withColumn("dom", F.lit(True)), "id", "left")
        .select(
            "id",
            "cluster",
            "centroid_cos",
            F.col("dom").isNull().alias("kept"),
        )
    )
