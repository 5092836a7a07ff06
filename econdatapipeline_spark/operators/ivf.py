"""IVF (inverted-file) approximate nearest-neighbor search.

The third leg of the similarity-search surface (with brute force and
sign-bucket LSH, operators/similarity.py): partition the corpus into
``nlist`` Voronoi cells around learned centroids, then search only the
``nprobe`` cells nearest each query. This is the structure behind
FAISS-style IVF indexes, expressed entirely as DataFrame ops:

- **train**: deterministic k-means — seeds are the ``nlist`` lowest-id
  vectors, then a fixed number of Lloyd iterations. Assignment is a
  broadcast join against the (tiny) centroid table + ``min_by`` argmin;
  the centroid update is posexplode -> per-(cluster, dim) mean -> re-
  assemble. Every step is a keyed aggregation; nothing is quadratic.
- **index**: one map-side broadcast-join pass assigning each corpus
  vector to its nearest centroid; persisted as an extra int column
  (at 100 TB: the partition/bucket column of the embedding table).
- **search**: queries pick their ``nprobe`` nearest centroids (driver-
  size work), then an equi-join on cell id scores only those cells —
  the shuffle is keyed by cell, bounded by cell occupancy, never
  all-pairs. Recall/cost is tuned by nlist x nprobe exactly as in IVF
  literature.

Determinism: seeds by lowest id, fixed iteration count, stable argmin
tie-break on cluster id — same data in, same index out, so results are
reproducible (and testable against brute force for recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.vectors import cosine
from econdatapipeline_spark.sources.tables import fan_out


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment: Arrow-batched numpy argmin.

    The centroid table is tiny by construction (nlist rows), so it ships
    to every task inside the kernel closure — the numpy analog of a
    broadcast join. Each Arrow batch is scored as one (batch x nlist)
    distance matrix and reduced with argmin: a narrow, shuffle-free pass
    over the corpus, where the column-expression form (join + zip_with
    sq-dist + min_by) evaluated interpreted per (vector, centroid) pair
    and needed a grouped argmin shuffle. Ties break to the lowest
    cluster id (argmin returns the first minimum over the sorted
    cluster axis), matching the struct(d2, cluster) min_by tie-break.
    """
    import numpy as np
    import pandas as pd

    rows = centroids.select("cluster", "centroid").collect()
    rows.sort(key=lambda r: r["cluster"])
    cl = np.array([r["cluster"] for r in rows], dtype=np.int32)
    cm = np.array([list(r["centroid"]) for r in rows], dtype=np.float64)
    schema = f"{id_col} long, cluster int, {vec_col} array<float>"

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            # |v-c|^2 = |v|^2 - 2 v.c + |c|^2; |v|^2 is constant per row,
            # so argmin needs only the cross term and the centroid norms.
            d2 = (cm * cm).sum(axis=1)[None, :] - 2.0 * (vm @ cm.T)
            idx = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cluster": cl[idx], vec_col: pdf[vec_col]}
            )

    return vectors.select(id_col, vec_col).mapInPandas(kernel, schema)


def train_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd k-means -> (cluster, centroid) table."""
    corpus = fan_out(corpus)
    # Seeds: the nlist lowest-id vectors (tiny, deterministic; collected
    # via limit so the driver never sees more than nlist rows).
    seeds = corpus.orderBy(id_col).limit(nlist).select(
        F.col(vec_col).alias("centroid"),
        (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cluster"),
    )
    centroids = seeds.select("cluster", "centroid")
    spark = corpus.sparkSession
    schema = "cluster int, centroid array<float>"
    for _ in range(iterations):
        assigned = _assign(corpus, centroids, id_col, vec_col)
        dims = assigned.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("pos", "x")
        )
        means = dims.groupBy("cluster", "pos").agg(
            F.avg(F.col("x").cast("double")).alias("m")
        )
        updated = (
            means.groupBy("cluster")
            .agg(F.sort_array(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cluster",
                F.transform(F.col("pm"), lambda s: s["m"].cast("float")).alias("centroid"),
            )
        )
        # Materialize the (nlist x dim) state each round — the standard
        # iterative-algorithm pattern: without it, iteration k's lazy plan
        # re-executes iterations 1..k-1, and plan depth grows linearly.
        centroids = spark.createDataFrame(
            [(r["cluster"], r["centroid"]) for r in updated.collect()], schema
        )
    return centroids


def build_index(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus + cell assignment — the inverted file, as a column."""
    return _assign(fan_out(corpus), centroids, id_col, vec_col)


def ivf_topk(
    index: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors scanning only nprobe cells per query."""
    qc = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).join(F.broadcast(centroids)).select(
        "query_id", "qv", "cluster",
        _sq_dist(F.col("qv"), F.col("centroid")).alias("d2"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("cluster").asc())
    probes = (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "qv", "cluster")
    )
    cand = probes.join(
        index.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cluster"),
        "cluster",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
