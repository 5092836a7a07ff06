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

from econdatapipeline_spark.functions.vectors import dot, norm
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
    """Deterministic Lloyd k-means -> (cluster, centroid) table.

    Each iteration is ONE narrow, shuffle-free job: an Arrow-batched
    kernel assigns every vector to its nearest current centroid (the
    centroid matrix ships in the task closure) and emits per-batch
    partial sums — at most nlist rows of (cluster, count, vector-sum)
    per batch. The driver reduces the partials (nlist x partitions
    rows, trivially small) into the next centroid matrix. This is the
    classic map-side-combine formulation of Lloyd's update: the only
    cross-node traffic per round is the partial-sum table, independent
    of corpus size — the structure that holds at 100 TB, where the
    previous posexplode -> per-(cluster, dim) mean shuffled the entire
    corpus twice per iteration.
    """
    import numpy as np
    import pandas as pd

    corpus = fan_out(corpus).select(id_col, vec_col)
    spark = corpus.sparkSession
    # Seeds: the nlist lowest-id vectors (tiny, deterministic; collected
    # via limit so the driver never sees more than nlist rows).
    seed_rows = corpus.orderBy(id_col).limit(nlist).collect()
    cm = np.array([list(r[vec_col]) for r in seed_rows], dtype=np.float64)

    for _ in range(iterations):
        frozen = cm  # bind by value; the closure must not see later updates

        def partial_kernel(batches, cm=frozen):
            for pdf in batches:
                if pdf.empty:
                    continue
                vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                d2 = (cm * cm).sum(axis=1)[None, :] - 2.0 * (vm @ cm.T)
                idx = d2.argmin(axis=1)
                clusters, inverse = np.unique(idx, return_inverse=True)
                sums = np.zeros((len(clusters), cm.shape[1]))
                np.add.at(sums, inverse, vm)
                counts = np.bincount(inverse)
                yield pd.DataFrame(
                    {
                        "cluster": clusters.astype("int32"),
                        "cnt": counts.astype("int64"),
                        "vsum": list(sums),
                    }
                )

        partials = corpus.mapInPandas(
            partial_kernel, "cluster int, cnt long, vsum array<double>"
        ).collect()
        sums = np.zeros_like(cm)
        counts = np.zeros(len(cm))
        for r in partials:
            sums[r["cluster"]] += np.asarray(r["vsum"])
            counts[r["cluster"]] += r["cnt"]
        # Empty cells keep their previous centroid (counts == 0).
        nonempty = counts > 0
        cm = cm.copy()
        cm[nonempty] = sums[nonempty] / counts[nonempty, None]

    return spark.createDataFrame(
        [(i, [float(np.float32(x)) for x in row]) for i, row in enumerate(cm)],
        "cluster int, centroid array<float>",
    )


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
        .select("query_id", "qv", norm(F.col("qv")).alias("qn"), "cluster")
    )
    # Broadcast the (queries x nprobe)-row probe table: the candidate
    # join becomes a map-side hash probe over the index — the inverted
    # file is scanned once, never shuffled, and cells outside every
    # probe list are filtered at the scan. Norms are per-row quantities
    # computed before the join, so the pair stage folds each
    # candidate's dims once (dot), not three times — bit-identical to
    # cosine() (the fold order of dot/(norm*norm) is unchanged).
    cand = F.broadcast(probes).join(
        index.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            norm(F.col(vec_col)).alias("cn"),
            "cluster",
        ),
        "cluster",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
