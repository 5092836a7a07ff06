"""Leakage-safe categorical target encoding.

The classic high-cardinality feature transform (Micci-Barreca 2001,
"A preprocessing scheme for high-cardinality categorical attributes"):
replace a category with a smoothed mean of the target — but computed
OUT-OF-FOLD, so no row's own target leaks into its feature:

    enc(row in fold f, category c)
        = (S_c − S_{c,f} + m · prior) / (n_c − n_{c,f} + m)

where S/n are target sums/counts for the category overall and within
the row's fold, m is the smoothing pseudo-count pulling rare
categories toward the global prior. Folds come from the engine's
deterministic md5 bucket (same convention as sampling.kfold_assign) so
every engine, run, and retry deals identical folds.

Scale shape: two map-side-combinable aggregates (|categories| and
|categories × folds| rows — broadcast-sized even when the input is
100 TB) plus one broadcast join back onto the scan; the target sums
are exact decimals so the encoding is summation-order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.operators.sampling import _md5_bucket


def target_encoding_table(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    folds: int = 5,
    smoothing: float = 20.0,
    seed: str = "te0",
) -> DataFrame:
    """(cat, fold, n_out, enc) — the out-of-fold encoding per
    (category, fold) cell. Join this (broadcast) onto rows to encode;
    ``n_out`` is the out-of-fold support behind each value."""
    if folds < 2:
        raise ValueError(f"folds must be >= 2, got {folds}")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    key = F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    base = df.select(
        F.col(cat_col).alias("cat"),
        F.col(target_col).cast("decimal(28,6)").alias("t"),
        _md5_bucket(key, folds).cast("int").alias("fold"),
    )
    cat_tot = base.groupBy("cat").agg(
        F.sum("t").alias("s"), F.count(F.lit(1)).alias("n")
    )
    fold_tot = base.groupBy("cat", "fold").agg(
        F.sum("t").alias("sf"), F.count(F.lit(1)).alias("nf")
    )
    prior = base.agg(
        (F.sum("t").cast("double") / F.count(F.lit(1))).alias("prior")
    )
    m = F.lit(float(smoothing))
    return (
        fold_tot.join(F.broadcast(cat_tot), "cat")
        .crossJoin(F.broadcast(prior))
        .select(
            "cat",
            "fold",
            (F.col("n") - F.col("nf")).cast("long").alias("n_out"),
            F.round(
                (
                    F.col("s").cast("double")
                    - F.col("sf").cast("double")
                    + m * F.col("prior")
                )
                / ((F.col("n") - F.col("nf")).cast("double") + m),
                6,
            ).alias("enc"),
        )
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    folds: int = 5,
    smoothing: float = 20.0,
    seed: str = "te0",
) -> DataFrame:
    """Row-level encoding: input ids + (cat, fold, enc).

    The encoding table is |categories × folds|-sized and broadcasts;
    the row join is therefore shuffle-free on the big side.
    """
    table = target_encoding_table(
        df, cat_col, target_col, id_col, folds, smoothing, seed
    )
    key = F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    rows = df.select(
        F.col(id_col),
        F.col(cat_col).alias("cat"),
        _md5_bucket(key, folds).cast("int").alias("fold"),
    )
    return rows.join(F.broadcast(table.drop("n_out")), ["cat", "fold"]).select(
        id_col, "cat", "fold", "enc"
    )
