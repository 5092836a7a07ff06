"""Skew-mitigation join strategies for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the explicit,
planner-independent fallback for the pathological case: one key holding
a double-digit percentage of a 100 TB fact table, where even a split
partition re-concentrates on the same reducer set.

``salted_join``: the fact side gets a deterministic per-row salt in
[0, n); the dim side is exploded n-fold with every salt value. The join
key becomes (key, salt), spreading each hot key over n reducers. For
``inner`` and ``left`` joins the result set is provably identical to
the unsalted join (each fact row meets exactly the one dim replica
carrying its salt). ``right``/``full`` are rejected: an unmatched dim
key would surface once per salt replica (n null-extended duplicates) —
salt the other way around instead. Cost: dim side x n — only ever salt
against a small-to-medium dim side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key shuffle spread over ``num_salts`` reducers.

    salt_source: fact column whose hash drives the salt (defaults to the
    join key itself XOR'd through xxhash64 with a row-varying component
    is NOT possible without a unique column — pass a unique/quasi-unique
    column for real spreading; key-only salting is a no-op spread).

    ``how`` must be ``inner`` or ``left`` — the fact side keeps every
    row in both. A right/full variant would emit ``num_salts``
    duplicate null-extended rows per unmatched dim key (the dim side is
    exploded n-fold), silently corrupting the result.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "the exploded dim side would duplicate unmatched dim keys "
            "num_salts times under right/full joins"
        )
    src = F.col(salt_source) if salt_source else F.spark_partition_id()
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(num_salts)))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(num_salts)]))
    )
    # Qualify the key references through each side's DataFrame: with
    # same-named fact/dim keys a bare F.col() would be ambiguous.
    joined = f.join(
        d,
        (f["__salt"] == d["__salt"]) & (f[fact_key] == d[dim_key]),
        how,
    )
    return joined.drop(f["__salt"]).drop(d["__salt"])


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Hot-key diagnostic: the n heaviest join keys and their share.

    Run this before choosing num_salts — salt count should roughly match
    (hot key rows) / (target partition rows).
    """
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.desc("n_rows"), F.asc(key))
        .limit(n)
    )


def skew_report(df: DataFrame, key: str) -> DataFrame:
    """One-row key-distribution diagnosis -> (n, n_keys, max_n,
    top1_share, entropy, balance).

    The pre-join planning probe: whether a key needs salting is a
    property of its count distribution — max partition load is
    proportional to max_n, and ``balance`` = H / ln(n_keys) (normalized
    Shannon entropy) is 1.0 for perfectly uniform keys and tends to 0
    as one key dominates. Two hash aggregates: the (key, count)
    relation (the only data-sized shuffle, map-side combinable) and a
    |keys|-sized reduce. Per-key entropy terms quantize to
    decimal(28,12) so the sum is partition-order-free.
    """
    counts = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = counts.agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "c",
        "n",
        (-p * F.log(p)).cast("decimal(28,12)").alias("h"),
    )
    return terms.agg(
        F.first("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_n"),
        F.round(F.max("c") / F.first("n").cast("double"), 6).alias("top1_share"),
        F.round(F.sum("h").cast("double"), 6).alias("entropy"),
        F.round(
            F.when(
                F.count(F.lit(1)) > 1,
                F.sum("h").cast("double")
                / F.log(F.count(F.lit(1)).cast("double")),
            ),
            6,
        ).alias("balance"),
    )
