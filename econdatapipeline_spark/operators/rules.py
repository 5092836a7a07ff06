"""Market-basket association rules: support / confidence / lift.

The reference's analytics layer stops at co-occurrence counts (the
basket_pairs contract query); a curation or merchandising user needs
the directed rule readout on top — "orders containing A also contain
B with confidence c, lift L" — the classic Agrawal et al. (1993)
output restricted to single-antecedent rules, which is the part that
stays tractable at warehouse scale.

Scale shape: ONE distinct (basket, item) projection; baskets wider
than ``max_basket_size`` are dropped whole (the hot-key guard — a
degenerate mega-basket contributes quadratic pairs and no signal);
pair generation is a self-join keyed by basket so cost is
sum(basket²), never |items|²; supports and rule metrics are exact
integer counts + O(1) ratios. Everything stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
    max_basket_size: int = 64,
) -> DataFrame:
    """Directed single-antecedent rules -> (antecedent, consequent,
    n_pair, n_ante, n_cons, confidence, lift).

    confidence = n_pair / n_ante; lift = confidence / (n_cons / N)
    where N = number of qualifying baskets. Both directions of every
    co-occurring pair are emitted; rows with pair support below
    ``min_pair_support`` are pruned (the A-priori support prune).
    Exact integer counts throughout — the ratios are the only
    doubles, so an oracle replays them bit-for-bit.
    """
    if min_pair_support < 1:
        raise ValueError(
            f"min_pair_support must be >= 1, got {min_pair_support}"
        )
    if max_basket_size < 2:
        raise ValueError(
            f"max_basket_size must be >= 2, got {max_basket_size}"
        )
    bi = (
        df.select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("i")
        )
        .filter(F.col("b").isNotNull() & F.col("i").isNotNull())
        .distinct()
    )
    sizes = bi.groupBy("b").agg(F.count(F.lit(1)).alias("sz"))
    # pin the qualified posting list: four consumers (N, supports,
    # both pair sides) would each re-derive the distinct + size join
    # (40 exchanges at plan audit); one eager checkpoint cuts that to
    # a single materialization every branch reads
    kept = bi.join(
        sizes.filter(F.col("sz") <= max_basket_size).select("b"), "b"
    ).localCheckpoint(eager=True)
    # N as a 1-row relation (plan-side, no driver action)
    n_rel = kept.agg(
        F.countDistinct("b").cast("double").alias("nb_total")
    )
    item_supp = kept.groupBy("i").agg(
        F.count(F.lit(1)).cast("long").alias("supp")
    )
    a = kept.alias("a")
    bb = kept.alias("p")
    pairs = (
        a.join(
            bb,
            (F.col("a.b") == F.col("p.b"))
            & (F.col("a.i") != F.col("p.i")),
        )
        .groupBy(
            F.col("a.i").alias("antecedent"),
            F.col("p.i").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_support)
    )
    sa = item_supp.select(
        F.col("i").alias("antecedent"), F.col("supp").alias("n_ante")
    )
    sc = item_supp.select(
        F.col("i").alias("consequent"), F.col("supp").alias("n_cons")
    )
    conf = F.col("n_pair").cast("double") / F.col("n_ante").cast(
        "double"
    )
    nb = F.col("nb_total")
    # item-support joins are key-equi; AQE broadcasts when the vocab
    # is small and shuffles when it is not — no forced hint, the item
    # side can be arbitrarily wide at corpus scale
    return (
        pairs.join(sa, "antecedent")
        .join(sc, "consequent")
        .crossJoin(F.broadcast(n_rel))
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            "n_ante",
            "n_cons",
            F.round(conf, 6).alias("confidence"),
            F.round(
                conf / (F.col("n_cons").cast("double") / nb), 6
            ).alias("lift"),
        )
    )
