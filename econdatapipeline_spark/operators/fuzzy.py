"""Entity resolution: fuzzy string matching via symmetric deletes.

The classic blocking schemes for edit-distance joins (prefix, q-gram)
collapse at scale on skewed vocabularies: every "small ..." product
shares a prefix block, so candidates go quadratic in the block size.
The symmetric-delete scheme (SymSpell / FastSS) is output-bounded
instead: two strings are within Levenshtein distance 1 **iff** they
share a key in {s} ∪ deletes1(s) — equality (trivial), deletion
(t ∈ del1(s)), insertion (s ∈ del1(t)), or substitution (del1 overlap
at the edit position). Each string contributes len+1 keys, and a key
matches almost nothing except true near-dups, so the self-join's
shuffle is ~(n x avg_len) rows and its output is ~the result size —
no hot blocks, no n². A final `levenshtein <= 1` verify culls the few
coincidental key collisions.

Deletion variants are pure column expressions (a fixed unroll to
``max_len`` of concat(substring) pairs — positions past the string's
end collapse to the string itself and are deduped by array_distinct),
so the whole candidate generation stays inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _delete_keys(col, max_len: int):
    s = F.lower(F.trim(col))
    variants = [s] + [
        F.concat(F.substring(s, 1, i), F.substring(s, i + 2, max_len))
        for i in range(max_len)
    ]
    return F.array_distinct(F.array(*variants))


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str = "p_name",
    max_len: int = 32,
) -> DataFrame:
    """(name_a, name_b, n_a, n_b, distance) over DISTINCT normalized
    names within Levenshtein distance 1, with occurrence counts.

    Exact duplicates are collapsed FIRST (one grouped count): any
    pairwise output over raw rows is quadratic in the duplicate count —
    a name occurring 10^4 times would contribute 10^8 identical pairs
    before matching even starts. Distinct-name cardinality is bounded
    by the vocabulary, not the corpus, so the symdelete join runs on
    the small side at every scale; row-level linkage is a join back on
    the normalized name if a caller needs ids.

    Strings longer than ``max_len`` only generate deletes in their
    first ``max_len`` positions — exactness holds for inputs within
    the bound (assert or truncate upstream for open-ended columns).
    """
    names = (
        df.select(F.lower(F.trim(F.col(name_col))).alias("name"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    keyed = names.select(
        "name", "n", F.explode(_delete_keys(F.col("name"), max_len)).alias("k")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k")) & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .distinct()
    )
    # banded form (threshold=1): exact distance when <= 1, -1 above —
    # the >= 0 guard keeps survivors identical to the unbanded filter
    # at O(len) per compare instead of O(len²).
    dist = F.levenshtein("name_a", "name_b", 1)
    return cand.select(
        "name_a", "name_b", "n_a", "n_b", dist.alias("distance")
    ).filter((F.col("distance") >= 0) & (F.col("distance") <= 1))
