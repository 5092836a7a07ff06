"""Symmetric-delete fuzzy name matching (operators/fuzzy.py)."""

from __future__ import annotations

from econdatapipeline_spark.operators.fuzzy import fuzzy_name_pairs


def test_catches_every_distance1_edit_kind_and_collapses_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "small ring"),
            (2, "small rings"),    # insertion at end
            (3, "mall ring"),      # deletion at front
            (4, "smell ring"),     # substitution mid
            (5, "red widget"),     # unrelated
            (6, "Small Ring "),    # exact dup after normalization
            (7, "small ring"),     # exact dup
        ],
        "p_partkey long, p_name string",
    )
    got = {
        (r["name_a"], r["name_b"]): (r["n_a"], r["n_b"], r["distance"])
        for r in fuzzy_name_pairs(df).collect()
    }
    # "small ring" occurs 3x after normalization; distance-1 neighbors found
    assert got[("small ring", "small rings")] == (3, 1, 1)
    assert got[("mall ring", "small ring")] == (1, 3, 1)
    assert got[("small ring", "smell ring")] == (3, 1, 1)
    assert all("red widget" not in pair for pair in got)


def test_matches_brute_force_on_random_corpus(spark):
    import itertools
    import random

    rng = random.Random(11)
    adjs = ["red", "blue", "hot", "cold", "small", "smal", "smell"]
    nouns = ["ring", "rings", "bolt", "bolts", "gear", "gearz"]
    rows = [(i, f"{rng.choice(adjs)} {rng.choice(nouns)}") for i in range(120)]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    distinct = sorted({n for _, n in rows})
    want = {
        (a, b)
        for a, b in itertools.combinations(distinct, 2)
        if lev(a, b) == 1
    }
    got = {(r["name_a"], r["name_b"]) for r in fuzzy_name_pairs(df).collect()}
    assert got == want and len(want) > 10
