"""TF-IDF term weighting (operators/tfidf.py)."""

from __future__ import annotations

import math

from econdatapipeline_spark.operators.tfidf import tfidf_terms, top_terms_per_doc


def test_tfidf_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {
        (r["doc_id"], r["token"]): (r["tf"], r["df"], r["tfidf"])
        for r in tfidf_terms(df).collect()
    }
    idf_unique = math.log(3 / 2) + 1      # df=1, N=2
    idf_common = math.log(3 / 3) + 1      # df=2, N=2
    assert out[(1, "a")] == (2, 1, round(2 * idf_unique, 6))
    assert out[(1, "b")] == (1, 2, round(1 * idf_common, 6))
    assert out[(2, "c")] == (1, 1, round(1 * idf_unique, 6))


def test_top_terms_rank_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "x y")], "doc_id long, text string"
    )
    rows = top_terms_per_doc(df, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["token"]))
    assert sorted(by_doc[1]) == [(1, "a"), (2, "b")]
    # x and y tie on tfidf -> lexicographic tiebreak
    assert sorted(by_doc[2]) == [(1, "x"), (2, "y")]


def test_bm25_ranks_term_dense_docs_first(spark):
    import math

    from econdatapipeline_spark.operators.tfidf import bm25_search

    df = spark.createDataFrame(
        [
            (1, "spark spark spark"),      # dense in the query term
            (2, "spark join filter"),      # one hit
            (3, "join filter agg"),        # no hit
        ],
        "doc_id long, text string",
    )
    rows = bm25_search(df, ["spark"], k=10).collect()
    assert [r["doc_id"] for r in rows] == [1, 2]  # doc 3 absent, dense doc first
    # hand-check doc 2: tf=1, df=2, N=3, dl=3, avgdl=3
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    expected = idf * 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * 1.0))
    assert abs(rows[1]["bm25"] - round(expected, 6)) < 1e-9
    assert rows[0]["n_terms_hit"] == 1


def test_bm25_multi_term_accumulates(spark):
    from econdatapipeline_spark.operators.tfidf import bm25_search

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a a"), (3, "b")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["n_terms_hit"] for r in bm25_search(df, ["a", "b"]).collect()}
    assert rows == {1: 2, 2: 1, 3: 1}


def test_pmi_bigrams_finds_collocation(spark):
    from econdatapipeline_spark.operators.tfidf import pmi_bigrams

    # "strong coffee" always adjacent; other words shuffled independently.
    rows = []
    fillers = ["a", "b", "c", "d"]
    for i in range(20):
        f1, f2 = fillers[i % 4], fillers[(i + 1) % 4]
        rows.append((i, f"{f1} strong coffee {f2} {f1} {f2}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["w1"], r["w2"]): r for r in pmi_bigrams(df, min_count=5, min_pmi=0.1).collect()}
    assert ("strong", "coffee") in out
    row = out[("strong", "coffee")]
    assert row["c_xy"] == 20
    # perfectly coupled pair must dominate independent fillers
    assert all(row["pmi"] >= r["pmi"] for r in out.values())


def test_pmi_thresholds_drop_rare_pairs(spark):
    from econdatapipeline_spark.operators.tfidf import pmi_bigrams

    df = spark.createDataFrame(
        [(1, "rare pair here"), (2, "x y x y x y x y x y")],
        "doc_id long, text string",
    )
    out = pmi_bigrams(df, min_count=5, min_pmi=0.1)
    pairs = {(r["w1"], r["w2"]) for r in out.collect()}
    assert ("rare", "pair") not in pairs  # c_xy = 1 < 5


def test_tfidf_cosine_pairs_identical_docs(spark):
    from econdatapipeline_spark.operators.tfidf import tfidf_cosine_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in tfidf_cosine_pairs(df, threshold=0.0).collect()}
    # identical term vectors -> cosine 1; disjoint docs share no term -> absent
    assert out[(1, 2)] == 1.0
    assert (1, 3) not in out and (2, 3) not in out


def test_tfidf_cosine_threshold_and_symmetry(spark):
    from econdatapipeline_spark.operators.tfidf import tfidf_cosine_pairs

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "a q r s")],
        "doc_id long, text string",
    )
    rows = tfidf_cosine_pairs(df, threshold=0.0).collect()
    # every pair appears once with id_a < id_b
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows}) == 3
    # raising the threshold can only shrink the set
    hi = tfidf_cosine_pairs(df, threshold=0.9).collect()
    assert len(hi) <= len(rows)


def test_zipf_fit_matches_numpy_reference(spark):
    import math

    from econdatapipeline_spark.operators.tfidf import zipf_fit

    # frequencies 8,4,2,1 for tokens a,b,c,d -> exact log-log OLS
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = spark.createDataFrame([(0, text)], "doc_id int, text string")
    row = zipf_fit(df).first()
    assert row["n_types"] == 4 and row["n_tokens"] == 15
    xs = [round(math.log(r), 9) for r in (1, 2, 3, 4)]
    ys = [round(math.log(f), 9) for f in (8, 4, 2, 1)]
    n = 4.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row["slope"] - slope) < 1e-5
    assert row["slope"] < 0  # frequency falls with rank
    assert 0.9 < row["r2"] <= 1.0


def test_zipf_fit_degenerate_single_type(spark):
    from econdatapipeline_spark.operators.tfidf import zipf_fit

    df = spark.createDataFrame([(0, "same same same")], "doc_id int, text string")
    row = zipf_fit(df).first()
    assert row["n_types"] == 1 and row["n_tokens"] == 3
    assert row["slope"] is None and row["r2"] is None
