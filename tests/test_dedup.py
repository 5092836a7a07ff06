"""Dedup operator tests on synthetic + sf0.001 documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from econdatapipeline_spark.operators import dedup as D

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "The quick  brown fox jumps over the lazy dog today"),  # exact dup (norm)
            (3, "the quick brown fox jumps over the lazy cat today"),   # near dup
            (4, "spark engines shuffle parquet files across big clusters"),
        ],
        "doc_id long, text string",
    )


def test_exact_dedup(spark, docs):
    kept = D.exact_dedup(docs)
    assert kept.count() == 3
    row = kept.filter(F.col("dup_count") == 2).collect()[0]
    assert row["doc_id"] == 1  # lowest id survives


def test_exact_dup_groups(spark, docs):
    groups = D.exact_dup_groups(docs).collect()
    assert len(groups) == 1 and groups[0]["keep_id"] == 1


def test_minhash_lsh_finds_near_dup(spark, docs):
    cand = D.minhash_lsh_candidates(docs, num_hashes=16, bands=8).collect()
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in cand}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical after normalization
    assert (1, 3) in pairs or (2, 3) in pairs        # near dup caught by some band
    assert all(p != (1, 4) and p != (2, 4) and p != (3, 4) for p in pairs)


def test_ngram_jaccard(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.0 < pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs  # no shared shingle -> no candidate at all


def test_simhash_near_pairs(spark, docs):
    sim = D.simhash(docs, bits=32)
    fps = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert fps[1] == fps[2]  # normalized-identical docs -> identical fingerprint
    near = D.simhash_near_pairs(sim, max_hamming=6, bits=32, blocks=8).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in near}
    assert pairs[(1, 2)] == 0
    # unrelated doc 4 must not be near-anything at hamming<=6
    assert all(4 not in p for p in pairs)


def test_exact_dedup_on_sf_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept = D.exact_dedup(docs)
    assert kept.count() <= docs.count()
    assert kept.agg(F.sum("dup_count")).collect()[0][0] == docs.count()


def test_connected_components_chain_and_island(spark):
    """A 5-node chain (needs multiple label rounds) + a 2-node island."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a long, id_b long"
    )
    out = {r["node"]: r["cluster"] for r in D.connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_connected_components_converges_early(spark):
    """max_iter far above diameter must not change the result."""
    pairs = spark.createDataFrame([(7, 3), (3, 9)], "id_a long, id_b long")
    out = {r["node"]: r["cluster"] for r in D.connected_components(pairs, max_iter=50).collect()}
    assert out == {3: 3, 7: 3, 9: 3}


def test_star_components_matches_min_label(spark):
    """Large-star/small-star contraction must agree with the min-label
    loop on a random multi-component graph (fixed seed)."""
    import random

    random.seed(11)
    n = 300
    edges = [(random.randrange(n), random.randrange(n)) for _ in range(260)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    via_labels = {(r["node"], r["cluster"]) for r in D.connected_components(pairs).collect()}
    via_stars = {(r["node"], r["cluster"]) for r in D.star_components(pairs).collect()}
    assert via_stars == via_labels


def test_star_components_long_chain(spark):
    """A 150-hop chain: diameter >> round count, the case star
    contraction exists for (O(log^2 n) rounds vs O(diameter))."""
    chain = [(i, i + 1) for i in range(150)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    out = {r["node"]: r["cluster"] for r in D.star_components(pairs).collect()}
    assert out == {i: 0 for i in range(151)}


def test_ngram_jaccard_stop_gram_cap(spark):
    # docs 1+2 share a unique bigram-rich text; every doc shares 'the end'
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma the end"),
            (2, "alpha beta gamma the end"),
            (3, "unrelated words here the end"),
            (4, "other totally distinct text the end"),
        ],
        "doc_id long, text string",
    )
    exact = D.ngram_jaccard_pairs(df, shingle_n=3, threshold=0.05)
    assert {(r["id_a"], r["id_b"]) for r in exact.collect()} >= {(1, 2)}
    # cap at df<=2: 'the end'-only pairs vanish, the true dup pair stays
    capped = D.ngram_jaccard_pairs(df, shingle_n=3, threshold=0.05, max_doc_freq=2)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    assert (1, 2) in got
    # pairs that only shared the ubiquitous shingle are gone
    assert all(a in (1, 2) and b in (1, 2) for a, b in got)


def test_triangle_count_known_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant edge 4-5
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 5)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r["node"]: r["triangles"] for r in D.triangle_count(pairs).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}  # node 5 in no triangle -> absent


def test_triangle_count_direction_and_dup_insensitive(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)], "id_a long, id_b long"
    )
    out = {r["node"]: r["triangles"] for r in D.triangle_count(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_exact_dedup_best_keeps_highest_score_with_id_tiebreak(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "same text", 0.5),
            (2, "same text", 0.9),   # best copy
            (3, "same text", 0.9),   # tie -> lower id wins
            (4, "other", 0.1),
        ],
        "doc_id long, text string, quality double",
    )
    out = {r["doc_id"]: (r["best_score"], r["dup_count"])
           for r in D.exact_dedup_best(df, F.col("quality")).collect()}
    assert out == {2: (0.9, 3), 4: (0.1, 1)}


def test_minhash_cross_finds_cross_corpus_dup_only(spark):
    """The crawl's duplicate of a corpus doc is found; duplicates
    WITHIN either side are never paired."""
    text_dup = "the quick brown fox jumps over the lazy dog again and again"
    crawl = spark.createDataFrame(
        [(1, text_dup), (2, text_dup), (3, "completely different words entirely here")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(100, text_dup), (101, "nothing like the others at all in any way")],
        "doc_id long, text string",
    )
    out = D.minhash_lsh_cross(crawl, corpus).collect()
    got = {(r["id_left"], r["id_right"]) for r in out}
    # both crawl copies hit the corpus copy; the intra-crawl pair (1,2)
    # and intra-corpus pairs are absent by construction
    assert got == {(1, 100), (2, 100)}
    assert all(r["est_jaccard"] == 1.0 for r in out)


def test_ngram_containment_catches_subset_duplication(spark):
    """A short doc quoted whole inside a long one: containment of the
    short side is 1.0 while Jaccard stays low."""
    short = "alpha beta gamma delta epsilon zeta"
    long = short + " plus a very long unrelated tail " + " ".join(
        f"filler{i}" for i in range(40)
    )
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "entirely different content here now")],
        "doc_id long, text string",
    )
    cont = {
        (r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
        for r in D.ngram_containment_pairs(df, threshold=0.9).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)][0] == 1.0  # short fully contained
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    assert jac[(1, 2)] < 0.2  # Jaccard misses it


def test_prefix_dup_pairs_finds_truncations_not_equals(spark):
    from econdatapipeline_spark.operators.dedup import prefix_dup_pairs

    long_a = "a" * 60 + " tail of document one"
    df = spark.createDataFrame(
        [
            (1, long_a),
            (2, long_a[:50]),          # strict prefix of 1
            (3, long_a),               # exact duplicate of 1 -> excluded
            (4, "b" * 80),             # unrelated
            (5, "short one"),          # < probe_chars, prefix of nobody
        ],
        "doc_id long, text string",
    )
    pairs = {(r["short_id"], r["long_id"]) for r in prefix_dup_pairs(df).collect()}
    assert pairs == {(2, 1), (2, 3)}


def test_prefix_dup_pairs_short_block(spark):
    """Documents shorter than probe_chars block on their own full text:
    a short doc IS found when the long doc shares its exact first
    probe_chars... only if lengths reach the probe — the documented
    blocking bound."""
    from econdatapipeline_spark.operators.dedup import prefix_dup_pairs

    df = spark.createDataFrame(
        [(1, "xy" * 30), (2, "xy" * 5)], "doc_id long, text string"
    )
    # short doc (10 chars) < probe 40: blocks differ, pair missed by design
    assert prefix_dup_pairs(df, probe_chars=40).count() == 0
    # with a probe inside the short doc, the pair is found
    assert {(r["short_id"], r["long_id"]) for r in prefix_dup_pairs(df, probe_chars=10).collect()} == {(2, 1)}


def test_minhash_cross_ignores_same_id_recrawl(spark):
    """Regression: a doc present in both the increment and the corpus
    under the SAME id must not be reported as its own duplicate."""
    from econdatapipeline_spark.operators.dedup import minhash_lsh_cross

    text = "the quick brown fox jumps over the lazy dog again and again"
    new = spark.createDataFrame([(7, text), (8, text)], "doc_id long, text string")
    corpus = spark.createDataFrame([(7, text)], "doc_id long, text string")
    pairs = {(r["id_left"], r["id_right"])
             for r in minhash_lsh_cross(new, corpus, num_hashes=16, bands=4, shingle_n=3).collect()}
    assert (7, 7) not in pairs
    assert (8, 7) in pairs  # the genuine cross-dup is still found


def test_line_dedup_removes_repeated_boilerplate_once(spark):
    from econdatapipeline_spark.operators.dedup import line_dedup

    banner = "accept our cookie policy to continue"
    rows = [
        (1, f"unique first article text\n{banner}\nshort"),
        (2, f"{banner}\nanother unique body paragraph"),
        (3, "totally unrelated document body here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in line_dedup(df, sep="\n", min_chars=20).collect()}
    # the banner survives only at its first site (doc 1, pos 1)
    assert out[1] == f"unique first article text\n{banner}\nshort"
    assert out[2] == "another unique body paragraph"
    assert out[3] == "totally unrelated document body here"
    # short lines are never deduped even when repeated
    rows2 = [(1, "short\nbody one has enough chars"),
             (2, "short\nbody two has enough chars")]
    out2 = {r["doc_id"]: r["text"]
            for r in line_dedup(spark.createDataFrame(
                rows2, "doc_id long, text string"), min_chars=20).collect()}
    assert out2[1].startswith("short\n") and out2[2].startswith("short\n")


def test_line_dedup_drops_fully_duplicated_doc(spark):
    from econdatapipeline_spark.operators.dedup import line_dedup

    long_line = "this single long line is the entire document body"
    df = spark.createDataFrame(
        [(1, long_line), (2, long_line)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["text"] for r in line_dedup(df).collect()}
    assert out == {1: long_line}  # doc 2 reduced to nothing -> dropped
    import pytest

    with pytest.raises(ValueError, match="min_chars"):
        line_dedup(df, min_chars=0)


def test_minhash_estimate_error_bounds(spark):
    from econdatapipeline_spark.operators import dedup as DD

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = DD.minhash_estimate_error(d, num_hashes=16, bands=4).collect()
    assert out, "LSH should surface candidate pairs at sf0.001"
    for r in out:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        assert abs(r["abs_err"] - round(abs(r["est_jaccard"] - r["exact_jaccard"]), 6)) < 2e-6
    # 16-hash estimator: mean |error| should sit well under 0.25
    mean_err = sum(r["abs_err"] for r in out) / len(out)
    assert mean_err < 0.25


def test_minhash_estimate_exact_on_identical_docs(spark):
    from econdatapipeline_spark.operators import dedup as DD

    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta"),
         (1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    out = DD.minhash_estimate_error(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["est_jaccard"] == 1.0 and r["exact_jaccard"] == 1.0
    assert r["abs_err"] == 0.0


def test_corpus_overlap_hand_computed(spark):
    from econdatapipeline_spark.operators.dedup import corpus_overlap

    rows = [
        ("A", 1, "w x y z"),          # shingles: {w x y, x y z}
        ("B", 2, "w x y"),            # {w x y}
        ("C", 3, "p q r s"),          # {p q r, q r s}
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {(r["group_a"], r["group_b"]): r for r in corpus_overlap(df).collect()}
    ab = out[("A", "B")]
    assert ab["common"] == 1 and ab["size_a"] == 2 and ab["size_b"] == 1
    assert ab["jaccard"] == 0.5
    assert ab["containment_a"] == 0.5 and ab["containment_b"] == 1.0
    assert ("A", "C") not in out and ("B", "C") not in out


def test_corpus_overlap_group_freq_cap(spark):
    from econdatapipeline_spark.operators.dedup import corpus_overlap

    # 'w x y' appears in all 3 groups -> dropped at max_group_freq=2,
    # leaving A/B overlap only through nothing (B has no other gram)
    rows = [
        ("A", 1, "w x y z"),
        ("B", 2, "w x y"),
        ("C", 3, "w x y"),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = corpus_overlap(df, max_group_freq=2).collect()
    assert out == []  # the only shared gram was the capped boilerplate
