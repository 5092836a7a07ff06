"""Naive Bayes classifier + Gopher rule battery tests."""

from __future__ import annotations

import math

from econdatapipeline_spark.operators.classify import (
    nb_evaluate,
    nb_score,
    nb_train,
)
from econdatapipeline_spark.operators.quality import gopher_rules


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string, lang string")


def test_nb_manual_math(spark):
    # train: class x = "a a b", class y = "c c b"; V = 3
    train = _docs(spark, [(0, "a a b", "x"), (1, "c c b", "y")])
    test = _docs(spark, [(10, "a a", "x")])
    model = nb_train(train, label_col="lang")
    out = nb_score(test, model).collect()
    assert len(out) == 1 and out[0]["predicted"] == "x"
    # score(x) = ln(1/2) + 2*ln((2+1)/(3+3)); score(y) = ln(1/2) + 2*ln((0+1)/(3+3))
    sx = math.log(0.5) + 2 * round(math.log(3 / 6), 9)
    sy = math.log(0.5) + 2 * round(math.log(1 / 6), 9)
    assert abs(out[0]["margin"] - (sx - sy)) < 1e-5


def test_nb_tie_breaks_label_ascending(spark):
    # Symmetric classes: doc "b" scores identically under both -> tie
    # must deterministically pick the ascending label.
    train = _docs(spark, [(0, "a b", "x"), (1, "c b", "y")])
    test = _docs(spark, [(10, "b", "z")])
    model = nb_train(train, label_col="lang")
    out = nb_score(test, model).collect()
    assert out[0]["predicted"] == "x"
    assert out[0]["margin"] == 0.0


def test_nb_empty_doc_scores_prior_only(spark):
    # Majority-class prior wins when the doc has no tokens.
    train = _docs(
        spark, [(0, "a a", "x"), (1, "b b", "x"), (2, "c c", "y")]
    )
    test = _docs(spark, [(10, "", "x")])
    model = nb_train(train, label_col="lang")
    out = nb_score(test, model).collect()
    assert out[0]["predicted"] == "x"


def test_nb_evaluate_confusion_cells(spark):
    train = _docs(
        spark,
        [(0, "alpha beta alpha", "x"), (1, "gamma delta gamma", "y")],
    )
    test = _docs(
        spark,
        [(10, "alpha alpha", "x"), (11, "gamma gamma", "y"),
         (12, "alpha beta", "y")],
    )
    model = nb_train(train, label_col="lang")
    cells = {
        (r["actual"], r["predicted"]): r["n"]
        for r in nb_evaluate(test, model, label_col="lang").collect()
    }
    assert cells[("x", "x")] == 1
    assert cells[("y", "y")] == 1
    assert cells[("y", "x")] == 1  # doc 12 misclassified by content


def test_nb_synthetic_corpus_structural(spark):
    # The synthetic documents table draws every language from one shared
    # vocabulary (no learnable signal), so this pins STRUCTURE, not
    # accuracy: every held-out doc lands in exactly one confusion cell,
    # and the whole train+score pipeline is run-to-run deterministic.
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = d.filter(d.doc_id % 2 == 0)
    test = d.filter(d.doc_id % 2 == 1)
    model = nb_train(train, label_col="lang")
    cells = sorted(
        (r["actual"], r["predicted"], r["n"], r["mean_margin"])
        for r in nb_evaluate(test, model, label_col="lang").collect()
    )
    assert sum(n for _, _, n, _ in cells) == test.count()
    cells2 = sorted(
        (r["actual"], r["predicted"], r["n"], r["mean_margin"])
        for r in nb_evaluate(test, model, label_col="lang").collect()
    )
    assert cells == cells2


def test_nb_learns_separable_vocab(spark):
    # A corpus WITH signal: disjoint vocabularies per class -> held-out
    # accuracy must be perfect.
    rows, k = [], 0
    for lang, words in (("x", "aa bb cc"), ("y", "dd ee ff")):
        for _ in range(6):
            rows.append((k, words, lang))
            k += 1
    df = _docs(spark, rows)
    model = nb_train(df.filter(df.doc_id % 2 == 0), label_col="lang")
    cells = nb_evaluate(
        df.filter(df.doc_id % 2 == 1), model, label_col="lang"
    ).collect()
    assert all(r["actual"] == r["predicted"] for r in cells)
    assert sum(r["n"] for r in cells) == 6


def test_gopher_rules_flags(spark):
    good = "the cats sat upon the mats and that dogs ran off to a home " * 5
    rows = [
        (0, good, "en"),                      # passes everything
        (1, "word " * 10, "en"),              # too short
        (2, "#### #### #### " + "w " * 60, "en"),  # symbol-heavy
        (3, "\n".join("- item %d" % i for i in range(10)), "en"),  # bullets
        (4, ("1 2 3 4 5 6 7 8 9 0 " * 6), "en"),  # no alphabetic words
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_rules(_docs(spark, rows)).collect()
    }
    assert out[0]["gopher_pass"]
    assert not out[1]["ok_words"]
    assert not out[2]["ok_symbol"]
    assert not out[3]["ok_bullet"]
    assert not out[4]["ok_alpha"] and not out[4]["gopher_pass"]


def test_gopher_ellipsis_and_stops(spark):
    many_ell = "\n".join("so it goes on..." for _ in range(10))
    rows = [(0, many_ell, "en"), (1, "just random words here", "en")]
    out = {
        r["doc_id"]: r
        for r in gopher_rules(_docs(spark, rows)).collect()
    }
    assert not out[0]["ok_ellipsis"]
    assert not out[1]["ok_stops"]  # no two required stopwords
