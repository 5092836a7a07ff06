"""Curation funnel tests (operators/curation)."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.operators.curation import curation_funnel

GOOD = (
    "the cats sat upon the mats and that dogs ran off to their new home "
    "while the birds flew over the tall trees near the old stone wall "
    "and the wind blew softly through the open fields all day long"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_funnel_stages_and_kept_consistency(spark):
    rows = [
        (0, GOOD),                     # survives everything
        (1, GOOD),                     # exact duplicate -> dropped at stage 2
        (2, "short junk"),             # fails gopher word count
        (3, GOOD + " extra trailing words to differ slightly from zero"),
    ]
    kept, report = curation_funnel(
        _docs(spark, rows), lm_keep_frac=1.0, min_words=10,
        min_required_stops=1,
    )
    r = {row["stage"]: (row["n_in"], row["n_out"]) for row in report.collect()}
    assert r["gopher"] == (4, 3)       # doc 2 dropped
    assert r["exact_dedup"] == (3, 2)  # doc 1 folded into doc 0
    assert r["lm_tail"] == (2, 2)      # keep_frac=1.0 keeps all
    # chaining invariant: stage n_out feeds the next stage's n_in
    assert r["gopher"][1] == r["exact_dedup"][0]
    assert r["exact_dedup"][1] == r["lm_tail"][0]
    ids = sorted(row["doc_id"] for row in kept.collect())
    assert ids == [0, 3]


def test_funnel_lm_tail_cuts_disfluent(spark):
    # 10 fluent docs + 1 with alien vocabulary; an 80% cut must drop
    # the alien doc (highest xent under the survivor-trained LM).
    rows = [(i, GOOD + f" filler number {i}") for i in range(10)]
    rows.append((99, "zqx wxv vkj jpq qgb bzx xnv mvk klp pwz ztq rqw " * 4))
    kept, report = curation_funnel(
        _docs(spark, rows), lm_keep_frac=0.8, min_words=10,
        min_required_stops=0,
    )
    ids = {row["doc_id"] for row in kept.collect()}
    assert 99 not in ids
    r = {row["stage"]: (row["n_in"], row["n_out"]) for row in report.collect()}
    assert r["lm_tail"][0] == 11


def test_funnel_short_docs_survive_lm_stage(spark):
    # docs with < 2 tokens have no xent -> must be kept at the LM stage
    rows = [(0, GOOD), (1, GOOD + " more"), (2, "word")]
    kept, report = curation_funnel(
        _docs(spark, rows), lm_keep_frac=0.5, min_words=1,
        min_required_stops=0, min_word_len=1.0,
    )
    ids = {row["doc_id"] for row in kept.collect()}
    assert 2 in ids


def test_funnel_validates_keep_frac(spark):
    with pytest.raises(ValueError):
        curation_funnel(_docs(spark, [(0, GOOD)]), lm_keep_frac=0.0)
