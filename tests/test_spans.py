"""Exact substring-span dedup tests (operators/spans)."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.operators.spans import (
    duplicate_spans,
    substring_dup_stats,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )


def test_shared_window_coverage(spark):
    shared = "a b c d"  # 4-token window shared verbatim
    df = _docs(spark, [f"{shared} x y z", f"p q {shared} r"])
    out = {r["doc_id"]: r for r in
           substring_dup_stats(df, k=4, min_docs=2).collect()}
    # doc0: tokens 0..3 duplicated (4 of 7); doc1: tokens 2..5 (4 of 7)
    assert out[0]["dup_tokens"] == 4 and out[0]["n_tokens"] == 7
    assert out[1]["dup_tokens"] == 4 and out[1]["n_tokens"] == 7
    assert abs(out[0]["dup_frac"] - round(4 / 7, 6)) < 1e-9
    assert out[0]["flagged"] and out[1]["flagged"]  # 4/7 > 0.3


def test_no_cross_doc_dup(spark):
    df = _docs(spark, ["one two three four five", "six seven eight nine ten"])
    out = substring_dup_stats(df, k=3, min_docs=2).collect()
    assert all(r["dup_tokens"] == 0 and not r["flagged"] for r in out)


def test_overlapping_windows_union_not_sum(spark):
    # two docs share a 6-token run; with k=4 that's 3 overlapping
    # windows but coverage must count 6 tokens, not 12
    run = "a b c d e f"
    df = _docs(spark, [f"{run} zz", f"yy {run}"])
    out = {r["doc_id"]: r for r in
           substring_dup_stats(df, k=4, min_docs=2).collect()}
    assert out[0]["dup_tokens"] == 6
    assert out[1]["dup_tokens"] == 6


def test_spans_merge_adjacent(spark):
    run = "a b c d e f"
    df = _docs(spark, [f"{run} zz qq", f"yy {run}"])
    spans = {r["doc_id"]: r for r in
             duplicate_spans(df, k=4, min_docs=2).collect()}
    assert spans[0]["span_start"] == 0 and spans[0]["span_end"] == 5
    assert spans[0]["span_len"] == 6
    assert spans[1]["span_start"] == 1 and spans[1]["span_end"] == 6


def test_two_separate_spans(spark):
    df = _docs(
        spark,
        [
            "a b c d MID1 MID2 MID3 e f g h",
            "a b c d X1 X2 X3 e f g h",
        ],
    )
    spans = duplicate_spans(df, k=4, min_docs=2).collect()
    per_doc = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    # both docs: two islands (prefix a b c d, suffix e f g h)
    assert sorted(per_doc[0]) == [(0, 3), (7, 10)]
    assert sorted(per_doc[1]) == [(0, 3), (7, 10)]


def test_short_doc_exact_dup_collapses(spark):
    # docs shorter than k collapse to one whole-text window; exact
    # short-doc twins are therefore caught
    df = _docs(spark, ["tiny doc", "tiny doc", "other text"])
    out = {r["doc_id"]: r for r in
           substring_dup_stats(df, k=8, min_docs=2).collect()}
    assert out[0]["dup_tokens"] == 2 and out[1]["dup_tokens"] == 2
    assert out[0]["dup_frac"] == 1.0
    assert out[2]["dup_tokens"] == 0
