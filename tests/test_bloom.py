"""Bloom-pruned incremental dedup (operators/bloom.py)."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.operators import bloom as B


def _history(spark, n=400):
    return spark.createDataFrame([(i, f"h{i}") for i in range(n)],
                                 "doc_id long, text string")


def _batch(spark, lo, hi):
    return spark.createDataFrame([(i, f"b{i}") for i in range(lo, hi)],
                                 "doc_id long, text string")


def test_no_false_negatives_ever(spark):
    """Every historical key must flag maybe_seen — the property the
    exactness of new_rows rests on."""
    hist = _history(spark)
    bf = B.build_bloom(hist, "doc_id")
    flags = B.bloom_probe(hist, bf, "doc_id").collect()
    assert all(r["maybe_seen"] for r in flags)


def test_false_positive_rate_within_bound(spark):
    """Fresh keys mostly probe clear: with m=2^20, k=5 and 400
    historical keys the theoretical FP rate is ~0, allow 2%."""
    hist = _history(spark)
    bf = B.build_bloom(hist, "doc_id")
    fresh = _batch(spark, 10_000, 12_000)
    fp = B.bloom_probe(fresh, bf, "doc_id").filter("maybe_seen").count()
    assert fp / 2000 <= 0.02


def test_new_rows_exactly_matches_anti_join(spark):
    """The bloom prune must never change the answer — only the work."""
    hist = _history(spark)
    batch = _batch(spark, 300, 700)  # 100 overlap, 300 new
    got = sorted(r["doc_id"] for r in B.new_rows(batch, hist, "doc_id").collect())
    exact = sorted(
        r["doc_id"]
        for r in batch.join(hist.select("doc_id"), "doc_id", "left_anti").collect()
    )
    assert got == exact == list(range(400, 700))
    # batch columns survive intact
    row = B.new_rows(batch, hist, "doc_id").filter("doc_id = 500").collect()[0]
    assert row["text"] == "b500"


def test_merge_blooms_is_incremental_union(spark):
    """OR-merging two filters behaves like building over the union —
    the standing-filter maintenance step."""
    h1, h2 = _history(spark, 200), _batch(spark, 200, 400)
    merged = B.merge_blooms(
        B.build_bloom(h1, "doc_id"), B.build_bloom(h2, "doc_id")
    )
    both = B.bloom_probe(
        _history(spark, 400), merged, "doc_id"
    ).collect()
    assert all(r["maybe_seen"] for r in both)


def test_build_bloom_validates_sizing(spark):
    hist = _history(spark, 10)
    with pytest.raises(ValueError, match="multiple of 64"):
        B.build_bloom(hist, "doc_id", num_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        B.build_bloom(hist, "doc_id", k=0)


def test_empty_history_flags_nothing(spark):
    hist = _history(spark, 0)
    bf = B.build_bloom(hist, "doc_id")
    fresh = _batch(spark, 0, 50)
    assert B.bloom_probe(fresh, bf, "doc_id").filter("maybe_seen").count() == 0
    assert B.new_rows(fresh, hist, "doc_id").count() == 50


def test_probe_plan_is_shuffle_free(spark):
    """The probe side must stay map-only: a one-row broadcast join and
    scan-stage bit tests — no Exchange on the batch subtree."""
    import contextlib
    import io

    hist = _history(spark, 100)
    bf = B.build_bloom(hist, "doc_id")
    # materialize the filter first so its build plan (which legitimately
    # shuffles) doesn't appear in the probe plan
    bf = bf.localCheckpoint(eager=True)
    probe = B.bloom_probe(_batch(spark, 0, 100), bf, "doc_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
