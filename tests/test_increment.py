"""Incremental rollup maintenance (operators/increment.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from econdatapipeline_spark.operators.increment import maintain_rollup, partial_agg

ROWS = [
    # (key, amount) — two batches sharing key 'a', key 'c' only in delta
    ("a", 10.0), ("a", 20.0), ("b", 5.0),
]
DELTA = [("a", 1.5), ("c", 7.0), ("c", 3.0)]


def _maintained(spark):
    hist = spark.createDataFrame(ROWS, "k string, amt double")
    delta = spark.createDataFrame(DELTA, "k string, amt double")
    return maintain_rollup(
        partial_agg(hist, ["k"], ["amt"], "n"),
        partial_agg(delta, ["k"], ["amt"], "n"),
        ["k"],
        ["amt"],
        "n",
    )


def test_maintained_equals_from_scratch(spark):
    full = spark.createDataFrame(ROWS + DELTA, "k string, amt double")
    expect = {
        (r["k"], float(r["amt"]), r["n"])
        for r in partial_agg(full, ["k"], ["amt"], "n").collect()
    }
    got = {(r["k"], float(r["amt"]), r["n"]) for r in _maintained(spark).collect()}
    assert got == expect
    # both paths exercised: 'a' updated, 'b' untouched, 'c' appended fresh
    assert {k for k, _, _ in got} == {"a", "b", "c"}


def test_empty_delta_is_identity(spark):
    hist = spark.createDataFrame(ROWS, "k string, amt double")
    empty = spark.createDataFrame([], "k string, amt double")
    rollup = partial_agg(hist, ["k"], ["amt"], "n")
    got = {
        (r["k"], float(r["amt"]), r["n"])
        for r in maintain_rollup(
            rollup, partial_agg(empty, ["k"], ["amt"], "n"), ["k"], ["amt"], "n"
        ).collect()
    }
    assert got == {(r["k"], float(r["amt"]), r["n"]) for r in rollup.collect()}


def test_rollup_side_never_shuffles(spark):
    """The scale contract: every join broadcasts the delta (or the
    delta-sized matched-keys relation); the rollup is never the
    hash-build side and never exchanged after its own aggregation."""
    hist = spark.createDataFrame(ROWS, "k string, amt double")
    delta = spark.createDataFrame(DELTA, "k string, amt double")
    rollup = partial_agg(hist, ["k"], ["amt"], "n").localCheckpoint(eager=True)
    out = maintain_rollup(
        rollup, partial_agg(delta, ["k"], ["amt"], "n"), ["k"], ["amt"], "n"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_maintain_rollup_null_history_sum_absorbs_delta(spark):
    """Regression: a stored NULL sum (all-NULL measures in history)
    must not swallow the delta's values."""
    from pyspark.sql import functions as F

    from econdatapipeline_spark.operators.increment import (
        maintain_rollup,
        partial_agg,
    )

    hist = spark.createDataFrame([("k", None)], "g string, v double")
    delta = spark.createDataFrame([("k", 5.0)], "g string, v double")
    rolled = maintain_rollup(
        partial_agg(hist, ["g"], ["v"], "n"),
        partial_agg(delta, ["g"], ["v"], "n"),
        ["g"], ["v"], "n",
    )
    scratch = partial_agg(hist.unionByName(delta), ["g"], ["v"], "n")
    got = {(r["g"], float(r["v"]), r["n"]) for r in rolled.collect()}
    want = {(r["g"], float(r["v"]), r["n"]) for r in scratch.collect()}
    assert got == want
