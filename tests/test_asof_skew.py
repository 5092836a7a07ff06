"""Tests: as-of join, bucketed range join, salted join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from econdatapipeline_spark.operators.asof import asof_join, range_join_bucketed
from econdatapipeline_spark.operators.skew import salted_join, top_keys


def ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "u1"), (2, ts(20), "u1"), (3, ts(5), "u2")],
        ["id", "ts", "user"],
    )
    right = spark.createDataFrame(
        [("u1", ts(8), 80.0), ("u1", ts(15), 150.0), ("u2", ts(30), 300.0)],
        ["user", "ts", "px"],
    )
    out = {
        r["id"]: (r["ts_asof"], r["px_asof"])
        for r in asof_join(left, right, on="ts", by=["user"], right_cols=["px"]).collect()
    }
    assert out[1] == (ts(8), 80.0)      # latest right at or before :10
    assert out[2] == (ts(15), 150.0)    # :15 beats :8
    assert out[3] == (None, None)       # nothing at or before :05 for u2


def test_asof_equal_ts_inclusive_and_seq_tiebreak(spark):
    left = spark.createDataFrame([(1, ts(10), "u")], ["id", "ts", "user"])
    right = spark.createDataFrame(
        [("u", ts(10), 7, 1.0), ("u", ts(10), 9, 2.0), ("u", ts(9), 1, 3.0)],
        ["user", "ts", "seq", "px"],
    )
    row = asof_join(
        left, right, on="ts", by=["user"], right_cols=["px"], seq_col="seq"
    ).collect()[0]
    # >= semantics: equal-ts right row matches; max seq wins the tie.
    assert row["px_asof"] == 2.0


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, ts(30), "u")], ["id", "ts", "user"])
    right = spark.createDataFrame([("u", ts(10), 5.0)], ["user", "ts", "px"])
    strict = asof_join(
        left, right, on="ts", by=["user"], right_cols=["px"],
        tolerance=F.expr("INTERVAL 10 MINUTES"),
    ).collect()[0]
    loose = asof_join(
        left, right, on="ts", by=["user"], right_cols=["px"],
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    ).collect()[0]
    assert strict["px_asof"] is None and loose["px_asof"] == 5.0


def test_range_join_matches_theta_join(spark):
    points = spark.range(0, 200).select(
        F.col("id"), (F.col("id") * 1.7 % 97).alias("v")
    )
    bands = spark.range(0, 12).select(
        F.col("id").alias("band"),
        (F.col("id") * 9.0).alias("lo"),
        (F.col("id") * 9.0 + 13.0).alias("hi"),
    )
    fast = range_join_bucketed(
        points, bands, left_point="v", right_lo="lo", right_hi="hi",
        bucket_width=F.lit(9.0),
    ).select("id", "band")
    slow = (
        points.crossJoin(bands)
        .filter((F.col("lo") <= F.col("v")) & (F.col("v") < F.col("hi")))
        .select("id", "band")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_salted_join_equals_plain_join(spark):
    # 90% of fact rows share one hot key — the salting target.
    fact = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 == 0, F.col("id") % 7).otherwise(F.lit(3)).alias("k"),
        F.col("id").alias("rowid"),
    )
    dim = spark.range(0, 7).select(F.col("id").alias("dk"), (F.col("id") * 100).alias("attr"))
    salted = salted_join(fact, dim, "k", "dk", num_salts=4).select("rowid", "attr")
    plain = fact.join(dim, fact.k == dim.dk).select("rowid", "attr")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_same_named_keys(spark):
    # Same-named fact/dim key must not be ambiguous — the join keys are
    # qualified through each side's DataFrame.
    fact = spark.range(0, 100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("rowid")
    )
    dim = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    )
    out = salted_join(fact, dim, "k", "k", num_salts=3).select("rowid", "attr")
    plain = fact.join(dim.withColumnRenamed("k", "dk"), F.col("k") == F.col("dk"))
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.select("rowid", "attr").collect())
    )


def test_salted_join_left_keeps_unmatched_fact_rows(spark):
    fact = spark.createDataFrame([(1, 10), (9, 11)], "k long, rowid long")
    dim = spark.createDataFrame([(1, 100)], "dk long, attr long")
    out = salted_join(fact, dim, "k", "dk", num_salts=4, how="left")
    got = sorted((r["rowid"], r["attr"]) for r in out.collect())
    assert got == [(10, 100), (11, None)]


def test_salted_join_rejects_right_and_full(spark):
    # right/full would emit num_salts null-extended duplicates per
    # unmatched dim key (the dim side is exploded n-fold).
    import pytest

    fact = spark.range(3).select(F.col("id").alias("k"))
    dim = spark.range(3).select(F.col("id").alias("dk"))
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner"):
            salted_join(fact, dim, "k", "dk", how=how)


def test_top_keys_diagnostic(spark):
    fact = spark.range(0, 100).select(
        F.when(F.col("id") < 80, F.lit(1)).otherwise(F.col("id")).alias("k")
    )
    top = top_keys(fact, "k", n=1).collect()[0]
    assert top["k"] == 1 and top["n_rows"] == 80 and abs(top["share"] - 0.8) < 1e-9


def test_skew_report_uniform_vs_skewed(spark):
    from econdatapipeline_spark.operators.skew import skew_report
    import math

    uniform = spark.createDataFrame(
        [(i % 10,) for i in range(100)], "k long"
    )
    r = skew_report(uniform, "k").collect()[0]
    assert r["n"] == 100 and r["n_keys"] == 10 and r["max_n"] == 10
    assert r["balance"] == 1.0 and abs(r["entropy"] - round(math.log(10), 6)) < 1e-9
    skewed = spark.createDataFrame(
        [(0,)] * 91 + [(i,) for i in range(1, 10)], "k long"
    )
    s = skew_report(skewed, "k").collect()[0]
    assert s["top1_share"] == 0.91
    assert s["balance"] < 0.3  # heavily dominated


def test_skew_report_single_key_null_balance(spark):
    from econdatapipeline_spark.operators.skew import skew_report

    one = spark.createDataFrame([(7,)] * 5, "k long")
    r = skew_report(one, "k").collect()[0]
    assert r["n_keys"] == 1 and r["entropy"] == 0.0 and r["balance"] is None
