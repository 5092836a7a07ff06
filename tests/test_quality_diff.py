"""Data-quality validation (operators/quality.py) and snapshot diff
(operators/diff.py)."""

from __future__ import annotations

from econdatapipeline_spark.operators.diff import snapshot_diff
from econdatapipeline_spark.operators.quality import (
    Check,
    check_unique,
    in_range,
    matches,
    not_null,
    one_of,
    validate,
)
from pyspark.sql import functions as F


def test_validate_counts_each_violation_kind(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "ok", "a-1"),
            (None, -5.0, "bad", "zz"),   # violates all four
            (3, None, "ok", "b-2"),      # null range value counts as violation
        ],
        "id long, v double, status string, code string",
    )
    row = validate(
        df,
        [
            not_null("id"),
            in_range("v", 0, 100),
            one_of("status", ["ok"]),
            matches("code", "^[a-z]-[0-9]$"),
        ],
    ).collect()[0]
    assert row["total_rows"] == 3
    assert row["id_not_null_violations"] == 1
    assert row["v_in_range_violations"] == 2
    assert row["status_one_of_violations"] == 1
    assert row["code_matches_violations"] == 1


def test_validate_custom_check_and_single_pass_plan(spark):
    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    rep = validate(df, [Check("a_lt_b", F.col("a") < F.col("b"))])
    assert rep.collect()[0]["a_lt_b_violations"] == 0
    # one aggregate over one scan: no joins, no extra exchanges
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rep.explain()
    assert "Join" not in buf.getvalue()


def test_check_unique(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "k long, v string"
    )
    row = check_unique(df, ["k"]).collect()[0]
    assert (row["n_keys"], row["n_dup_keys"], row["n_dup_rows"]) == (2, 1, 2)


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, None, "d")],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [(2, 20.0005, "b"),          # within tolerance -> unchanged
         (3, 30.1, "c"),             # value moved -> updated
         (4, None, "D"),             # string changed, null value stable -> updated
         (5, 50.0, "e")],            # new key -> inserted
        "k long, v double, s string",
    )
    out = {r["k"]: r["change"] for r in
           snapshot_diff(old, new, ["k"], ["v", "s"]).collect()}
    assert out == {1: "deleted", 2: "unchanged", 3: "updated", 4: "updated", 5: "inserted"}


def test_snapshot_diff_null_transitions_are_updates(spark):
    old = spark.createDataFrame([(1, None)], "k long, v double")
    new = spark.createDataFrame([(1, 5.0)], "k long, v double")
    out = snapshot_diff(old, new, ["k"], ["v"]).collect()[0]
    assert out["change"] == "updated" and out["old_v"] is None and out["new_v"] == 5.0


def test_snapshot_diff_agrees_with_smart_update(spark):
    """Cross-validation of two independent change-detection paths.

    smart_update (the write-side MERGE) and snapshot_diff (the
    read-side CDC classifier) implement the same 0.001-tolerance
    semantics; on a seeded random pair of snapshots their counts must
    agree exactly: new==inserted, updated==updated, and unchanged
    matches keys present on both sides minus updates.
    """
    import datetime as dt
    import random

    from econdatapipeline_spark.operators.merge import smart_update

    rng = random.Random(7)
    base = dt.date(2020, 1, 1)
    old_rows, new_rows = [], []
    for i in range(400):
        d = base + dt.timedelta(days=i)
        v = round(rng.uniform(0, 100), 3)
        in_old, in_new = rng.random() < 0.8, rng.random() < 0.8
        if in_old:
            old_rows.append((d, v))
        if in_new:
            # nudge some values: below tolerance, above, or unchanged
            delta = rng.choice([0.0, 0.0005, 0.5, -2.0])
            new_rows.append((d, round(v + delta, 4)))
    old = spark.createDataFrame(old_rows, "date date, value double")
    new = spark.createDataFrame(new_rows, "date date, value double")

    mr = smart_update(
        old, new, key_cols=["date"], value_cols=["value"], dataset="x",
        run_ts=dt.datetime(2024, 1, 1, 0, 0, 0),
    )
    counts = mr.counts()

    diff = {
        r["change"]: r["n"]
        for r in __import__("econdatapipeline_spark.operators.diff", fromlist=["snapshot_diff"])
        .snapshot_diff(old, new, ["date"], ["value"])
        .groupBy("change").agg(F.count("*").alias("n")).collect()
    }
    assert diff.get("inserted", 0) == counts["new"]
    assert diff.get("updated", 0) == counts["updated"] == counts["revisions"]
    assert diff.get("inserted", 0) > 0 and diff.get("updated", 0) > 0
    assert diff.get("deleted", 0) > 0  # smart_update keeps these; diff reports them


def test_table_checksum_order_and_partition_invariant(spark):
    from econdatapipeline_spark.operators.quality import table_checksum

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, 3.5)],
        "k long, s string, v double",
    ).withColumn("v_c", F.col("v").cast("decimal(12,2)"))
    cols = ["k", "s", "v_c"]
    base = table_checksum(df, cols).collect()[0]
    assert base["n_rows"] == 3

    shuffled = table_checksum(
        df.repartition(7).sortWithinPartitions(F.desc("k")), cols
    ).collect()[0]
    assert shuffled["checksum"] == base["checksum"]

    changed = table_checksum(
        df.withColumn("v_c", F.when(F.col("k") == 2, F.lit(9.99).cast("decimal(12,2)")).otherwise(F.col("v_c"))),
        cols,
    ).collect()[0]
    assert changed["checksum"] != base["checksum"]

    grouped = {r["k"]: r for r in table_checksum(df, cols, group_by=["k"]).collect()}
    assert len(grouped) == 3 and all(r["n_rows"] == 1 for r in grouped.values())


def test_profile_stats_exact(spark):
    from econdatapipeline_spark.operators.quality import profile_stats

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 10.0), (3.0, None), (4.0, 10.0)], "a double, b double"
    )
    out = {r["column"]: r for r in profile_stats(df, ["a", "b"]).collect()}
    a = out["a"]
    assert (a["n"], a["mean"], a["min"], a["max"]) == (4, 2.5, 1.0, 4.0)
    assert a["variance"] == 1.25  # population variance of 1..4
    b = out["b"]
    assert (b["n"], b["mean"], b["variance"]) == (3, 10.0, 0.0)  # nulls excluded


def test_quantile_filter_drops_bottom_fraction(spark):
    from econdatapipeline_spark.operators.quality import quantile_filter

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, score double"
    )
    out = quantile_filter(df, "score", 0.25)
    rows = out.collect()
    # exact percentile(1..100, .25) = 1 + 0.25*99 = 25.75 -> keep 26..100
    assert {r["cutoff"] for r in rows} == {25.75}
    assert sorted(r["id"] for r in rows) == list(range(26, 101))


def test_quantile_filter_validates_fraction(spark):
    import pytest

    from econdatapipeline_spark.operators.quality import quantile_filter

    df = spark.createDataFrame([(1, 1.0)], "id long, score double")
    with pytest.raises(ValueError):
        quantile_filter(df, "score", 1.0)


def test_validate_samples_evidence(spark):
    from econdatapipeline_spark.operators.quality import (
        in_range,
        not_null,
        validate_samples,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, None), (4, 99.0), (5, 120.0), (6, 150.0)],
        "id long, v double",
    )
    out = {r["check"]: r for r in validate_samples(
        df, [in_range("v", 0, 100), not_null("v")], id_col="id", k=2
    ).collect()}
    # in_range fails: id 3 (null -> violation), 5, 120? v=120 and 150
    assert out["v_in_range"]["n_violations"] == 3  # ids 3, 5, 6
    assert out["v_in_range"]["sample_ids"] == [3, 5]  # k smallest
    assert out["v_not_null"]["n_violations"] == 1
    assert out["v_not_null"]["sample_ids"] == [3]


def test_validate_samples_healthy_rule_absent(spark):
    from econdatapipeline_spark.operators.quality import (
        not_null,
        validate_samples,
    )

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    assert validate_samples(df, [not_null("v")], id_col="id").count() == 0


def test_k_anonymity_flags_small_classes(spark):
    from econdatapipeline_spark.operators.quality import k_anonymity

    rows = [("us", "a")] * 5 + [("us", "b")] * 2 + [("fr", "a")] * 7
    df = spark.createDataFrame(rows, "nation string, seg string")
    out = {(r["nation"], r["seg"]): r for r in
           k_anonymity(df, ["nation", "seg"], k=5).collect()}
    assert not out[("us", "a")]["at_risk"]
    assert out[("us", "b")]["at_risk"] and out[("us", "b")]["class_size"] == 2
    assert not out[("fr", "a")]["at_risk"]


def test_k_anonymity_l_diversity_counts(spark):
    from econdatapipeline_spark.operators.quality import k_anonymity

    rows = [("us", "flu"), ("us", "flu"), ("us", "cold"), ("fr", "flu")]
    df = spark.createDataFrame(rows, "nation string, dx string")
    out = {r["nation"]: r for r in
           k_anonymity(df, ["nation"], k=2, sensitive_col="dx").collect()}
    assert out["us"]["n_sensitive"] == 2
    assert out["fr"]["n_sensitive"] == 1  # k-anonymity fails AND no diversity


def test_anonymity_summary_gate(spark):
    from econdatapipeline_spark.operators.quality import anonymity_summary
    import pytest as _pytest

    good = spark.createDataFrame([("a",)] * 5 + [("b",)] * 6, "q string")
    r = anonymity_summary(good, ["q"], k=5).collect()[0]
    assert r["k_anonymous"] and r["n_at_risk_rows"] == 0
    bad = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, "q string")
    r2 = anonymity_summary(bad, ["q"], k=5).collect()[0]
    assert not r2["k_anonymous"]
    assert r2["n_at_risk_rows"] == 2 and r2["min_class"] == 2
    with _pytest.raises(ValueError):
        anonymity_summary(good, [], k=5)


def test_benford_audit_known_distribution(spark):
    from econdatapipeline_spark.operators.quality import benford_audit

    # exponential growth 1.5^i cycles first digits Benford-ishly; the
    # contract here is exact counting + exclusion rules, not the law
    rows = [(1.5 ** i,) for i in range(40)] + [(0.0,), (None,), (-250.0,)]
    df = spark.createDataFrame(rows, "x double")
    out = {r["digit"]: r for r in benford_audit(df, "x").collect()}
    assert sum(r["n"] for r in out.values()) == 41  # zero+null excluded
    # negative magnitude counted under its first digit (2 from -250)
    assert out[2]["n"] >= 1
    total = sum(r["n"] for r in out.values())
    for r in out.values():
        assert r["frac"] == round(r["n"] / total, 6)
        assert 0 < r["benford"] < 0.31


def test_benford_audit_keeps_large_magnitudes(spark):
    from econdatapipeline_spark.operators.quality import benford_audit

    # |values| >= 1e12 overflow a decimal(18,6) cast to null — a fraud
    # screen must keep them (decimal(38,6) holds up to 1e32): all ten
    # rows land on their true first digit
    rows = [(float(d) * 10.0**15,) for d in range(1, 10)] + [(2.0e20,)]
    df = spark.createDataFrame(rows, "x double")
    out = {r["digit"]: r for r in benford_audit(df, "x").collect()}
    assert sum(r["n"] for r in out.values()) == 10
    assert out[2]["n"] == 2  # 2e15 and 2e20


def test_tokenizer_fertility_hand_values(spark):
    from econdatapipeline_spark.operators.quality import tokenizer_fertility

    # "ab cd." -> words 2; bpe-ish: ab, cd, '.' -> 3 subwords, 6 chars
    df = spark.createDataFrame(
        [("s1", "ab cd."), ("s2", "x1y")],
        "source string, text string",
    )
    out = {r["source"]: r for r in tokenizer_fertility(df).collect()}
    assert out["s1"]["n_words"] == 2 and out["s1"]["n_subwords"] == 3
    assert out["s1"]["fertility"] == 1.5
    assert out["s1"]["chars_per_subword"] == 2.0
    # x1y -> 1 word, 3 subwords (x, 1, y): digit boundaries split
    assert out["s2"]["n_words"] == 1 and out["s2"]["n_subwords"] == 3
