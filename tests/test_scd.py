"""SCD2 intervals and as-of reconstruction (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from econdatapipeline_spark.operators.scd import scd2_intervals, value_asof

T1 = dt.datetime(2025, 1, 1)
T2 = dt.datetime(2025, 2, 1)
T3 = dt.datetime(2025, 3, 1)

REV_SCHEMA = (
    "dataset string, data_date string, value_field string, "
    "old_value double, new_value double, revision_date timestamp"
)


def _revlog(spark):
    rows = [
        # key A: 10 -> 20 -> 30 (three epochs)
        ("d", "A", "v", 10.0, 20.0, T1),
        ("d", "A", "v", 20.0, 30.0, T2),
        # key B: 5 -> 7 (two epochs)
        ("d", "B", "v", 5.0, 7.0, T2),
    ]
    return spark.createDataFrame(rows, REV_SCHEMA)


def test_scd2_intervals_tile_the_timeline(spark):
    out = scd2_intervals(_revlog(spark)).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["data_date"], []).append(r)
    a = sorted(by_key["A"], key=lambda r: (r["valid_from"] is not None, r["valid_from"]))
    assert [r["value"] for r in a] == [10.0, 20.0, 30.0]
    assert a[0]["valid_from"] is None and a[0]["valid_to"] == T1
    assert a[1]["valid_from"] == T1 and a[1]["valid_to"] == T2
    assert a[2]["valid_from"] == T2 and a[2]["valid_to"] is None
    assert [r["is_current"] for r in a] == [False, False, True]
    b = sorted(by_key["B"], key=lambda r: (r["valid_from"] is not None,))
    assert [r["value"] for r in b] == [5.0, 7.0]
    assert len(out) == 5


def test_value_asof_reconstructs_each_epoch(spark):
    rev = _revlog(spark).withColumn("key", F.col("data_date"))
    current = spark.createDataFrame(
        [("A", 30.0), ("B", 7.0), ("C", 1.0)], "key string, val double"
    )

    def asof(ts):
        out = value_asof(
            current, rev, F.lit(ts), key_cols=["key"], value_col="val"
        )
        return {r["key"]: r["val"] for r in out.collect()}

    # before any revision: original values; C (never revised) = current
    assert asof(dt.datetime(2024, 12, 1)) == {"A": 10.0, "B": 5.0, "C": 1.0}
    # between T1 and T2: A has had its first revision applied
    assert asof(dt.datetime(2025, 1, 15)) == {"A": 20.0, "B": 5.0, "C": 1.0}
    # after all revisions: current state
    assert asof(T3) == {"A": 30.0, "B": 7.0, "C": 1.0}


def test_value_asof_boundary_is_exclusive(spark):
    # a revision AT ts is already in effect (filter is revision_date > ts)
    rev = _revlog(spark)
    current = spark.createDataFrame([("A", 30.0)], "key string, val double")
    out = value_asof(
        current,
        rev.withColumn("key", F.col("data_date")),
        F.lit(T1),
        key_cols=["key"],
        value_col="val",
    ).collect()
    assert out[0]["val"] == 20.0


def test_scd2_invariants_random_log(spark):
    """Property: for any revision log, each key's intervals tile the
    timeline — start open-ended, end with exactly one is_current row,
    connect end-to-start with no gaps, and chain old->new values."""
    import random

    rng = random.Random(42)
    rows = []
    for key in range(40):
        v = float(rng.randint(0, 50))
        n_revs = rng.randint(1, 6)
        ts_days = sorted(rng.sample(range(1, 300), n_revs))
        for d in ts_days:
            nv = v + float(rng.randint(1, 9))
            rows.append(
                ("d", f"K{key}", "v", v, nv, dt.datetime(2024, 1, 1) + dt.timedelta(days=d))
            )
            v = nv
    log = spark.createDataFrame(rows, REV_SCHEMA)
    out = scd2_intervals(log).collect()

    by_key = {}
    for r in out:
        by_key.setdefault(r["data_date"], []).append(r)
    for key, ivs in by_key.items():
        ivs.sort(key=lambda r: (r["valid_from"] is not None, r["valid_from"]))
        assert ivs[0]["valid_from"] is None                      # open start
        assert sum(r["is_current"] for r in ivs) == 1            # one current
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to"] is None
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev["valid_to"] == nxt["valid_from"]         # no gaps
        # value chain: each epoch's value carries into the next revision's old
        revs = sorted(
            (r for r in log.collect() if r["data_date"] == key),
            key=lambda r: r["revision_date"],
        )
        assert [iv["value"] for iv in ivs] == [revs[0]["old_value"]] + [
            r["new_value"] for r in revs
        ]


def test_scd2_join_event_time_lookup(spark):
    """Each fact picks its own epoch; NULL ends are open; untracked
    keys survive the left join with NULL dimension columns."""
    import datetime as dt

    from econdatapipeline_spark.operators.scd import scd2_intervals, scd2_join

    t1, t2 = dt.datetime(2025, 6, 1), dt.datetime(2025, 6, 2)
    revs = spark.createDataFrame(
        [
            ("d", "k1", "v", 1.0, 2.0, t1),
            ("d", "k1", "v", 2.0, 3.0, t2),
        ],
        "dataset string, data_date string, value_field string, "
        "old_value double, new_value double, revision_date timestamp",
    )
    iv = scd2_intervals(revs)
    facts = spark.createDataFrame(
        [
            ("d", "k1", "v", dt.datetime(2025, 5, 1)),   # initial epoch
            ("d", "k1", "v", t1),                        # boundary: epoch starts AT t1
            ("d", "k1", "v", dt.datetime(2025, 6, 1, 12)),
            ("d", "k1", "v", dt.datetime(2025, 7, 1)),   # current epoch
            ("d", "k9", "v", t1),                        # untracked key
        ],
        "dataset string, data_date string, value_field string, ts timestamp",
    )
    out = scd2_join(facts, iv, ["dataset", "data_date", "value_field"], "ts")
    got = {(r["data_date"], r["ts"]): (r["value"], r["is_current"]) for r in out.collect()}
    assert len(got) == 5  # exactly one row per fact
    assert got[("k1", dt.datetime(2025, 5, 1))] == (1.0, False)
    assert got[("k1", t1)] == (2.0, False)               # half-open: [from, to)
    assert got[("k1", dt.datetime(2025, 6, 1, 12))] == (2.0, False)
    assert got[("k1", dt.datetime(2025, 7, 1))] == (3.0, True)
    assert got[("k9", t1)] == (None, None)               # left join survivor


def test_scd2_join_rejects_colliding_column_names(spark):
    import pytest

    from econdatapipeline_spark.operators.scd import scd2_join

    facts = spark.createDataFrame(
        [(1, 10, 99.0)], "k long, ts long, value double"
    )
    dims = spark.createDataFrame(
        [(1, 0, None, 5.0)], "k long, valid_from long, valid_to long, value double"
    )
    with pytest.raises(ValueError, match="share non-key column"):
        scd2_join(facts, dims, key_cols=["k"], ts_col="ts")
