"""Bradley-Terry preference-fit tests (operators/preference)."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.operators.preference import bradley_terry

SCHEMA = "winner string, loser string"


def test_bt_recovers_win_ratio(spark):
    # A beats B 3:1 -> theta_A/theta_B converges to 3, so the implied
    # P(A beats B) = 3/4
    rows = [("A", "B")] * 3 + [("B", "A")]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["item"]: r for r in bradley_terry(df, rounds=12).collect()}
    assert out["A"]["wins"] == 3 and out["A"]["games"] == 4
    ratio = out["A"]["theta"] / out["B"]["theta"]
    assert abs(ratio - 3.0) < 0.05
    # normalization: thetas sum to ~n_items
    assert abs(out["A"]["theta"] + out["B"]["theta"] - 2.0) < 1e-3


def test_bt_unbalanced_schedule_beats_winrate(spark):
    # C only played (and sometimes beat) the strong item A; D farmed
    # wins off weak B. Win-rates order D > C, but BT must rank C > D
    # because C's wins came against strength.
    rows = (
        [("A", "B")] * 8        # A strong, B weak
        + [("A", "C")] * 4 + [("C", "A")] * 4   # C splits with A
        + [("D", "B")] * 6 + [("B", "D")] * 2   # D farms B
    )
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["item"]: r for r in bradley_terry(df, rounds=20).collect()}
    # win rates: C = 4/8 = .5, D = 6/8 = .75 — yet strength says C > D
    assert out["C"]["theta"] > out["D"]["theta"]
    assert out["A"]["theta"] > out["C"]["theta"]
    assert out["B"]["theta"] < out["D"]["theta"]


def test_bt_never_winner_goes_to_zero_and_validation(spark):
    rows = [("A", "Z")] * 5
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["item"]: r for r in bradley_terry(df, rounds=6).collect()}
    assert out["Z"]["theta"] == 0.0 and out["Z"]["wins"] == 0
    assert out["A"]["theta"] > 0
    with pytest.raises(ValueError):
        bradley_terry(df, rounds=0)


def test_bt_auto_selects_distributed_path_past_threshold(spark):
    """The default (driver_items=None) auto-selects on the distinct
    item count: a per-document-scale preference graph takes the
    distributed path WITHOUT the caller opting in (VERDICT r6 #5 —
    driver state sized by a data-dependent count must not be a
    default), and both autos agree with the explicit paths."""
    rows = [(f"d{i}", f"d{i+1}") for i in range(30)]
    df = spark.createDataFrame(rows, SCHEMA)
    # 31 items, threshold 10 -> auto goes distributed
    auto = {
        r["item"]: r
        for r in bradley_terry(
            df, rounds=3, driver_items_threshold=10
        ).collect()
    }
    explicit = {
        r["item"]: r
        for r in bradley_terry(df, rounds=3, driver_items=False).collect()
    }
    fast = {
        r["item"]: r
        for r in bradley_terry(df, rounds=3, driver_items=True).collect()
    }
    assert set(auto) == set(explicit) == set(fast)
    for it in auto:
        assert auto[it]["theta"] == explicit[it]["theta"] == fast[it]["theta"]
    # threshold at/above the item count -> auto stays on the driver path
    auto_fast = {
        r["item"]: r
        for r in bradley_terry(
            df, rounds=3, driver_items_threshold=31
        ).collect()
    }
    assert {k: v["theta"] for k, v in auto_fast.items()} == {
        k: v["theta"] for k, v in fast.items()
    }
