"""Fellegi-Sunter EM linkage tests (operators/linkage)."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.operators.linkage import (
    fs_em,
    fs_linkage_summary,
    fs_score,
)

SCHEMA = "g_name boolean, g_zip boolean, noise boolean"


def _pairs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _synthetic(n_match=20, n_non=180):
    # matches agree on name+zip (noise coin-flips deterministically);
    # non-matches rarely agree on either.
    rows = []
    for i in range(n_match):
        rows.append((True, True, i % 2 == 0))
    for i in range(n_non):
        rows.append((i % 20 == 0, i % 25 == 0, i % 2 == 0))
    return rows


def test_em_learns_discriminative_fields(spark):
    pairs = _pairs(spark, _synthetic())
    p, m, u = fs_em(pairs, ["g_name", "g_zip", "noise"], iters=5)
    # prevalence near 20/200 (slightly above: coincidental agreers)
    assert 0.05 < p < 0.25
    # name/zip: high m, low u — discriminative
    assert m[0] > 0.9 and u[0] < 0.15
    assert m[1] > 0.8 and u[1] < 0.15
    # the noise field carries (almost) no signal: m close to u
    assert abs(m[2] - u[2]) < 0.2
    assert (m[0] - u[0]) > 5 * abs(m[2] - u[2])


def test_scoring_separates_matches(spark):
    pairs = _pairs(spark, _synthetic())
    p, m, u = fs_em(pairs, ["g_name", "g_zip"], iters=5)
    scored = fs_score(pairs, ["g_name", "g_zip"], p, m, u)
    both = scored.filter("g_name AND g_zip").select("is_match", "match_weight")
    neither = scored.filter("NOT g_name AND NOT g_zip").select(
        "is_match", "match_weight"
    )
    assert all(r["is_match"] for r in both.collect())
    assert not any(r["is_match"] for r in neither.collect())
    assert both.first()["match_weight"] > 0 > neither.first()["match_weight"]


def test_em_deterministic_across_runs(spark):
    pairs = _pairs(spark, _synthetic()).repartition(7)
    a = fs_em(pairs, ["g_name", "g_zip", "noise"], iters=3)
    b = fs_em(pairs.repartition(3), ["g_name", "g_zip", "noise"], iters=3)
    assert a == b  # exact float equality: the decimal-sum discipline


def test_summary_shape_and_counts(spark):
    pairs = _pairs(spark, _synthetic())
    row = fs_linkage_summary(pairs, ["g_name", "g_zip"], iters=4).first()
    assert row["n_pairs"] == 200
    # the 20 true matches plus the few coincidental double-agreements
    assert 20 <= row["n_match"] <= 30
    assert set(row.asDict()) == {
        "n_pairs", "n_match", "p",
        "m_g_name", "u_g_name", "m_g_zip", "u_g_zip",
    }


def test_validates_inputs(spark):
    pairs = _pairs(spark, _synthetic())
    with pytest.raises(ValueError):
        fs_em(pairs, [], iters=3)
    with pytest.raises(ValueError):
        fs_em(pairs, ["g_name"], iters=0)
