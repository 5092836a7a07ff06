"""Target-encoding tests (operators/encoding)."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.operators.encoding import (
    target_encode,
    target_encoding_table,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, cat string, y double")


def test_out_of_fold_excludes_own_fold(spark):
    # folds=2: cell (cat, f) must encode from the OTHER fold's rows only
    rows = [(i, "a", float(i)) for i in range(40)]
    df = _df(spark, rows)
    tab = {(r["cat"], r["fold"]): r for r in
           target_encoding_table(df, "cat", "y", "id", folds=2,
                                 smoothing=1.0).collect()}
    # reconstruct expected from the md5 fold deal the operator used
    enc_rows = target_encode(df, "cat", "y", "id", folds=2,
                             smoothing=1.0).collect()
    fold_of = {r["id"]: r["fold"] for r in enc_rows}
    prior = sum(y for _, _, y in rows) / len(rows)
    for f in (0, 1):
        in_f = [y for i, _, y in rows if fold_of[i] == f]
        out_f = [y for i, _, y in rows if fold_of[i] != f]
        expected = (sum(out_f) + 1.0 * prior) / (len(out_f) + 1.0)
        assert abs(tab[("a", f)]["enc"] - round(expected, 6)) < 1e-9
        assert tab[("a", f)]["n_out"] == len(out_f)


def test_rare_category_shrinks_to_prior(spark):
    # one row in category 'rare': its out-of-fold stats are empty, so
    # the encoding must equal the global prior exactly
    rows = [(i, "common", 10.0) for i in range(50)] + [(99, "rare", 1000.0)]
    df = _df(spark, rows)
    enc = {r["id"]: r["enc"] for r in
           target_encode(df, "cat", "y", "id", folds=5,
                         smoothing=20.0).collect()}
    prior = (50 * 10.0 + 1000.0) / 51
    assert abs(enc[99] - round(prior, 6)) < 1e-9


def test_every_row_encoded_once(spark):
    rows = [(i, "ab"[i % 2], float(i % 7)) for i in range(100)]
    out = target_encode(_df(spark, rows), "cat", "y", "id", folds=3).collect()
    assert len(out) == 100
    assert len({r["id"] for r in out}) == 100


def test_validation(spark):
    df = _df(spark, [(0, "a", 1.0)])
    with pytest.raises(ValueError):
        target_encoding_table(df, "cat", "y", "id", folds=1)
    with pytest.raises(ValueError):
        target_encoding_table(df, "cat", "y", "id", smoothing=0.0)
