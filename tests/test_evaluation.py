"""Evaluation-metric operator tests (operators/evaluation)."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.operators.evaluation import (
    calibration_bins,
    confusion_at,
    pr_curve,
    roc_auc,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "label boolean, score double")


def test_auc_perfect_and_inverted(spark):
    perfect = _scored(
        spark, [(True, 0.9), (True, 0.8), (False, 0.2), (False, 0.1)]
    )
    assert roc_auc(perfect).collect()[0]["auc"] == 1.0
    inverted = _scored(
        spark, [(True, 0.1), (True, 0.2), (False, 0.8), (False, 0.9)]
    )
    assert roc_auc(inverted).collect()[0]["auc"] == 0.0


def test_auc_ties_half_credit(spark):
    # all scores equal -> AUC must be exactly 0.5 via the tie term
    df = _scored(spark, [(True, 0.5), (True, 0.5), (False, 0.5), (False, 0.5)])
    r = roc_auc(df).collect()[0]
    assert r["auc"] == 0.5 and r["n_pos"] == 2 and r["n_neg"] == 2


def test_auc_matches_pairwise_definition(spark):
    import itertools
    import random

    rng = random.Random(7)
    rows = [(rng.random() < 0.4, round(rng.random(), 2)) for _ in range(60)]
    df = _scored(spark, rows)
    got = roc_auc(df).collect()[0]["auc"]
    pos = [s for l, s in rows if l]
    neg = [s for l, s in rows if not l]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    assert abs(got - round(wins / (len(pos) * len(neg)), 6)) < 1e-9


def test_pr_curve_monotone_recall(spark):
    df = _scored(
        spark,
        [(True, 0.9), (False, 0.8), (True, 0.7), (False, 0.3), (True, 0.2)],
    )
    rows = sorted(pr_curve(df).collect(), key=lambda r: -r["threshold"])
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls)  # recall grows as threshold drops
    assert rows[-1]["recall"] == 1.0
    # at the top threshold only the 0.9 positive is predicted
    assert rows[0]["tp"] == 1 and rows[0]["fp"] == 0 and rows[0]["precision"] == 1.0


def test_confusion_at_manual(spark):
    df = _scored(
        spark,
        [(True, 0.9), (True, 0.4), (False, 0.6), (False, 0.1)],
    )
    r = confusion_at(df, threshold=0.5).collect()[0]
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (1, 1, 1, 1)
    assert r["precision"] == 0.5 and r["recall"] == 0.5 and r["accuracy"] == 0.5


def test_calibration_bins_edges(spark):
    df = _scored(
        spark,
        [(True, 0.0), (False, 0.05), (True, 1.0), (False, 0.95), (True, 0.55)],
    )
    rows = {r["bin"]: r for r in calibration_bins(df, bins=10).collect()}
    assert rows[0]["n"] == 2 and rows[0]["frac_pos"] == 0.5
    assert rows[9]["n"] == 2  # 1.0 lands in the top bin, not bin 10
    assert rows[5]["n"] == 1 and rows[5]["frac_pos"] == 1.0
    assert abs(rows[9]["mean_score"] - 0.975) < 1e-9


def test_calibration_bins_validates(spark):
    df = _scored(spark, [(True, 0.5)])
    with pytest.raises(ValueError):
        calibration_bins(df, bins=0)


def test_topk_overlap_manual(spark):
    from econdatapipeline_spark.operators.evaluation import topk_overlap

    exact = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 7), (1, 8), (1, 9)],
        "query_id int, neighbor_id int",
    )
    approx = spark.createDataFrame(
        [(0, 2), (0, 3), (0, 99), (1, 5), (1, 6), (1, 4)],
        "query_id int, neighbor_id int",
    )
    out = {r["query_id"]: r for r in
           topk_overlap(approx, exact, k=3).collect()}
    assert out[0]["n_overlap"] == 2 and abs(out[0]["recall"] - round(2/3, 6)) < 1e-9
    assert out[1]["n_overlap"] == 0 and out[1]["recall"] == 0.0


def test_mutual_information_independent_and_identical(spark):
    from econdatapipeline_spark.operators.stats import mutual_information
    import math

    # independent columns -> MI = 0
    indep = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd" for _ in range(5)],
        "x string, y string",
    )
    assert mutual_information(indep, "x", "y").collect()[0]["mi"] == 0.0
    # perfectly dependent binary -> MI = ln 2
    dep = spark.createDataFrame(
        [("a", "c")] * 5 + [("b", "d")] * 5, "x string, y string"
    )
    r = mutual_information(dep, "x", "y").collect()[0]
    assert abs(r["mi"] - round(math.log(2), 6)) < 1e-9
    assert r["n_cells"] == 2


def test_conformal_width_exact_order_statistic(spark):
    from econdatapipeline_spark.operators.evaluation import conformal_width

    # residuals 1..10, alpha=0.2 -> k = ceil(11*0.8) = 9 -> width = 9
    rows = [("g", float(v)) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "grp string, resid double")
    out = conformal_width(df, "grp", "resid", alpha=0.2).collect()[0]
    assert out["n"] == 10 and out["k"] == 9 and out["width"] == 9.0


def test_conformal_width_small_group_null(spark):
    from econdatapipeline_spark.operators.evaluation import conformal_width

    # n=3, alpha=0.1 -> k = ceil(4*0.9) = 4 > n -> no guarantee
    rows = [("g", 1.0), ("g", 2.0), ("g", 3.0)]
    df = spark.createDataFrame(rows, "grp string, resid double")
    out = conformal_width(df, "grp", "resid", alpha=0.1).collect()[0]
    assert out["k"] == 4 and out["width"] is None


def test_conformal_width_coverage_empirical(spark):
    """The returned width must cover >= (1-alpha) of the calibration
    residuals themselves (finite-sample property)."""
    import random
    from econdatapipeline_spark.operators.evaluation import conformal_width

    rng = random.Random(11)
    resids = [rng.gauss(0, 5) for _ in range(200)]
    df = spark.createDataFrame([("g", r) for r in resids], "grp string, resid double")
    out = conformal_width(df, "grp", "resid", alpha=0.1).collect()[0]
    covered = sum(1 for r in resids if abs(r) <= out["width"]) / len(resids)
    assert covered >= 0.9


def test_conformal_width_validates(spark):
    from econdatapipeline_spark.operators.evaluation import conformal_width

    df = spark.createDataFrame([("g", 1.0)], "grp string, resid double")
    with pytest.raises(ValueError):
        conformal_width(df, "grp", "resid", alpha=1.5)


def test_expected_calibration_error_hand_computed(spark):
    from econdatapipeline_spark.operators.evaluation import (
        expected_calibration_error,
    )

    # two populated bins: [0.0-0.1): scores 0.05 x4, all negative
    # (gap 0.05); [0.9-1.0]: scores 0.95 x6, 3 positive (gap 0.45)
    rows = [(False, 0.05)] * 4 + [(True, 0.95)] * 3 + [(False, 0.95)] * 3
    df = spark.createDataFrame(rows, "label boolean, score double")
    r = expected_calibration_error(df, bins=10).collect()[0]
    assert r["n"] == 10
    exp_ece = 0.4 * 0.05 + 0.6 * 0.45
    assert abs(r["ece"] - exp_ece) < 1e-6
    assert abs(r["mce"] - 0.45) < 1e-9


def test_ece_zero_for_perfectly_calibrated(spark):
    from econdatapipeline_spark.operators.evaluation import (
        expected_calibration_error,
    )

    # bin [0.2, 0.3): score 0.25, exactly 1 of 4 positive... use 0.25
    rows = [(True, 0.25)] + [(False, 0.25)] * 3
    df = spark.createDataFrame(rows, "label boolean, score double")
    r = expected_calibration_error(df, bins=10).collect()[0]
    assert r["ece"] == 0.0 and r["mce"] == 0.0


def test_decile_lift_hand_values(spark):
    from econdatapipeline_spark.operators.evaluation import decile_lift

    # 20 distinct scores descending; positives at the 4 highest scores
    # and the 2 lowest (6 total). Each decile holds exactly 2 rows.
    rows = [(1 if i <= 4 or i >= 19 else 0, 21.0 - i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "label int, score double")
    out = {r["decile"]: r for r in decile_lift(df).collect()}
    assert set(out) == set(range(1, 11))
    assert all(out[d]["n"] == 2 for d in out)
    assert out[1]["n_pos"] == 2 and out[2]["n_pos"] == 2
    assert out[10]["n_pos"] == 2 and out[5]["n_pos"] == 0
    # cumulative gain: top-20% captures 4/6; full depth captures all
    assert abs(out[2]["cum_gain"] - round(4.0 / 6.0, 6)) < 1e-9
    assert out[10]["cum_gain"] == 1.0 and abs(out[10]["lift"] - 1.0) < 1e-9
    # lift at decile 1: (2/2) / (6/20) = 10/3
    assert abs(out[1]["lift"] - round(10.0 / 3.0, 6)) < 1e-9


def test_decile_lift_tied_scores_stay_together(spark):
    from econdatapipeline_spark.operators.evaluation import decile_lift

    # ALL rows share one score -> a single bucket at decile 10 holding
    # everything (count-based ceil(B*cum/N) on the distinct-score
    # relation), never an arbitrary within-tie split
    rows = [(i % 2, 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "label int, score double")
    out = decile_lift(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["decile"] == 10 and r["n"] == 8 and r["cum_gain"] == 1.0


def test_isotonic_calibrate_pools_violators(spark):
    from econdatapipeline_spark.operators.evaluation import isotonic_calibrate

    # bin rates: 0.2, 0.6, 0.4, 0.8 (bins 0..3, 5 rows each) — the
    # 0.6/0.4 violation pools to 0.5; ends stay put
    rows = []
    rates = [1, 3, 2, 4]  # positives per 5 rows in bins 0..3
    for b, npos in enumerate(rates):
        for i in range(5):
            rows.append((1 if i < npos else 0, (b + 0.5) / 4.0))
    df = spark.createDataFrame(rows, "label int, score double")
    out = {r["bin"]: r for r in isotonic_calibrate(df, bins=4).collect()}
    assert [out[b]["fit"] for b in range(4)] == [0.2, 0.5, 0.5, 0.8]
    assert out[1]["frac_pos"] == 0.6 and out[2]["frac_pos"] == 0.4
    # monotone by construction
    fits = [out[b]["fit"] for b in range(4)]
    assert fits == sorted(fits)


def test_isotonic_calibrate_already_monotone_is_identity(spark):
    from econdatapipeline_spark.operators.evaluation import isotonic_calibrate

    rows = []
    for b, npos in enumerate([0, 1, 3, 5]):
        for i in range(5):
            rows.append((1 if i < npos else 0, (b + 0.5) / 4.0))
    df = spark.createDataFrame(rows, "label int, score double")
    out = {r["bin"]: r for r in isotonic_calibrate(df, bins=4).collect()}
    for b, npos in enumerate([0, 1, 3, 5]):
        assert out[b]["fit"] == round(npos / 5.0, 6) == out[b]["frac_pos"]


def test_cem_att_hand_values(spark):
    from econdatapipeline_spark.operators.evaluation import cem_att

    # stratum 0 (score<0.5): controls mean 10; treated y=13 -> effect 3
    # stratum 1: controls mean 20; treated y=26, 22 -> effects 6, 2
    # stratum with no control: treated y=99 unmatched
    rows = [
        (0, 10.0, 0.2), (0, 10.0, 0.3),
        (1, 13.0, 0.25),
        (0, 18.0, 0.7), (0, 22.0, 0.8),
        (1, 26.0, 0.75), (1, 22.0, 0.6),
        (1, 99.0, 1.5),  # clamps to top stratum... keep in-range below
    ]
    # use bins=2 over [0,1]: 1.5 clamps into stratum 1 (has controls),
    # so instead put the unmatched treated in its own empty stratum via
    # bins=4: strata 0,1 hold [0,.25),[.25,.5)...
    df = spark.createDataFrame(rows[:-1], "t int, y double, s double")
    r = cem_att(df, "t", "y", "s", bins=2).first()
    assert r["n_treated"] == 3 and r["n_matched"] == 3
    assert r["n_strata_matched"] == 2
    assert abs(r["att"] - round((3 + 6 + 2) / 3.0, 6)) < 1e-9


def test_cem_att_unmatched_treated_drop_out(spark):
    from econdatapipeline_spark.operators.evaluation import cem_att

    rows = [
        (0, 10.0, 0.1), (1, 12.0, 0.15),  # stratum 0: matched, effect 2
        (1, 99.0, 0.9),                    # stratum 3: no controls
    ]
    df = spark.createDataFrame(rows, "t int, y double, s double")
    r = cem_att(df, "t", "y", "s", bins=4).first()
    assert r["n_treated"] == 2 and r["n_matched"] == 1
    assert r["n_strata_matched"] == 1 and abs(r["att"] - 2.0) < 1e-9


def test_ips_policy_value_hand_values(spark):
    from econdatapipeline_spark.operators.evaluation import ips_policy_value

    # behavior slice: purchase shown 1 of 4 times -> p = 0.25
    behavior = spark.createDataFrame(
        [("purchase", 0.0), ("view", 0.0), ("view", 0.0), ("click", 0.0)],
        "event_type string, value double",
    )
    # eval slice: 2 of 4 rows matched, rewards 10 and 20
    logged = spark.createDataFrame(
        [("purchase", 10.0), ("purchase", 20.0), ("view", 100.0),
         ("click", 100.0)],
        "event_type string, value double",
    )
    r = ips_policy_value(behavior, logged, target_action="purchase").first()
    assert r["n_eval"] == 4 and r["n_match"] == 2
    assert r["p_target"] == 0.25
    # IPS = (30 / 0.25) / 4 = 30; SNIPS = 30/2 = 15; logged = 230/4
    assert r["ips_value"] == 30.0
    assert r["snips_value"] == 15.0
    assert r["logged_value"] == 57.5


def test_ips_policy_no_match_guards(spark):
    from econdatapipeline_spark.operators.evaluation import ips_policy_value

    behavior = spark.createDataFrame(
        [("view", 0.0)], "event_type string, value double"
    )
    logged = spark.createDataFrame(
        [("view", 5.0)], "event_type string, value double"
    )
    r = ips_policy_value(behavior, logged, target_action="purchase").first()
    assert r["n_match"] == 0 and r["ips_value"] == 0.0
    assert r["snips_value"] == 0.0 and r["logged_value"] == 5.0
