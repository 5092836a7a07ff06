"""Batched property tests for the round-5 operator families.

Same discipline as test_property_batch.py / _round4.py: seeded random
data, one Spark job per property, independent pure-Python references.
"""

from __future__ import annotations

import datetime as dt
import math
import random


def _rand_series(spark, n_groups=3, n=40, seed=11):
    rng = random.Random(seed)
    rows = []
    for g in range(n_groups):
        base = rng.uniform(50, 150)
        for i in range(n):
            rows.append(
                (
                    f"g{g}",
                    dt.date(2015, 1, 1) + dt.timedelta(days=31 * i),
                    base + rng.uniform(-30, 30) + 0.5 * i * rng.random(),
                )
            )
    return rows, spark.createDataFrame(
        rows, "dataset string, date date, value double"
    )


def test_acf_python_reference_and_bounds(spark):
    """Engine acf equals the direct O(n^2) Python formula; |acf| <= 1
    for every lag (full-variance denominator)."""
    from econdatapipeline_spark.operators.timeseries import acf

    rows, df = _rand_series(spark, seed=3)
    got = {(r["dataset"], r["lag"]): r for r in acf(df, max_lag=5).collect()}
    series = {}
    for g, d, v in rows:
        series.setdefault(g, []).append((d, v))
    for g, pts in series.items():
        xs = [v for _, v in sorted(pts)]
        n = len(xs)
        xbar = sum(xs) / n
        den = sum((x - xbar) ** 2 for x in xs)
        for k in range(1, 6):
            num = sum(
                (xs[i] - xbar) * (xs[i + k] - xbar) for i in range(n - k)
            )
            r = got[(g, k)]
            assert r["n_pairs"] == n - k
            assert math.isclose(r["acf"], num / den, abs_tol=2e-6), (g, k)
            assert abs(r["acf"]) <= 1.0 + 1e-9


def test_pacf_matches_python_durbin_levinson(spark):
    """Engine pacf equals a Python Durbin-Levinson replay seeded from
    the engine's own acf output (identical rounded inputs)."""
    from econdatapipeline_spark.operators.timeseries import acf, pacf

    rows, df = _rand_series(spark, n_groups=2, seed=5)
    rho = {}
    for r in acf(df, max_lag=5).collect():
        rho.setdefault(r["dataset"], {})[r["lag"]] = r["acf"]
    got = {(r["dataset"], r["lag"]): r["pacf"] for r in pacf(df, max_lag=5).collect()}
    for g, rr in rho.items():
        phi = {(1, 1): rr[1]}
        for k in range(2, 6):
            num, den = rr[k], 1.0
            for j in range(1, k):
                num -= phi[(k - 1, j)] * rr[k - j]
                den -= phi[(k - 1, j)] * rr[j]
            phi[(k, k)] = num / den if den != 0 else 0.0
            for j in range(1, k):
                phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
        for k in range(1, 6):
            assert math.isclose(got[(g, k)], round(phi[(k, k)], 6), abs_tol=2e-6), (g, k)


def test_mann_whitney_python_reference(spark):
    """U, auc, and z against a brute-force pairwise Python count with
    the tie-corrected normal approximation."""
    from econdatapipeline_spark.operators.stats import mann_whitney

    rng = random.Random(17)
    # quantized values force ties — the interesting case
    a = [round(rng.uniform(0, 5)) * 1.0 for _ in range(80)]
    b = [round(rng.uniform(1, 6)) * 1.0 for _ in range(60)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "s string, v double")
    out = mann_whitney(df, "v", "s", "a", "b").collect()[0]

    u = sum(1.0 for x in a for y in b if x > y) + 0.5 * sum(
        1 for x in a for y in b if x == y
    )
    n1, n2 = len(a), len(b)
    n = n1 + n2
    from collections import Counter
    ties = Counter(a + b)
    tie3 = sum(t**3 - t for t in ties.values())
    var = n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u - n1 * n2 / 2.0) / math.sqrt(var)
    assert out["n_a"] == n1 and out["n_b"] == n2
    assert out["u_stat"] == round(u, 6)
    assert math.isclose(out["auc"], u / (n1 * n2), abs_tol=1e-6)
    assert math.isclose(out["z"], z, abs_tol=1e-6)


def test_kendall_tau_brute_force_reference(spark):
    """tau-b against the O(n^2) definition on quantized data with ties
    on both axes."""
    from econdatapipeline_spark.operators.stats import kendall_tau

    rng = random.Random(23)
    pts = [
        (float(rng.randint(0, 8)), float(rng.randint(0, 8))) for _ in range(70)
    ]
    df = spark.createDataFrame(pts, "x double, y double")
    out = kendall_tau(df, "x", "y").collect()[0]
    c = d = tx = ty = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[j][0] - pts[i][0]
            dy = pts[j][1] - pts[i][1]
            if dx == 0 and dy == 0:
                continue
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif dx * dy > 0:
                c += 1
            else:
                d += 1
    tau = (c - d) / math.sqrt((c + d + tx) * (c + d + ty))
    assert out["concordant"] == c and out["discordant"] == d
    assert math.isclose(out["tau"], tau, abs_tol=1e-6)


def test_jsd_python_reference_symmetry_and_bound(spark):
    """JSD equals the direct formula, is symmetric in its sides, and
    never exceeds ln 2."""
    from econdatapipeline_spark.operators.stats import jsd_drift

    rng = random.Random(29)
    vocab = ["a", "b", "c", "d", "e", "f"]
    rows = [
        (side, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15))))
        for side in ("p", "q")
        for _ in range(40)
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = jsd_drift(df, "lang", "p", "q").collect()[0]
    rev = jsd_drift(df, "lang", "q", "p").collect()[0]

    from collections import Counter
    cp, cq = Counter(), Counter()
    for side, text in rows:
        (cp if side == "p" else cq).update(text.split())
    tp, tq = sum(cp.values()), sum(cq.values())
    jsd = 0.0
    for t in set(cp) | set(cq):
        p = cp[t] / tp
        q = cq[t] / tq
        m = (p + q) / 2
        jsd += 0.5 * ((p * math.log(p / m) if p else 0.0) + (q * math.log(q / m) if q else 0.0))
    assert math.isclose(out["jsd"], jsd, abs_tol=1e-6)
    assert out["jsd"] == rev["jsd"]  # symmetric
    assert 0.0 <= out["jsd"] <= math.log(2) + 1e-9
    assert out["n_tokens_a"] == tp and out["n_tokens_b"] == tq


def test_rbo_python_reference_prefix_formula(spark):
    """RBO@k against the direct (1-p) sum p^(d-1) X_d / d prefix
    formula on random permutations with partial overlap."""
    from econdatapipeline_spark.operators.retrieval import rbo

    rng = random.Random(31)
    pool = [f"d{i}" for i in range(30)]
    la = rng.sample(pool, 12)
    lb = rng.sample(pool, 12)
    k, p = 10, 0.9
    a = spark.createDataFrame(
        [(x, i + 1) for i, x in enumerate(la)], "doc_id string, rank int"
    )
    b = spark.createDataFrame(
        [(x, i + 1) for i, x in enumerate(lb)], "doc_id string, rank int"
    )
    out = rbo(a, b, k=k, p=p).collect()[0]
    ref = 0.0
    for d in range(1, k + 1):
        xd = len(set(la[:d]) & set(lb[:d]))
        ref += (1 - p) * p ** (d - 1) * xd / d
    assert math.isclose(out["rbo"], ref, abs_tol=1e-6)
    assert out["overlap_k"] == len(set(la[:k]) & set(lb[:k]))


def test_ljung_box_scales_with_structure(spark):
    """Q(white-noise-ish) << Q(strong AR) on same-length series, and Q
    matches the formula on the engine's own acf."""
    from econdatapipeline_spark.operators.timeseries import acf, ljung_box

    rng = random.Random(37)
    noise = [("noise", dt.date(2015, 1, 1) + dt.timedelta(days=31 * i),
              rng.uniform(0, 100)) for i in range(48)]
    trend = [("trend", dt.date(2015, 1, 1) + dt.timedelta(days=31 * i),
              float(i * 10)) for i in range(48)]
    df = spark.createDataFrame(
        noise + trend, "dataset string, date date, value double"
    )
    q = {r["dataset"]: r["q_stat"] for r in ljung_box(df, max_lag=5).collect()}
    assert q["trend"] > q["noise"]
    rho = {}
    for r in acf(df, max_lag=5).collect():
        rho.setdefault(r["dataset"], {})[r["lag"]] = r["acf"]
    for g in ("noise", "trend"):
        n = 48
        ref = n * (n + 2) * sum(rho[g][k] ** 2 / (n - k) for k in range(1, 6))
        assert math.isclose(q[g], ref, abs_tol=1e-4), g
