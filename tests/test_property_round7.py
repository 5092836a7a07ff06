"""Round-7 property tests: randomized scenarios vs pure-Python
references, batched through single Spark jobs (the
test_property_batch discipline — seeded RNG, no per-example round
trips)."""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F


def test_sessionize_partitions_events_exactly(spark):
    """Sessions PARTITION each user's events: counts add up, every
    intra-session gap <= threshold, every consecutive-session gap >
    threshold — verified against an independent python grouping over
    randomized event streams."""
    from econdatapipeline_spark.operators.sessions import sessionize

    rng = random.Random(71)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(40):
        t = rng.randint(0, 3600)
        for _ in range(rng.randint(1, 30)):
            rows.append((u, t0 + dt.timedelta(seconds=t), 1.0))
            t += rng.randint(1, 4000)  # gaps straddle the 1800s line
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sessionize(df, gap_minutes=30).collect()
    assert sum(r["n_events"] for r in out) == len(rows)
    # python reference sessions
    by_user = {}
    for u, ts, _ in rows:
        by_user.setdefault(u, []).append(ts)
    ref = {}
    for u, tss in by_user.items():
        tss.sort()
        sessions = [[tss[0]]]
        for a, b in zip(tss, tss[1:]):
            if (b - a).total_seconds() > 1800:
                sessions.append([b])
            else:
                sessions[-1].append(b)
        ref[u] = sorted(
            (s[0], s[-1], len(s)) for s in sessions
        )
    got = {}
    for r in out:
        got.setdefault(r["user"], []).append(
            (r["session_start"], r["session_end"], r["n_events"])
        )
    for u in got:
        assert sorted(got[u]) == ref[u], u


def test_lorenz_matches_python_interpolation(spark):
    from econdatapipeline_spark.operators.stats import lorenz_curve

    rng = random.Random(73)
    vals = [round(rng.expovariate(0.001), 2) for _ in range(500)]
    # inject heavy ties
    vals += [vals[0]] * 37
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    pts = {r["point"]: r for r in lorenz_curve(df, "v", points=10).collect()}
    sv = sorted(vals)
    n, tot = len(sv), sum(sv)
    for p in range(1, 11):
        r = p * n // 10
        ref_pop = r / n
        ref_val = sum(sv[:r]) / tot
        assert pts[p]["pop_share"] == pytest.approx(ref_pop, abs=1e-6)
        assert pts[p]["value_share"] == pytest.approx(ref_val, abs=1e-5)


def test_wilson_ci_batch_vs_python(spark):
    from econdatapipeline_spark.operators.stats import wilson_ci

    rng = random.Random(79)
    rows = []
    expect = {}
    for g in range(30):
        n = rng.randint(1, 200)
        s = rng.randint(0, n)
        rows += [(f"g{g}", True)] * s + [(f"g{g}", False)] * (n - s)
        z, p = 1.959964, s / n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        expect[f"g{g}"] = (max(center - half, 0.0), min(center + half, 1.0))
    df = spark.createDataFrame(rows, "g string, s boolean")
    out = {r["group"]: r for r in wilson_ci(df, "g", "s").collect()}
    for g, (lo, hi) in expect.items():
        assert out[g]["lo"] == pytest.approx(lo, abs=1e-6), g
        assert out[g]["hi"] == pytest.approx(hi, abs=1e-6), g


def test_kruskal_wallis_label_permutation_invariant(spark):
    from econdatapipeline_spark.operators.stats import kruskal_wallis

    rng = random.Random(83)
    rows = [
        (rng.choice(["a", "b", "c", "d"]), round(rng.gauss(0, 5), 2))
        for _ in range(400)
    ]
    df1 = spark.createDataFrame(rows, "g string, v double")
    relabel = {"a": "z9", "b": "m4", "c": "a1", "d": "q7"}
    df2 = spark.createDataFrame(
        [(relabel[g], v) for g, v in rows], "g string, v double"
    )
    h1 = kruskal_wallis(df1, "v", "g").first()
    h2 = kruskal_wallis(df2, "v", "g").first()
    assert h1["h"] == h2["h"] and h1["h_corrected"] == h2["h_corrected"]


def test_cms_never_undercounts_any_token(spark):
    """est >= exact for EVERY token in the vocabulary, not just the
    reported top-k (the CMS one-sided guarantee)."""
    from econdatapipeline_spark.operators.cms import _bucket, cms_sketch

    rng = random.Random(89)
    words = [f"tok{i}" for i in range(400)]
    freqs = [(w, rng.randint(1, 500)) for w in words]
    toks = spark.createDataFrame(freqs, "token string, freq long")
    sketch = cms_sketch(toks, depth=4, width=32)  # narrow -> collisions
    probes = None
    for r in range(4):
        this = toks.select(
            "token", "freq",
            F.lit(r).alias("row"),
            _bucket(F.col("token"), r, 32).alias("bucket"),
        )
        probes = this if probes is None else probes.unionByName(this)
    est = (
        probes.join(sketch, ["row", "bucket"])
        .groupBy("token", "freq")
        .agg(F.min("cnt").alias("est"))
        .collect()
    )
    assert len(est) == 400
    assert all(r["est"] >= r["freq"] for r in est)


def test_markov_transitions_row_stochastic(spark):
    from econdatapipeline_spark.operators.markov import markov_transitions

    rng = random.Random(97)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(25):
        for i in range(rng.randint(2, 40)):
            rows.append(
                (u, t0 + dt.timedelta(minutes=i), rng.choice("abcde"), eid)
            )
            eid += 1
    df = spark.createDataFrame(rows, "u long, ts timestamp, s string, e long")
    out = markov_transitions(df, "u", "s", "ts", "e").collect()
    by_from = {}
    for r in out:
        by_from.setdefault(r["from_state"], []).append(r)
    for f, rs in by_from.items():
        assert sum(r["p"] for r in rs) == pytest.approx(1.0, abs=1e-4), f
    # total transitions = total rows - one per user
    assert sum(r["n"] for r in out) == len(rows) - 25


def test_rmst_monotone_in_horizon_and_bounded(spark):
    from econdatapipeline_spark.operators.survival import rmst

    rng = random.Random(101)
    rows = [
        (rng.randint(1, 80), rng.randint(0, 1)) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "duration long, event int")
    prev = 0.0
    for tau in (10.0, 40.0, 90.0, 200.0):
        r = rmst(df, tau).first()["rmst"]
        assert prev <= r + 1e-9 <= tau + 1e-9
        prev = r


def test_editdist_pairs_all_verified_in_python(spark):
    """Every reported pair truly has levenshtein <= max_dist on the
    truncated normalized texts (python re-verification)."""
    from econdatapipeline_spark.operators.dedup import editdist_dedup

    rng = random.Random(103)
    base = ["the quick brown fox jumps over lazy dogs " + str(i)
            for i in range(12)]
    docs = []
    did = 0
    for b in base:
        docs.append((did, b)); did += 1
        if rng.random() < 0.7:
            mutated = list(b)
            for _ in range(rng.randint(1, 2)):
                pos = rng.randrange(len(mutated))
                mutated[pos] = rng.choice("abcdefgh ")
            docs.append((did, "".join(mutated))); did += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = editdist_dedup(df, max_dist=2).collect()
    txt = {i: t.strip().lower()[:200] for i, t in docs}

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    assert out, "mutated corpus should produce near-dup pairs"
    for r in out:
        d = lev(txt[r["id_a"]], txt[r["id_b"]])
        assert d == r["dist"] and d <= 2, (r["id_a"], r["id_b"])
