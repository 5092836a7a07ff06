"""Survival analysis: the Kaplan-Meier product-limit estimator.

Churn/retention time-to-event analytics with right-censoring done
correctly (Kaplan & Meier 1958): naive "average days to next order"
silently drops the customers who never ordered again — exactly the
ones a retention analysis is about. KM keeps them as censored
subjects: at each distinct event time t with d_t events out of n_t
at risk,

    S(t) = prod over t_i <= t of (1 - d_i / n_i)

Relational shape: ONE groupBy(duration) collapses the subject table
to the distinct-time relation (at-risk counts follow by a reverse
cumulative sum), so everything after the first aggregate runs on
times-sized data — the same collapse discipline as zipf_fit/
quantile_rollup. The cumulative product is exp of a running sum of
decimal(18,9)-quantized ln(1 - d/n) terms (the lm.py rule), making
the whole curve engine-portable; times where d = n (everyone left)
drive S to exactly 0 via an explicit flag rather than ln(0).

At 100 TB the subject table is customers-sized and the curve is
distinct-times-sized; a grouped version runs the identical plan under
an extra partition key in both the aggregate and the windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _risk_forward_cumsum(per_t, tot_col, stage2, small_threshold=100_000):
    """One range shuffle serving BOTH survival cumulations ->
    stage2's frame + n_risk + exact cum_<c> longs.

    The fused form of two ordered_cumsum calls (measured: each call is
    ~0.9 s of fixed overhead at sf0.1 — shuffle + eager checkpoint +
    offsets collect — on a times-sized relation where execution is
    microseconds). The reverse at-risk count never needs a descending
    pass: n_risk(t) = grand_total − ascending_inclusive_cum + tot(t).
    So: range-partition ASCENDING once, checkpoint once (pins layout
    AND partition ids, as in ordered_cumsum), derive n_risk from the
    first in-partition prefix + offsets collect, let ``stage2`` build
    the columns that DEPEND on n_risk, then run the second prefix on
    the SAME pinned layout with a second (cheap, checkpointed-input)
    offsets collect. Sums must be exact longs — callers pass
    1e9-scaled decimal terms (the kaplan_meier rule).

    SIZE GATE (VERDICT r6 #6): the two-pass machinery exists for the
    second-resolution-duration regime where distinct times approach
    subject count; a daily-resolution curve is a few hundred rows, and
    the two-pass overhead tripled its local latency (0.54 -> 1.79 s at
    sf0.1). The relation is checkpointed and counted ONCE: at or below
    ``small_threshold`` distinct times both cumulations run as plain
    single-partition windows — exact long sums, therefore
    BIT-IDENTICAL values to the two-pass path (twin-path pytest) — and
    above it the distributed path engages.
    """
    spark = per_t.sparkSession
    per_t = per_t.localCheckpoint(eager=True)
    n_times = per_t.count()
    if n_times <= small_threshold:
        w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        risk = per_t.withColumn("n_risk", F.sum(tot_col).over(w_desc))
        df2, cum_cols = stage2(risk)
        w_asc = Window.orderBy(F.col("t").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        out = df2
        for c in cum_cols:
            out = out.withColumn(
                f"cum_{c}", F.coalesce(F.sum(c).over(w_asc), F.lit(0))
            )
        return out
    n_parts = spark.sparkContext.defaultParallelism
    part = (
        per_t.repartitionByRange(n_parts, F.col("t").asc())
        .sortWithinPartitions(F.col("t").asc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("__pid").orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = part.withColumn(
        "__ct", F.coalesce(F.sum(tot_col).over(w), F.lit(0))
    )
    totals = (
        part.groupBy("__pid").agg(F.sum(tot_col).alias("s")).collect()
    )
    offs, run = {}, 0
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offs[row["__pid"]] = run
        run += row["s"] or 0
    grand = run
    if offs:
        off_df = spark.createDataFrame(
            [(p, o) for p, o in offs.items()], "__pid int, __off long"
        )
        local = (
            local.join(F.broadcast(off_df), "__pid", "left")
            .withColumn(
                "__ct", F.col("__ct") + F.coalesce(F.col("__off"), F.lit(0))
            )
            .drop("__off")
        )
    risk = local.withColumn(
        "n_risk", F.lit(grand) - F.col("__ct") + F.col(tot_col)
    ).drop("__ct")
    df2, cum_cols = stage2(risk)
    local2 = df2
    for c in cum_cols:
        local2 = local2.withColumn(
            f"cum_{c}", F.coalesce(F.sum(c).over(w), F.lit(0))
        )
    totals2 = (
        df2.groupBy("__pid").agg(*[F.sum(c).alias(c) for c in cum_cols])
        .collect()
    )
    offs2 = {}
    run2 = {c: 0 for c in cum_cols}
    for row in sorted(totals2, key=lambda r: r["__pid"]):
        offs2[row["__pid"]] = dict(run2)
        for c in cum_cols:
            run2[c] += row[c] or 0
    if offs2:
        off_rows = [
            tuple([pid] + [offs2[pid][c] for c in cum_cols])
            for pid in offs2
        ]
        schema = ", ".join(
            ["__pid int"] + [f"__o_{c} long" for c in cum_cols]
        )
        off2_df = spark.createDataFrame(off_rows, schema)
        local2 = local2.join(F.broadcast(off2_df), "__pid", "left")
        for c in cum_cols:
            local2 = local2.withColumn(
                f"cum_{c}",
                F.col(f"cum_{c}") + F.coalesce(F.col(f"__o_{c}"), F.lit(0)),
            ).drop(f"__o_{c}")
    return local2.drop("__pid")


def kaplan_meier(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Product-limit curve -> one row per distinct duration with an
    event or censoring: (t, n_risk, n_events, n_censored, survival).

    ``event_col`` is 1 when the event occurred at ``duration_col``,
    0 when the subject was censored then (still event-free when
    observation ended). survival is carried AT t (post-event), the
    right-continuous convention.
    """
    per_t = (
        df.select(
            F.col(duration_col).cast("long").alias("t"),
            F.col(event_col).cast("int").alias("e"),
        )
        .filter(F.col("t").isNotNull())
        .groupBy("t")
        .agg(
            F.sum("e").cast("long").alias("n_events"),
            F.sum(F.lit(1) - F.col("e")).cast("long").alias("n_censored"),
        )
    )
    # at risk at t = everyone whose duration >= t. Both cumulations
    # ride ONE distributed range layout (no unpartitioned
    # Window.orderBy — the mann_whitney discipline applied here): the
    # curve relation is times-sized by contract, but a
    # second-resolution duration column makes distinct times ~subject
    # count, and the prefix sum must not funnel that through one task.
    # The fused _risk_forward_cumsum derives the reverse at-risk count
    # from the grand total minus the ascending prefix, then cumulates
    # the decimal(18,9) ln(1 - d/n) terms as 1e9-scaled exact longs on
    # the same pinned layout — the decimal value (and therefore the
    # double handed to exp, and the rounded survival) is bit-identical
    # to a windowed decimal sum.
    staged = per_t.withColumn(
        "tot", (F.col("n_events") + F.col("n_censored")).cast("long")
    )

    def stage2(risk):
        term_scaled = F.when(
            F.col("n_events") < F.col("n_risk"),
            (
                F.log(
                    (F.col("n_risk") - F.col("n_events")).cast("double")
                    / F.col("n_risk").cast("double")
                ).cast("decimal(18,9)")
                * F.lit(1000000000)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        dead = (
            F.when(F.col("n_events") >= F.col("n_risk"), 1).otherwise(0)
        ).cast("long")
        return (
            risk.withColumn("lnq", term_scaled).withColumn("dead", dead),
            ["lnq", "dead"],
        )

    cum = _risk_forward_cumsum(staged, "tot", stage2)
    # cum_lnq / 1e9 in double: exact for |cum_lnq| < 2^53, i.e. for
    # every |ln S| < ~9e6 — far past where exp underflows to 0.0, so
    # the rounded survival is identical in all regimes.
    curve = cum.select(
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        F.when(F.col("cum_dead") >= 1, F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(F.col("cum_lnq").cast("double") / F.lit(1000000000.0)),
                6,
            )
        )
        .alias("survival"),
    )
    return curve


def nelson_aalen(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator -> one row per distinct
    duration: (t, n_risk, n_events, cum_hazard).

        H(t) = sum over t_i <= t of d_i / n_i

    The additive companion to kaplan_meier's multiplicative curve — the
    standard estimator when hazards themselves are the quantity of
    interest (exp(-H) is also a serviceable survival estimate with
    better small-risk-set behavior than the product form). Shares
    kaplan_meier's relational shape verbatim: ONE groupBy(duration)
    collapse, then both cumulations on the fused single-shuffle
    _risk_forward_cumsum — the reverse at-risk count from the grand
    total minus the ascending prefix, the forward hazard sum as
    1e9-scaled decimal(18,9) increments carried as exact longs, so
    the rounded output is engine-portable.
    """
    per_t = (
        df.select(
            F.col(duration_col).cast("long").alias("t"),
            F.col(event_col).cast("int").alias("e"),
        )
        .filter(F.col("t").isNotNull())
        .groupBy("t")
        .agg(
            F.sum("e").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
    )

    def stage2(risk):
        inc = (
            (
                F.col("n_events").cast("double")
                / F.col("n_risk").cast("double")
            ).cast("decimal(18,9)")
            * F.lit(1000000000)
        ).cast("long")
        return risk.withColumn("hz", inc), ["hz"]

    cum = _risk_forward_cumsum(per_t, "n_total", stage2)
    return cum.select(
        "t",
        "n_risk",
        "n_events",
        F.round(
            F.col("cum_hz").cast("double") / F.lit(1000000000.0), 6
        ).alias("cum_hazard"),
    )


def median_survival(curve: DataFrame) -> DataFrame:
    """Median survival time from a kaplan_meier curve -> one row
    (median_t): the smallest t with S(t) <= 0.5, null if the curve
    never falls that far (more than half the subjects censored
    event-free — the honest answer, not an extrapolation)."""
    return curve.filter(F.col("survival") <= 0.5).agg(
        F.min("t").alias("median_t")
    )


def log_rank(
    df: DataFrame,
    group_col: str,
    group_a,
    group_b,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Two-sample log-rank test (Mantel-Cox) -> one row
    (n_a, n_b, observed_a, expected_a, chi2).

    The standard companion to kaplan_meier: "are these two survival
    curves the same?" At each distinct event time t, group A's events
    d_At are compared with the hypergeometric expectation
    d_t * n_At / n_t given the pooled risk set:

        chi2 = (sum_t (d_At - e_At))^2 / sum_t v_t
        v_t  = d_t (n_At/n_t)(n_Bt/n_t)(n_t - d_t)/(n_t - 1)

    Relational shape: the kaplan_meier collapse discipline — one
    groupBy(t, group) reduces subjects to the distinct-times-per-group
    relation; a full time x group scaffold (sequence of OBSERVED times
    cross the two groups) makes the per-group reverse cumulative
    at-risk sums correct at every pooled event time; everything after
    the first aggregate is times-sized. Determinism: all counts are
    exact integers; the per-time e/v terms are deterministic doubles of
    integer ratios quantized to decimal(28,12) before the order-free
    sums.
    """
    per_tg = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .select(
            F.col(duration_col).cast("long").alias("t"),
            F.when(F.col(group_col) == group_a, F.lit("a"))
            .otherwise(F.lit("b"))
            .alias("g"),
            F.col(event_col).cast("int").alias("e"),
        )
        .filter(F.col("t").isNotNull())
        .groupBy("t", "g")
        .agg(
            F.sum("e").cast("long").alias("d"),
            F.count(F.lit(1)).cast("long").alias("subj"),
        )
    )
    # scaffold: every observed time x both groups, so the reverse
    # cumsum sees a row (possibly 0-subject) at every pooled time.
    # explode of a 2-element literal array — a generator on the times
    # relation itself, no join (a crossJoin against a 2-row local
    # relation would plan CartesianProduct).
    grid = per_tg.select("t").distinct().select(
        "t", F.explode(F.array(F.lit("a"), F.lit("b"))).alias("g")
    )
    full = grid.join(per_tg, ["t", "g"], "left").fillna(0, ["d", "subj"])
    w_rev = (
        Window.partitionBy("g")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = full.withColumn("n_risk", F.sum("subj").over(w_rev))
    wide = risk.groupBy("t").agg(
        F.sum(F.when(F.col("g") == "a", F.col("d")).otherwise(0)).alias("da"),
        F.sum(F.when(F.col("g") == "b", F.col("d")).otherwise(0)).alias("db"),
        F.sum(F.when(F.col("g") == "a", F.col("n_risk")).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("g") == "b", F.col("n_risk")).otherwise(0)).alias("nb"),
    )
    dt = F.col("da") + F.col("db")
    nt = F.col("na") + F.col("nb")
    e_a = dt.cast("double") * F.col("na").cast("double") / nt.cast("double")
    v_t = F.when(
        nt > 1,
        dt.cast("double")
        * (F.col("na").cast("double") / nt.cast("double"))
        * (F.col("nb").cast("double") / nt.cast("double"))
        * (nt - dt).cast("double")
        / (nt - 1).cast("double"),
    ).otherwise(0.0)
    terms = wide.filter(dt > 0).select(
        F.col("da").alias("oa"),
        (F.col("da").cast("double") - e_a).cast("decimal(28,12)").alias("diff"),
        e_a.cast("decimal(28,12)").alias("ea"),
        v_t.cast("decimal(28,12)").alias("v"),
    )
    n_by = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy()
        .agg(
            F.sum(F.when(F.col(group_col) == group_a, 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col(group_col) == group_b, 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
    )
    agg = terms.agg(
        F.sum("oa").cast("long").alias("observed_a"),
        F.round(F.sum("ea").cast("double"), 6).alias("expected_a"),
        F.sum("diff").cast("double").alias("num"),
        F.sum("v").cast("double").alias("den"),
    )
    return agg.crossJoin(F.broadcast(n_by)).select(
        "n_a",
        "n_b",
        "observed_a",
        "expected_a",
        F.round(
            F.when(
                F.col("den") > 0, F.col("num") * F.col("num") / F.col("den")
            ).otherwise(0.0),
            6,
        ).alias("chi2"),
    )


def cox_ph(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_col: str = "x",
    rounds: int = 4,
) -> DataFrame:
    """Cox proportional-hazards fit for a BINARY covariate (Breslow
    ties) -> one row (n, n_events, beta, hr, se, z).

    The regression member of the survival family (kaplan_meier /
    nelson_aalen / log_rank quantify; Cox ESTIMATES the effect): the
    partial-likelihood Newton iteration for hazard ratio
    exp(beta) between group 1 and group 0. With a binary covariate the
    weighted risk-set sums collapse to S0(t) = R0(t) + eb*R1(t),
    S1(t) = eb*R1(t), where R0/R1 are the STATIC reverse cumulative
    at-risk counts per group — so the whole iteration runs on a
    times-sized relation computed ONCE (per-time counts + the
    distributed ordered_cumsum), and each Newton round is ONE hash
    aggregate with eb entering as a plan literal plus a 1-row collect:

        U(b) = Σ_t [sx_t − d_t·p_t],   I(b) = Σ_t d_t·p_t·(1−p_t),
        p_t  = eb·R1/(R0 + eb·R1),     b' = b + U/I.

    Engine parity: per-time U/I terms are O(d_t) magnitudes quantized
    to decimal(28,12) before order-free sums; beta re-quantizes to
    decimal(18,9) each round; eb = exp(beta) is quantized to
    decimal(18,9) on both engines (the one libm channel, the
    documented ln-class 1-ulp caveat). se = 1/sqrt(I(beta_final)),
    z = beta/se, hr = exp(beta) — O(1) outputs rounded 6.

    Returns NULL beta/hr/se/z when the information is non-positive
    (single-group input — no contrast to estimate; the did_estimator
    never-fabricate rule).
    """
    import math  # noqa: PLC0415
    from decimal import ROUND_HALF_UP, Decimal  # noqa: PLC0415

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    spark = df.sparkSession
    x = F.col(group_col).cast("int")
    bad = x.isNotNull() & ~x.isin(0, 1)
    xchecked = F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit("cox_ph: group_col must be binary 0/1, got "),
                F.col(group_col).cast("string"),
            )
        ),
    ).otherwise(x)
    subj = df.select(
        F.col(duration_col).cast("long").alias("t"),
        F.col(event_col).cast("int").alias("e"),
        xchecked.alias("x"),
    ).filter(F.col("t").isNotNull() & F.col("x").isNotNull())
    # materialized once: ordered_cumsum, the risk filter, and the
    # totals all read this times-sized relation — one subject scan
    per_t = subj.groupBy("t").agg(
        F.sum("e").cast("long").alias("d"),
        F.sum(F.col("e") * F.col("x")).cast("long").alias("sx"),
        F.sum(F.lit(1) - F.col("x")).cast("long").alias("c0"),
        F.sum("x").cast("long").alias("c1"),
    ).localCheckpoint(eager=True)
    from econdatapipeline_spark.operators.stats import (  # noqa: PLC0415
        ordered_cumsum,
    )

    risk = (
        ordered_cumsum(per_t, "t", ["c0", "c1"], descending=True)
        .select(
            "t",
            "d",
            "sx",
            F.col("cum_c0").alias("r0"),
            F.col("cum_c1").alias("r1"),
        )
        .filter(F.col("d") >= 1)
        .localCheckpoint(eager=True)
    )
    # totals derive from the times-sized per_t relation (n = Σ at-risk
    # arrivals, events = Σ d) — no second subject-table scan
    totals = per_t.agg(
        F.sum(F.col("c0") + F.col("c1")).cast("long").alias("n"),
        F.sum("d").cast("long").alias("n_events"),
    ).first()

    q9 = Decimal("0.000000001")

    def d18_9(v: float) -> Decimal:
        return Decimal(repr(v)).quantize(q9, rounding=ROUND_HALF_UP)

    def ui_at(eb: float):
        r0 = F.col("r0").cast("double")
        r1 = F.col("r1").cast("double")
        d = F.col("d").cast("double")
        p = (F.lit(eb) * r1) / (r0 + F.lit(eb) * r1)
        term_u = (F.col("sx").cast("double") - d * p).cast(
            "decimal(28,12)"
        )
        term_i = (d * p * (1.0 - p)).cast("decimal(28,12)")
        row = risk.agg(
            F.sum(term_u).alias("u"), F.sum(term_i).alias("i")
        ).first()
        return (
            float(row["u"]) if row["u"] is not None else 0.0,
            float(row["i"]) if row["i"] is not None else 0.0,
        )

    beta = 0.0
    info = 0.0
    degenerate = False
    for _ in range(rounds):
        eb = float(d18_9(math.exp(beta)))
        u, info = ui_at(eb)
        if info <= 0:
            degenerate = True
            break
        beta = float(d18_9(beta + u / info))
    if not degenerate:
        eb = float(d18_9(math.exp(beta)))
        _, info = ui_at(eb)
        degenerate = info <= 0
    if degenerate:
        row = (totals["n"], totals["n_events"], None, None, None, None)
    else:
        se = 1.0 / math.sqrt(info)

        def r6(v: float) -> float:
            return float(
                Decimal(repr(v)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )

        row = (
            totals["n"],
            totals["n_events"],
            r6(beta),
            r6(math.exp(beta)),
            r6(se),
            r6(beta / se),
        )
    return spark.createDataFrame(
        [row],
        "n long, n_events long, beta double, hr double, se double,"
        " z double",
    )


def rmst(
    df: DataFrame,
    tau: float,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Restricted mean survival time -> one row (tau, s_tau, rmst):
    the area under the Kaplan-Meier curve up to horizon ``tau`` — the
    clinically/economically meaningful summary when the median never
    falls (light censoring) or hazards cross: "average event-free days
    within the first tau days".

    Computed by integration by parts, which needs NO adjacent-row
    access on the curve:

        RMST = tau·S(tau) + Σ_{t_i <= tau} t_i·(S_{i-1} − S_i)

    Every drop ΔS_i derives from the PER-ROW cumulative state the
    survival machinery already carries (S_{i-1} = exp((cum_lnq −
    lnq)/1e9), dead-flag aware), so the whole statistic is the shared
    distributed cumsum + ONE hash aggregate + one max_by — the same
    scale posture as kaplan_meier itself (a lead()-based interval sum
    would reintroduce the adjacent-row window the two-pass machinery
    exists to avoid). Per-drop terms are decimal(28,12)-quantized
    before the order-free sum; the exp chain shares kaplan_meier's
    ln-class caveat.
    """
    if tau <= 0:
        raise ValueError(f"tau must be > 0, got {tau}")
    per_t = (
        df.select(
            F.col(duration_col).cast("long").alias("t"),
            F.col(event_col).cast("int").alias("e"),
        )
        .filter(F.col("t").isNotNull())
        .groupBy("t")
        .agg(
            F.sum("e").cast("long").alias("n_events"),
            F.sum(F.lit(1) - F.col("e")).cast("long").alias("n_censored"),
        )
    )
    staged = per_t.withColumn(
        "tot", (F.col("n_events") + F.col("n_censored")).cast("long")
    )

    def stage2(risk):
        term_scaled = F.when(
            F.col("n_events") < F.col("n_risk"),
            (
                F.log(
                    (F.col("n_risk") - F.col("n_events")).cast("double")
                    / F.col("n_risk").cast("double")
                ).cast("decimal(18,9)")
                * F.lit(1000000000)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        dead = (
            F.when(F.col("n_events") >= F.col("n_risk"), 1).otherwise(0)
        ).cast("long")
        return (
            risk.withColumn("lnq", term_scaled).withColumn("dead", dead),
            ["lnq", "dead"],
        )

    cum = _risk_forward_cumsum(staged, "tot", stage2)
    s_at = F.when(F.col("cum_dead") >= 1, F.lit(0.0)).otherwise(
        F.exp(F.col("cum_lnq").cast("double") / F.lit(1000000000.0))
    )
    s_before = F.when(
        (F.col("cum_dead") - F.col("dead")) >= 1, F.lit(0.0)
    ).otherwise(
        F.exp(
            (F.col("cum_lnq") - F.col("lnq")).cast("double")
            / F.lit(1000000000.0)
        )
    )
    within = cum.filter(F.col("t") <= F.lit(float(tau)))
    agg = within.agg(
        F.sum(
            (F.col("t").cast("double") * (s_before - s_at)).cast(
                "decimal(28,12)"
            )
        ).alias("drops"),
        F.max_by(s_at, F.col("t")).alias("s_tau"),
    )
    return agg.select(
        F.lit(float(tau)).alias("tau"),
        F.round(F.coalesce(F.col("s_tau"), F.lit(1.0)), 6).alias("s_tau"),
        F.round(
            F.lit(float(tau))
            * F.coalesce(F.col("s_tau"), F.lit(1.0))
            + F.coalesce(F.col("drops").cast("double"), F.lit(0.0)),
            6,
        ).alias("rmst"),
    )
