"""Synthetic control estimation as relational aggregates.

The comparative-case-study estimator (Abadie & Gardeazabal 2003,
Abadie, Diamond & Hainmueller 2010): when ONE unit is treated (a
policy hits one state / one market / one product line), DiD against
an arbitrary control is fragile; synthetic control builds the
counterfactual as a CONVEX combination of donor units whose
pre-period trajectory matches the treated unit, then reads the
treatment effect as the post-period gap.

The inner problem min_{w >= 0, sum w = 1} ||b - A w||^2 is solved by
FIXED-STEP Frank-Wolfe (deterministic step 2/(k+2), first-minimal-
index tie-break) UNROLLED as named column expressions over the 1-row
Gram relation — the ipw_fragments discipline applied to a
constrained QP, which keeps the whole estimator inside the SQL
oracle's replay wall (no LP solver, no line search, no RNG). Donor
pools in comparative case studies are small by design (states,
countries, segments: J <= ~10), so the J^2 Gram entries and
J-per-iteration updates are plan-sized, while the panel collapse
and the final gap pass stay distributed aggregates.

Reference basis: the reference repo ships DiD-style revision
comparisons over indicator panels (documentation/
economic_indicators.md); synthetic control is the standard
next-step estimator for the same panel shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synth_fragments(n_donors: int, iters: int) -> dict:
    """Shared Spark/DuckDB fragments for the Frank-Wolfe solve with
    exact line search. Expects a 1-row relation with Gram entries
    h{j}_{k} (j <= k, doubles) and cross terms c{j}; emits w1..wJ
    after ``iters`` deterministic steps from the e_1 vertex.

    Per step, toward the first-minimal-index gradient vertex e_j:
    direction d = e_j − w, optimal step
    gamma = clamp((g·w − g_j) / (H_jj − 2(Hw)_j + w'Hw), 0, 1) —
    closed-form for the quadratic, no solver, no randomness; for a
    strongly convex objective over the simplex this converges in a
    handful of steps where fixed-step FW needs hundreds. Every
    weight iterate is requantized decimal(18,9) (the betas rule) so
    both engines carry identical doubles between steps."""
    if n_donors < 2 or n_donors > 10:
        raise ValueError(f"n_donors must be in 2..10, got {n_donors}")
    if iters < 1 or iters > 40:
        raise ValueError(f"iters must be in 1..40, got {iters}")
    j_rng = range(1, n_donors + 1)

    def h(j, k):
        return f"h{min(j, k)}_{max(j, k)}"

    steps = []
    for j in j_rng:
        steps.append(
            (f"w0_{j}", "CAST(1.0 AS DOUBLE)" if j == 1 else "CAST(0.0 AS DOUBLE)")
        )
    for it in range(1, iters + 1):
        prev = f"w{it - 1}"
        for j in j_rng:
            terms = " + ".join(f"{h(j, k)} * {prev}_{k}" for k in j_rng)
            steps.append((f"hw{it}_{j}", f"({terms})"))
        for j in j_rng:
            steps.append((f"g{it}_{j}", f"hw{it}_{j} - c{j}"))
        arg = None
        for j in j_rng:
            conds = " AND ".join(
                f"g{it}_{j} <= g{it}_{k}" for k in j_rng if k != j
            )
            piece = f"WHEN {conds} THEN {j}"
            arg = piece if arg is None else f"{arg} {piece}"
        steps.append((f"j{it}", f"CASE {arg} ELSE 1 END"))
        gw = " + ".join(f"g{it}_{j} * {prev}_{j}" for j in j_rng)
        steps.append((f"gw{it}", f"({gw})"))
        whw = " + ".join(f"{prev}_{j} * hw{it}_{j}" for j in j_rng)
        steps.append((f"whw{it}", f"({whw})"))
        pick = lambda fmt: " ".join(  # noqa: E731
            f"WHEN j{it} = {j} THEN {fmt.format(j=j)}" for j in j_rng
        )
        steps.append(
            (f"gj{it}", f"CASE {pick(f'g{it}_{{j}}')} END")
        )
        steps.append(
            (
                f"hjj{it}",
                f"CASE {' '.join(f'WHEN j{it} = {j} THEN {h(j, j)}' for j in j_rng)} END",
            )
        )
        steps.append(
            (f"hwj{it}", f"CASE {pick(f'hw{it}_{{j}}')} END")
        )
        steps.append((f"num{it}", f"gw{it} - gj{it}"))
        steps.append(
            (f"den{it}", f"hjj{it} - 2.0 * hwj{it} + whw{it}")
        )
        steps.append(
            (
                f"gam{it}",
                f"CASE WHEN den{it} <= 0 THEN 0.0 ELSE"
                f" least(1.0, greatest(0.0, num{it} / den{it})) END",
            )
        )
        for j in j_rng:
            steps.append(
                (
                    f"w{it}_{j}",
                    f"CAST(CAST((1.0 - gam{it}) * {prev}_{j}"
                    f" + CASE WHEN j{it} = {j} THEN gam{it}"
                    " ELSE 0.0 END AS DECIMAL(18,9)) AS DOUBLE)",
                )
            )
    final = {f"w{j}": f"w{iters}_{j}" for j in j_rng}
    return {"steps": steps, "final": final}


def synthetic_control(
    df: DataFrame,
    unit_col: str,
    time_col: str,
    value_col: str,
    treated_unit,
    donor_units: list,
    pre_end,
    iters: int = 20,
) -> DataFrame:
    """Synthetic control -> long one-column-pair output:
    (param, value) rows — w_<donor> for each donor weight, then
    n_pre, n_post, att, pre_rmspe, post_rmspe.

    att is the mean post-period gap (treated − synthetic);
    pre_rmspe is the fit diagnostic (a large value means the donor
    pool cannot reproduce the treated unit and the att is not
    credible); post_rmspe / pre_rmspe is the usual placebo-test
    ratio, left to the caller since it needs the placebo runs.

    Architecture — three plan-sized stages, all oracle-replayable:
    1. pivot the panel ONCE by time (CASE per unit — units are plan
       literals) and reduce the pre-period to the J×J Gram matrix /
       cross vector, every product an exact decimal(38,12) sum of
       decimal(18,6) values;
    2. the fixed-step Frank-Wolfe unroll (synth_fragments) over that
       1-row relation — ``iters`` deterministic steps, weights
       requantized decimal(18,9) per step;
    3. broadcast the weight row back onto the pivoted panel and
       reduce gaps: decimal(28,12)-quantized gap and gap² sums split
       pre/post.
    The panel is scanned twice (pivot is cached via localCheckpoint);
    nothing else scales with the corpus. NULL att/rmspe when the
    treated unit or any donor is absent from a period (unbalanced
    panel rows are dropped pairwise and counted).
    """
    J = len(donor_units)
    frag = synth_fragments(J, iters)
    unames = {u: f"u{j}" for j, u in enumerate(donor_units, 1)}
    pv = [
        F.max(
            F.when(F.col(unit_col) == treated_unit, F.col(value_col))
        ).cast("decimal(18,6)").alias("y")
    ] + [
        F.max(F.when(F.col(unit_col) == u, F.col(value_col)))
        .cast("decimal(18,6)")
        .alias(nm)
        for u, nm in unames.items()
    ]
    panel = (
        df.filter(
            F.col(unit_col).isin([treated_unit, *donor_units])
            & F.col(value_col).isNotNull()
            & F.col(time_col).isNotNull()
        )
        .groupBy(F.col(time_col).alias("t"))
        .agg(*pv)
    )
    complete = F.col("y").isNotNull()
    for nm in unames.values():
        complete = complete & F.col(nm).isNotNull()
    panel = panel.filter(complete).withColumn(
        "pre", (F.col("t") <= F.lit(pre_end)).cast("int")
    ).localCheckpoint(eager=True)
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    zero6 = F.lit(0).cast("decimal(18,6)")
    pre = lambda c: F.when(F.col("pre") == 1, c).otherwise(zero6)  # noqa: E731
    aggs = []
    names = list(unames.values())
    for j in range(1, J + 1):
        for k in range(j, J + 1):
            aggs.append(
                F.sum(
                    dec(pre(F.col(names[j - 1]) * F.col(names[k - 1])))
                ).cast("double").alias(f"h{j}_{k}")
            )
    for j in range(1, J + 1):
        aggs.append(
            F.sum(dec(pre(F.col("y") * F.col(names[j - 1]))))
            .cast("double")
            .alias(f"c{j}")
        )
    from .timeseries import _apply_steps_one_sql  # noqa: PLC0415

    gram = panel.agg(*aggs)
    # ONE liveness-pruned spark.sql for the whole unrolled Frank-Wolfe
    # chain instead of per-level withColumns (the var_fit/glm
    # discipline): a single parse + analysis, each nested SELECT
    # carrying only columns a later step or the final projection still
    # reads. Emitted arithmetic is the fragment text verbatim — the
    # trajectory and hashes are unchanged.
    import re  # noqa: PLC0415

    keep = set()
    for e in frag["final"].values():
        keep |= set(re.findall(r"\b[A-Za-z_]\w*\b", e))
    gram = _apply_steps_one_sql(gram, frag["steps"], keep=sorted(keep))
    wrow = gram.select(
        *[F.expr(e).alias(nm) for nm, e in frag["final"].items()]
    )
    synth = None
    for j, nm in enumerate(names, 1):
        term = F.col(f"w{j}") * F.col(nm).cast("double")
        synth = term if synth is None else synth + term
    gap = F.col("y").cast("double") - synth
    q28 = lambda c: c.cast("decimal(28,12)")  # noqa: E731
    joined = panel.crossJoin(F.broadcast(wrow))
    red = joined.agg(
        F.sum(F.col("pre")).cast("long").alias("n_pre"),
        F.sum(1 - F.col("pre")).cast("long").alias("n_post"),
        F.sum(
            q28(F.when(F.col("pre") == 0, gap).otherwise(F.lit(0.0)))
        ).cast("double").alias("gap_post"),
        F.sum(
            q28(
                F.when(F.col("pre") == 1, gap * gap).otherwise(
                    F.lit(0.0)
                )
            )
        ).cast("double").alias("gg_pre"),
        F.sum(
            q28(
                F.when(F.col("pre") == 0, gap * gap).otherwise(
                    F.lit(0.0)
                )
            )
        ).cast("double").alias("gg_post"),
        *[F.min(f"w{j}").alias(f"w{j}") for j in range(1, J + 1)],
    )
    npre = F.col("n_pre").cast("double")
    npost = F.col("n_post").cast("double")
    entries = [
        F.struct(
            F.lit(f"w_{u}").alias("param"),
            F.round(F.col(f"w{j}"), 6).alias("value"),
        )
        for j, u in enumerate(donor_units, 1)
    ] + [
        F.struct(
            F.lit("n_pre").alias("param"),
            F.col("n_pre").cast("double").alias("value"),
        ),
        F.struct(
            F.lit("n_post").alias("param"),
            F.col("n_post").cast("double").alias("value"),
        ),
        F.struct(
            F.lit("att").alias("param"),
            F.when(
                F.col("n_post") > 0,
                F.round(F.col("gap_post") / npost, 6) + F.lit(0.0),
            ).alias("value"),
        ),
        F.struct(
            F.lit("pre_rmspe").alias("param"),
            F.when(
                F.col("n_pre") > 0,
                F.round(F.sqrt(F.col("gg_pre") / npre), 6),
            ).alias("value"),
        ),
        F.struct(
            F.lit("post_rmspe").alias("param"),
            F.when(
                F.col("n_post") > 0,
                F.round(F.sqrt(F.col("gg_post") / npost), 6),
            ).alias("value"),
        ),
    ]
    return red.select(
        F.explode(F.array(*entries)).alias("r")
    ).select(
        F.col("r.param").alias("param"),
        F.col("r.value").alias("value"),
    )
