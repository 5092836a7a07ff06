"""Generalized linear models over relational aggregates.

The regression layer the reference's documentation promises for its
indicator tables (/root/reference/documentation/
economic_indicators.md:122-126) beyond what the engine already
covers: logistic propensity (evaluation.ipw_ate_multi), Cox
(survival.cox_ph_multi), Weibull AFT (survival.weibull_aft). This
module adds the COUNT-response member — Poisson regression with log
link — for rate modeling (orders per customer, events per session,
defects per batch).

Architecture is the ipw_fragments discipline (evaluation.py:989): a
``*_fragments`` function is the single source of truth for every
expression BOTH the Spark operator and the DuckDB oracle execute, so
operation order is shared by construction; the Newton solve is the
generated fixed-order no-pivot Gaussian elimination of
timeseries._gauss_steps. The Poisson log-likelihood with log link is
globally concave in beta, so undamped Newton converges from the
ln(mean y) intercept seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..sources.tables import fan_out as _fan_out_capped


def poisson_fragments(p: int) -> dict:
    """Shared Spark/DuckDB SQL fragments for the p-covariate Poisson
    GLM. Expects a subject relation with columns y (bigint >= 0) and
    x1..xp (decimal(18,6)), and a 1-row params relation b0..bp
    (doubles). Model: y ~ Poisson(mu), ln mu = b0 + sum b_j x_j.

    Returns init_terms / agg_terms / solve_steps(r) / final_terms /
    se_steps() / outputs — see evaluation.ipw_fragments. The fitted
    mean quantizes to decimal(18,9) (the one libm exp channel), so
    every iterate must keep eta <= 20 (mu <= ~4.9e8; beyond it the
    ANSI decimal cast raises loudly). NULL propagation: no rows or a
    singular X'WX Hessian NULLs every estimate (never-fabricate).
    """
    from .timeseries import _gauss_steps  # noqa: PLC0415

    if p < 1 or p > 7:
        raise ValueError(f"p must be in 1..7, got {p}")
    m = p + 1
    eta = "b0"
    for j in range(1, m):
        eta += f" + b{j} * CAST(x{j} AS DOUBLE)"
    mu = f"CAST(CAST(exp({eta}) AS DECIMAL(18,9)) AS DOUBLE)"
    yd = "CAST(y AS DOUBLE)"

    def s28(term: str, name: str):
        return (
            name,
            f"CAST(SUM(CAST({term} AS DECIMAL(28,12))) AS DOUBLE)",
        )

    def xj(j: int) -> str:
        return "1.0" if j == 0 else f"CAST(x{j} AS DOUBLE)"

    agg_terms = []
    for j in range(m):
        agg_terms.append(s28(f"{xj(j)} * ({yd} - {mu})", f"g{j}"))
    for j in range(m):
        for k in range(j, m):
            agg_terms.append(
                s28(f"({xj(j)} * {xj(k)}) * {mu}", f"h{j}_{k}")
            )
    for j in range(m):
        agg_terms.append((f"b{j}", f"MIN(b{j})"))

    init_terms = [
        (
            "b0",
            "CASE WHEN COUNT(*) > 0 AND SUM(y) > 0 THEN"
            " CAST(CAST(ln(CAST(SUM(y) AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE)) AS DECIMAL(18,9))"
            " AS DOUBLE) END",
        )
    ]
    for j in range(1, m):
        init_terms.append((f"b{j}", "CAST(0.0 AS DOUBLE)"))

    def _a_names():
        return {
            (j, k): f"h{j}_{k}" for j in range(m) for k in range(j, m)
        }

    pnames = [f"b{j}" for j in range(m)]

    def solve_steps(round_idx: int):
        # one shared prefix: every round's projection is textually
        # identical (the weibull_aft codegen-cache discipline)
        del round_idx
        b_names = [f"g{j}" for j in range(m)]
        steps, deltas, diag = _gauss_steps(m, _a_names(), b_names, "p")
        ok = " AND ".join(f"{d} > 0" for d in dict.fromkeys(diag))
        for j in range(m):
            steps.append(
                (
                    f"nb{j}",
                    f"CASE WHEN {ok} THEN CAST(CAST(b{j} + {deltas[j]}"
                    " AS DECIMAL(18,9)) AS DOUBLE) ELSE NULL END",
                )
            )
        return steps

    dev_term = (
        f"CASE WHEN y > 0 THEN {yd} * ln({yd} / {mu})"
        f" - ({yd} - {mu}) ELSE {mu} END"
    )
    final_terms = list(agg_terms) + [
        ("n", "CAST(COUNT(*) AS BIGINT)"),
        ("ysum", "CAST(COALESCE(SUM(y), 0) AS BIGINT)"),
        s28(dev_term, "devhalf"),
    ]

    def se_steps():
        steps = []
        for j in range(m):
            rhs = ["1.0" if i == j else "0.0" for i in range(m)]
            s, betas, diag = _gauss_steps(m, _a_names(), rhs, f"v{j}")
            ok = " AND ".join(f"{d} > 0" for d in dict.fromkeys(diag))
            steps.extend(s)
            steps.append(
                (
                    f"var{j}",
                    f"CASE WHEN {ok} AND {betas[j]} > 0"
                    f" THEN {betas[j]} END",
                )
            )
        return steps

    def param_outputs():
        outs = []
        for j in range(m):
            outs.append(
                {
                    "coef": f"round(b{j}, 6)",
                    "se": f"round(sqrt(var{j}), 6)",
                    "z": f"round(b{j} / sqrt(var{j}), 6)",
                    "rate_ratio": f"round(exp(b{j}), 6)",
                }
            )
        return outs

    return {
        "m": m,
        "init_terms": init_terms,
        "agg_terms": agg_terms,
        "solve_steps": solve_steps,
        "final_terms": final_terms,
        "se_steps": se_steps,
        "param_outputs": param_outputs,
        "pnames": pnames,
    }


def poisson_glm(
    df: DataFrame,
    response_col: str,
    covariate_cols: list[str],
    rounds: int = 6,
) -> DataFrame:
    """Poisson regression (log link, Newton/IRLS MLE) -> one row per
    parameter (param, n, coef, se, z, rate_ratio, deviance); params
    are 'intercept' then each covariate; deviance (the GLM
    goodness-of-fit, 2*[ll_saturated - ll_model]) repeats per row.

    exp(coef_j) is the RATE RATIO per unit x_j — the count-model
    analog of the logistic odds ratio and the Cox hazard ratio.
    Negative responses raise at plan time (ANSI guard in the filter);
    NULL rows are excluded.

    Architecture: the ipw_ate_multi/weibull_aft backbone — each of
    the bounded ``rounds`` is ONE hash aggregate over the
    checkpointed subject table (score X'(y−mu) + Hessian X'WX upper
    triangle, every term decimal(28,12)-quantized before its
    order-free sum) cross-joined with the previous eagerly
    checkpointed 1-row params relation, solved by the generated
    fixed-order Gaussian elimination the SQL oracle chains verbatim
    (poisson_fragments); SEs from unit-vector solves of the final
    Hessian. The log-link likelihood is globally concave, so Newton
    needs no damping; the intercept seeds at ln(mean y). Iterates
    must keep eta <= 20 (the decimal(18,9) mu domain — loud ANSI
    failure, never silent corruption).

    Scale: subject table scanned rounds+2 times, each a map-side
    combinable aggregate; no window, no join, no driver loop.
    """
    from .timeseries import _apply_steps_one_sql  # noqa: PLC0415

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if not covariate_cols:
        raise ValueError("covariate_cols must name at least one column")
    p = len(covariate_cols)
    frag = poisson_fragments(p)
    keep = (
        F.col(response_col).isNotNull()
        & (F.col(response_col).cast("long") >= 0)
    )
    for c in covariate_cols:
        keep = keep & F.col(c).isNotNull()
    # fan_out BEFORE the checkpoint: the subject relation is
    # scanned rounds+2 times and inherits the source's partitioning —
    # a single-file bench input would make every IRLS round a
    # single-task aggregate (measured 1.9s/round over 150k rows on
    # one core). Row-CAPPED (fan_out, ~16): an uncapped
    # defaultParallelism width was over-parallelism on the KB..MB
    # working set (driver scaling: 8 cores beat 32 on ipw/pca). The
    # per-round decimal sums are EXACT, so the row order change
    # cannot move a value (hashes re-certified).
    subj = df.filter(keep).select(
        F.col(response_col).cast("long").alias("y"),
        *[
            F.col(c).cast("decimal(18,6)").alias(f"x{j}")
            for j, c in enumerate(covariate_cols, 1)
        ],
    ).transform(_fan_out_capped).localCheckpoint(eager=True)
    b_cur = subj.agg(
        *[F.expr(e).alias(nm) for nm, e in frag["init_terms"]]
    )
    for r in range(1, rounds + 1):
        g = subj.crossJoin(F.broadcast(b_cur)).agg(
            *[F.expr(e).alias(nm) for nm, e in frag["agg_terms"]]
        )
        g = _apply_steps_one_sql(
            g,
            frag["solve_steps"](r),
            keep={f"n{nm}" for nm in frag["pnames"]},
            barrier_every=None,
        )
        b_cur = g.select(
            *[F.col(f"n{nm}").alias(nm) for nm in frag["pnames"]]
        ).localCheckpoint(eager=True)
    fin = subj.crossJoin(F.broadcast(b_cur)).agg(
        *[F.expr(e).alias(nm) for nm, e in frag["final_terms"]]
    )
    fin = _apply_steps_one_sql(
        fin, frag["se_steps"](), keep=None, barrier_every=None
    )
    labels = ["intercept", *covariate_cols]
    rows = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("param"),
                F.expr(o["coef"]).alias("coef"),
                F.expr(o["se"]).alias("se"),
                F.expr(o["z"]).alias("z"),
                F.expr(o["rate_ratio"]).alias("rate_ratio"),
            )
            for lbl, o in zip(labels, frag["param_outputs"]())
        ]
    )
    return fin.select(
        "n",
        F.round(F.lit(2.0) * F.col("devhalf"), 6).alias("deviance"),
        F.explode(rows).alias("r"),
    ).select(
        F.col("r.param").alias("param"),
        "n",
        F.col("r.coef").alias("coef"),
        F.col("r.se").alias("se"),
        F.col("r.z").alias("z"),
        F.col("r.rate_ratio").alias("rate_ratio"),
        "deviance",
    )


def logistic_fragments(p: int) -> dict:
    """Shared Spark/DuckDB SQL fragments for the p-covariate binomial
    GLM (logistic regression with logit link). Expects a subject
    relation with columns y (int 0/1) and x1..xp (decimal(18,6)), and
    a 1-row params relation b0..bp (doubles). Model:
    y ~ Bernoulli(mu), logit mu = b0 + sum b_j x_j.

    Same contract as poisson_fragments: init_terms / agg_terms /
    solve_steps(r) / final_terms / se_steps() / param_outputs. The
    fitted probability quantizes to decimal(18,9) (the one libm exp
    channel, the ipw_fragments text); |eta| beyond ~21 saturates mu
    to exactly 0/1 — those subjects stop contributing to the score
    and Hessian (w = mu(1-mu) = 0) and any saturation NULLs the
    deviance/McFadden outputs via the n_sat counter (never-fabricate
    on a degenerate likelihood; coefficients still emit where the
    Hessian stays positive-definite).
    """
    from .timeseries import _gauss_steps  # noqa: PLC0415

    if p < 1 or p > 7:
        raise ValueError(f"p must be in 1..7, got {p}")
    m = p + 1
    eta = "b0"
    for j in range(1, m):
        eta += f" + b{j} * CAST(x{j} AS DOUBLE)"
    mu = (
        f"CAST(CAST(1.0 / (1.0 + exp(-({eta})))"
        " AS DECIMAL(18,9)) AS DOUBLE)"
    )
    w = f"{mu} * (1.0 - {mu})"
    yd = "CAST(y AS DOUBLE)"

    def s28(term: str, name: str):
        return (
            name,
            f"CAST(SUM(CAST({term} AS DECIMAL(28,12))) AS DOUBLE)",
        )

    def xj(j: int) -> str:
        return "1.0" if j == 0 else f"CAST(x{j} AS DOUBLE)"

    agg_terms = []
    for j in range(m):
        agg_terms.append(s28(f"{xj(j)} * ({yd} - {mu})", f"g{j}"))
    for j in range(m):
        for k in range(j, m):
            agg_terms.append(
                s28(f"({xj(j)} * {xj(k)}) * {w}", f"h{j}_{k}")
            )
    for j in range(m):
        agg_terms.append((f"b{j}", f"MIN(b{j})"))

    init_terms = [
        (
            "b0",
            "CASE WHEN SUM(y) > 0 AND SUM(y) < COUNT(*) THEN"
            " CAST(CAST(ln((CAST(SUM(y) AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE))"
            " / (1.0 - CAST(SUM(y) AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE))) AS DECIMAL(18,9))"
            " AS DOUBLE) END",
        )
    ]
    for j in range(1, m):
        init_terms.append((f"b{j}", "CAST(0.0 AS DOUBLE)"))

    def _a_names():
        return {
            (j, k): f"h{j}_{k}" for j in range(m) for k in range(j, m)
        }

    pnames = [f"b{j}" for j in range(m)]

    def solve_steps(round_idx: int):
        del round_idx
        b_names = [f"g{j}" for j in range(m)]
        steps, deltas, diag = _gauss_steps(m, _a_names(), b_names, "p")
        ok = " AND ".join(f"{d} > 0" for d in dict.fromkeys(diag))
        for j in range(m):
            steps.append(
                (
                    f"nb{j}",
                    f"CASE WHEN {ok} THEN CAST(CAST(b{j} + {deltas[j]}"
                    " AS DECIMAL(18,9)) AS DOUBLE) ELSE NULL END",
                )
            )
        return steps

    dev_term = (
        f"CASE WHEN y = 1 THEN 0.0 - ln({mu})"
        f" ELSE 0.0 - ln(1.0 - {mu}) END"
    )
    final_terms = list(agg_terms) + [
        ("n", "CAST(COUNT(*) AS BIGINT)"),
        ("ysum", "CAST(COALESCE(SUM(y), 0) AS BIGINT)"),
        (
            "devhalf",
            f"CAST(SUM(CASE WHEN {mu} > 0.0 AND {mu} < 1.0 THEN"
            f" CAST({dev_term} AS DECIMAL(28,12)) END) AS DOUBLE)",
        ),
        (
            "n_sat",
            f"CAST(COALESCE(SUM(CASE WHEN {mu} <= 0.0 OR {mu} >= 1.0"
            " THEN 1 ELSE 0 END), 0) AS BIGINT)",
        ),
    ]

    def se_steps():
        steps = []
        for j in range(m):
            rhs = ["1.0" if i == j else "0.0" for i in range(m)]
            s, betas, diag = _gauss_steps(m, _a_names(), rhs, f"v{j}")
            ok = " AND ".join(f"{d} > 0" for d in dict.fromkeys(diag))
            steps.extend(s)
            steps.append(
                (
                    f"var{j}",
                    f"CASE WHEN {ok} AND {betas[j]} > 0"
                    f" THEN {betas[j]} END",
                )
            )
        return steps

    def param_outputs():
        outs = []
        for j in range(m):
            outs.append(
                {
                    "coef": f"round(b{j}, 6)",
                    "se": f"round(sqrt(var{j}), 6)",
                    "z": f"round(b{j} / sqrt(var{j}), 6)",
                    "odds_ratio": f"round(exp(b{j}), 6)",
                }
            )
        return outs

    return {
        "m": m,
        "init_terms": init_terms,
        "agg_terms": agg_terms,
        "solve_steps": solve_steps,
        "final_terms": final_terms,
        "se_steps": se_steps,
        "param_outputs": param_outputs,
        "pnames": pnames,
    }


def logistic_glm(
    df: DataFrame,
    response_col: str,
    covariate_cols: list[str],
    rounds: int = 6,
) -> DataFrame:
    """Binomial GLM (logistic regression, Newton/IRLS MLE) -> one row
    per parameter (param, n, coef, se, z, odds_ratio, deviance,
    mcfadden_r2); params are 'intercept' then each covariate;
    deviance and McFadden pseudo-R2 repeat per row.

    Completes the GLM family the reference's documentation promises
    (economic_indicators.md:122-126): Poisson for counts
    (glm.poisson_glm), logistic for binary outcomes — the
    classification workhorse behind quality filters and churn/flag
    models. exp(coef_j) is the ODDS RATIO per unit x_j.

    The propensity step inside ipw_ate_multi/aipw_ate is this same
    fit; here it is exposed standalone WITH inference (SEs from
    unit-vector solves of the final Hessian), deviance, and
    McFadden's R2 = 1 - ll/ll0 against the base-rate-only model.

    Architecture: the poisson_glm backbone verbatim — bounded
    ``rounds``, each ONE decimal(28,12)-quantized score/Hessian
    aggregate over the checkpointed subject table, the generated
    fixed-order no-pivot Gauss solve (logit likelihood is globally
    concave), logit(ybar) intercept seed. Saturated fitted
    probabilities (|eta| > ~21 under decimal(18,9)) NULL the
    deviance/McFadden outputs via n_sat. Subject table scanned
    rounds+2 times, each map-side combinable; no window, no join, no
    driver loop.
    """
    from .timeseries import _apply_steps_one_sql  # noqa: PLC0415

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if not covariate_cols:
        raise ValueError("covariate_cols must name at least one column")
    p = len(covariate_cols)
    frag = logistic_fragments(p)
    keep = F.col(response_col).isNotNull()
    for c in covariate_cols:
        keep = keep & F.col(c).isNotNull()
    # fan_out BEFORE the checkpoint: the subject relation is
    # scanned rounds+2 times and inherits the source's partitioning —
    # a single-file bench input would make every IRLS round a
    # single-task aggregate (measured 1.9s/round over 150k rows on
    # one core). Row-CAPPED (fan_out, ~16): an uncapped
    # defaultParallelism width was over-parallelism on the KB..MB
    # working set (driver scaling: 8 cores beat 32 on ipw/pca). The
    # per-round decimal sums are EXACT, so the row order change
    # cannot move a value (hashes re-certified).
    subj = df.filter(keep).select(
        F.col(response_col).cast("int").alias("y"),
        *[
            F.col(c).cast("decimal(18,6)").alias(f"x{j}")
            for j, c in enumerate(covariate_cols, 1)
        ],
    ).transform(_fan_out_capped).localCheckpoint(eager=True)
    b_cur = subj.agg(
        *[F.expr(e).alias(nm) for nm, e in frag["init_terms"]]
    )
    for r in range(1, rounds + 1):
        g = subj.crossJoin(F.broadcast(b_cur)).agg(
            *[F.expr(e).alias(nm) for nm, e in frag["agg_terms"]]
        )
        g = _apply_steps_one_sql(
            g,
            frag["solve_steps"](r),
            keep={f"n{nm}" for nm in frag["pnames"]},
            barrier_every=None,
        )
        b_cur = g.select(
            *[F.col(f"n{nm}").alias(nm) for nm in frag["pnames"]]
        ).localCheckpoint(eager=True)
    fin = subj.crossJoin(F.broadcast(b_cur)).agg(
        *[F.expr(e).alias(nm) for nm, e in frag["final_terms"]]
    )
    fin = _apply_steps_one_sql(
        fin, frag["se_steps"](), keep=None, barrier_every=None
    )
    # null-model log-likelihood from (n, ysum): fixed-order doubles.
    nd = F.col("n").cast("double")
    pb = F.col("ysum").cast("double") / nd
    ll0 = nd * (
        pb * F.log(pb) + (1.0 - pb) * F.log(1.0 - pb)
    )
    okdev = (
        (F.col("n_sat") == 0)
        & (F.col("ysum") > 0)
        & (F.col("ysum") < F.col("n"))
        & F.col("devhalf").isNotNull()
    )
    labels = ["intercept", *covariate_cols]
    rows = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("param"),
                F.expr(o["coef"]).alias("coef"),
                F.expr(o["se"]).alias("se"),
                F.expr(o["z"]).alias("z"),
                F.expr(o["odds_ratio"]).alias("odds_ratio"),
            )
            for lbl, o in zip(labels, frag["param_outputs"]())
        ]
    )
    return fin.select(
        "n",
        F.when(okdev, F.round(F.lit(2.0) * F.col("devhalf"), 6)).alias(
            "deviance"
        ),
        F.when(
            okdev,
            F.round(1.0 - (F.lit(0.0) - F.col("devhalf")) / ll0, 6),
        ).alias("mcfadden_r2"),
        F.explode(rows).alias("r"),
    ).select(
        F.col("r.param").alias("param"),
        "n",
        F.col("r.coef").alias("coef"),
        F.col("r.se").alias("se"),
        F.col("r.z").alias("z"),
        F.col("r.odds_ratio").alias("odds_ratio"),
        "deviance",
        "mcfadden_r2",
    )


def vif_fragments(p: int) -> dict:
    """Shared Spark/DuckDB fragments for variance-inflation factors.
    Expects a subject relation with x1..xp (decimal(18,6)). Returns
    agg_terms (decimal-exact sums), corr_steps (named fixed-order
    correlation-matrix entries), solve_steps() (one unit-vector
    _gauss_steps chain per covariate over the correlation matrix —
    VIF_j is the j-th diagonal of R^-1), and per-covariate outputs.
    """
    from .timeseries import _gauss_steps  # noqa: PLC0415

    if p < 2 or p > 8:
        raise ValueError(f"p must be in 2..8, got {p}")

    def xj(j: int) -> str:
        return f"CAST(x{j} AS DOUBLE)"

    agg_terms = [("n", "CAST(COUNT(*) AS BIGINT)")]
    for j in range(1, p + 1):
        agg_terms.append(
            (
                f"s{j}",
                f"CAST(SUM(CAST(x{j} AS DECIMAL(38,12))) AS DOUBLE)",
            )
        )
    for j in range(1, p + 1):
        for k in range(j, p + 1):
            agg_terms.append(
                (
                    f"s{j}_{k}",
                    f"CAST(SUM(CAST({xj(j)} * {xj(k)}"
                    " AS DECIMAL(28,12))) AS DOUBLE)",
                )
            )

    corr_steps = []
    for j in range(1, p + 1):
        for k in range(j, p + 1):
            corr_steps.append(
                (
                    f"c{j}_{k}",
                    f"s{j}_{k} - s{j} * s{k} / CAST(n AS DOUBLE)",
                )
            )
    for j in range(1, p + 1):
        for k in range(j + 1, p + 1):
            corr_steps.append(
                (
                    f"r{j}_{k}",
                    f"CASE WHEN c{j}_{j} > 0 AND c{k}_{k} > 0 THEN"
                    f" c{j}_{k} / sqrt(c{j}_{j} * c{k}_{k})"
                    " ELSE NULL END",
                )
            )

    def solve_steps():
        a_names = {}
        for j in range(p):
            for k in range(j, p):
                a_names[(j, k)] = (
                    "1.0" if j == k else f"r{j + 1}_{k + 1}"
                )
        steps = []
        for j in range(p):
            rhs = ["1.0" if i == j else "0.0" for i in range(p)]
            s, betas, diag = _gauss_steps(p, a_names, rhs, f"w{j}")
            ok = " AND ".join(f"{d} > 0" for d in dict.fromkeys(diag))
            steps.extend(s)
            steps.append(
                (
                    f"vif{j + 1}",
                    f"CASE WHEN {ok} AND {betas[j]} >= 1.0"
                    f" THEN {betas[j]} END",
                )
            )
        return steps

    def outputs():
        outs = []
        for j in range(1, p + 1):
            outs.append(
                {
                    "vif": f"round(vif{j}, 6)",
                    "r_squared": f"round(1.0 - 1.0 / vif{j}, 6)",
                }
            )
        return outs

    return {
        "agg_terms": agg_terms,
        "corr_steps": corr_steps,
        "solve_steps": solve_steps,
        "outputs": outputs,
    }


def vif(df: DataFrame, covariate_cols: list[str]) -> DataFrame:
    """Variance-inflation factors -> one row per covariate
    (param, n, vif, r_squared).

    THE pre-fit multicollinearity diagnostic for every regression in
    the engine (logistic_glm, poisson_glm, ipw_ate_multi, aipw_ate,
    cox_ph_multi, weibull_aft): VIF_j = 1/(1 − R²_j) where R²_j is
    from regressing x_j on the other covariates — equivalently the
    j-th diagonal of the inverse correlation matrix, which is how it
    is computed here (rule of thumb: VIF > 10 = problematic;
    r_squared emits the implied R²_j). A near-singular design that
    would NULL a downstream Newton fit through its pivot gate shows
    up HERE first, with a per-covariate culprit.

    Relational shape: ONE decimal-exact aggregate (Σx_j, Σx_j x_k),
    fixed-order correlation entries, then p unit-vector solves of the
    generated no-pivot Gaussian elimination (correlation matrices are
    SPD short of exact collinearity; non-PD pivots or VIF < 1 from
    degenerate arithmetic NULL that covariate's row). Fragments are
    shared with the SQL oracle verbatim (vif_fragments). Map-side
    combinable at any corpus size; no window, no join.
    """
    from .timeseries import _apply_steps_one_sql  # noqa: PLC0415

    p = len(covariate_cols)
    frag = vif_fragments(p)
    keep = F.lit(True)
    for c in covariate_cols:
        keep = keep & F.col(c).isNotNull()
    from econdatapipeline_spark.sources.tables import fan_out  # noqa: PLC0415

    # fan_out before the one heavy aggregate: a single-split source
    # serializes the p² decimal partial sums onto one core (measured
    # 2.6 s single-task at sf0.1); decimal sums are order-free, so
    # the repartition cannot move a value.
    subj = fan_out(
        df.filter(keep).select(
            *[
                F.col(c).cast("decimal(18,6)").alias(f"x{j}")
                for j, c in enumerate(covariate_cols, 1)
            ]
        )
    )
    g = subj.agg(
        *[F.expr(e).alias(nm) for nm, e in frag["agg_terms"]]
    )
    for nm, e in frag["corr_steps"]:
        g = g.withColumn(nm, F.expr(e))
    g = _apply_steps_one_sql(
        g, frag["solve_steps"](), keep=None, barrier_every=None
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("param"),
                F.expr(o["vif"]).alias("vif"),
                F.expr(o["r_squared"]).alias("r_squared"),
            )
            for lbl, o in zip(covariate_cols, frag["outputs"]())
        ]
    )
    return g.select("n", F.explode(rows).alias("r")).select(
        F.col("r.param").alias("param"),
        "n",
        F.col("r.vif").alias("vif"),
        F.col("r.r_squared").alias("r_squared"),
    )


def partial_corr(
    df: DataFrame, covariate_cols: list[str]
) -> DataFrame:
    """Partial correlations for every covariate pair -> one row per
    unordered pair (var1, var2, corr, partial_corr).

    corr_matrix answers "do x_j and x_k move together?"; the partial
    correlation answers the sharper question — do they move together
    AFTER controlling for every other covariate? From the inverse
    correlation matrix: pcorr_jk = −inv_jk / sqrt(inv_jj · inv_kk).
    A large marginal corr with a near-zero partial corr is the
    classic "common driver" signature; the reverse is a masked
    direct relationship.

    Relational shape: the vif machinery verbatim (vif_fragments —
    one decimal-exact aggregate, fixed-order correlation entries, p
    unit-vector solves of the generated no-pivot Gauss chain give
    the FULL inverse, column j as w{j}_beta{i}); this operator just
    reads the off-diagonals too. NULL rows when the correlation
    matrix is not positive-definite (exact collinearity) — the vif
    pivot gate.
    """
    from .timeseries import _apply_steps_one_sql  # noqa: PLC0415

    p = len(covariate_cols)
    frag = vif_fragments(p)
    keep = F.lit(True)
    for c in covariate_cols:
        keep = keep & F.col(c).isNotNull()
    from econdatapipeline_spark.sources.tables import fan_out  # noqa: PLC0415

    # fan_out before the one heavy aggregate: a single-split source
    # serializes the p² decimal partial sums onto one core (measured
    # 2.6 s single-task at sf0.1); decimal sums are order-free, so
    # the repartition cannot move a value.
    subj = fan_out(
        df.filter(keep).select(
            *[
                F.col(c).cast("decimal(18,6)").alias(f"x{j}")
                for j, c in enumerate(covariate_cols, 1)
            ]
        )
    )
    g = subj.agg(
        *[F.expr(e).alias(nm) for nm, e in frag["agg_terms"]]
    )
    for nm, e in frag["corr_steps"]:
        g = g.withColumn(nm, F.expr(e))
    g = _apply_steps_one_sql(
        g, frag["solve_steps"](), keep=None, barrier_every=None
    )
    entries = []
    for j in range(1, p + 1):
        for k in range(j + 1, p + 1):
            # inverse entries: column j of R^-1 is w{j-1}_beta{i}
            inv_jk = f"w{j - 1}_beta{k - 1}"
            inv_jj = f"w{j - 1}_beta{j - 1}"
            inv_kk = f"w{k - 1}_beta{k - 1}"
            ok = (
                f"vif{j} IS NOT NULL AND vif{k} IS NOT NULL"
                f" AND {inv_jj} > 0 AND {inv_kk} > 0"
            )
            pc = (
                f"CASE WHEN {ok} THEN round((0.0 - {inv_jk})"
                f" / sqrt({inv_jj} * {inv_kk}), 6) + 0.0"
                " ELSE NULL END"
            )
            entries.append(
                F.struct(
                    F.lit(covariate_cols[j - 1]).alias("var1"),
                    F.lit(covariate_cols[k - 1]).alias("var2"),
                    F.expr(
                        f"round(r{j}_{k}, 6) + 0.0"
                    ).alias("corr"),
                    F.expr(pc).alias("partial_corr"),
                )
            )
    return g.select(
        F.explode(F.array(*entries)).alias("e")
    ).select(
        F.col("e.var1").alias("var1"),
        F.col("e.var2").alias("var2"),
        F.col("e.corr").alias("corr"),
        F.col("e.partial_corr").alias("partial_corr"),
    )


def quasipoisson_glm(
    df: DataFrame,
    response_col: str,
    covariate_cols: list[str],
    rounds: int = 6,
) -> DataFrame:
    """Quasi-Poisson regression -> one row per parameter
    (param, n, coef, se, z, rate_ratio, deviance, dispersion).

    Real count data is almost always OVERDISPERSED (Var y > E y —
    bursty orders, clumped events), and poisson_glm's equidispersion
    SEs are then too small: every z-statistic is inflated and
    "significant" rates abound. The quasi-likelihood fix keeps the
    SAME point estimates (the Poisson score equations) and scales
    inference by the Pearson dispersion

        phi = (1/(n−m)) Σ (y − mu)² / mu,
        se_quasi = se_poisson · sqrt(phi)

    — the standard first remedy before reaching for negative
    binomial. dispersion ~ 1 says poisson_glm was fine; >> 1 says
    its inference was fiction.

    Architecture: poisson_fragments verbatim (identical Newton
    rounds, so coef/rate_ratio/deviance match poisson_glm exactly —
    twin-tested) plus ONE extra decimal(28,12)-quantized Pearson
    term in the final aggregate; the SE scaling is O(1) fixed-order
    doubles. Same NULL gates, plus NULL se/z/dispersion when
    n <= m (no residual dof).
    """
    from .timeseries import _apply_steps_one_sql  # noqa: PLC0415

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if not covariate_cols:
        raise ValueError("covariate_cols must name at least one column")
    p = len(covariate_cols)
    frag = poisson_fragments(p)
    m = frag["m"]
    keep = (
        F.col(response_col).isNotNull()
        & (F.col(response_col).cast("long") >= 0)
    )
    for c in covariate_cols:
        keep = keep & F.col(c).isNotNull()
    # fan_out BEFORE the checkpoint: the subject relation is
    # scanned rounds+2 times and inherits the source's partitioning —
    # a single-file bench input would make every IRLS round a
    # single-task aggregate (measured 1.9s/round over 150k rows on
    # one core). Row-CAPPED (fan_out, ~16): an uncapped
    # defaultParallelism width was over-parallelism on the KB..MB
    # working set (driver scaling: 8 cores beat 32 on ipw/pca). The
    # per-round decimal sums are EXACT, so the row order change
    # cannot move a value (hashes re-certified).
    subj = df.filter(keep).select(
        F.col(response_col).cast("long").alias("y"),
        *[
            F.col(c).cast("decimal(18,6)").alias(f"x{j}")
            for j, c in enumerate(covariate_cols, 1)
        ],
    ).transform(_fan_out_capped).localCheckpoint(eager=True)
    b_cur = subj.agg(
        *[F.expr(e).alias(nm) for nm, e in frag["init_terms"]]
    )
    for r in range(1, rounds + 1):
        g = subj.crossJoin(F.broadcast(b_cur)).agg(
            *[F.expr(e).alias(nm) for nm, e in frag["agg_terms"]]
        )
        g = _apply_steps_one_sql(
            g,
            frag["solve_steps"](r),
            keep={f"n{nm}" for nm in frag["pnames"]},
            barrier_every=None,
        )
        b_cur = g.select(
            *[F.col(f"n{nm}").alias(nm) for nm in frag["pnames"]]
        ).localCheckpoint(eager=True)
    # mu text for the Pearson term — poisson_fragments' exp channel
    eta = "b0"
    for j in range(1, m):
        eta += f" + b{j} * CAST(x{j} AS DOUBLE)"
    mu = f"CAST(CAST(exp({eta}) AS DECIMAL(18,9)) AS DOUBLE)"
    pearson = (
        f"CAST(SUM(CASE WHEN {mu} > 0.0 THEN"
        f" CAST(((CAST(y AS DOUBLE) - {mu})"
        f" * (CAST(y AS DOUBLE) - {mu})) / {mu}"
        " AS DECIMAL(28,12)) END) AS DOUBLE)"
    )
    fin = subj.crossJoin(F.broadcast(b_cur)).agg(
        *[F.expr(e).alias(nm) for nm, e in frag["final_terms"]],
        F.expr(pearson).alias("pearson"),
    )
    fin = _apply_steps_one_sql(
        fin, frag["se_steps"](), keep=None, barrier_every=None
    )
    nd = F.col("n").cast("double")
    phi = F.try_divide(F.col("pearson"), nd - float(m))
    fin = fin.withColumn(
        "phi", F.when((F.col("n") > m) & (phi > 0), phi)
    )
    labels = ["intercept", *covariate_cols]
    rows = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("param"),
                F.expr(o["coef"]).alias("coef"),
                F.expr(
                    f"round(sqrt(var{j}) * sqrt(phi), 6)"
                ).alias("se"),
                F.expr(
                    f"round(b{j} / (sqrt(var{j}) * sqrt(phi)), 6)"
                ).alias("z"),
                F.expr(o["rate_ratio"]).alias("rate_ratio"),
            )
            for j, (lbl, o) in enumerate(
                zip(labels, frag["param_outputs"]())
            )
        ]
    )
    return fin.select(
        "n",
        F.round(F.lit(2.0) * F.col("devhalf"), 6).alias("deviance"),
        F.round(F.col("phi"), 6).alias("dispersion"),
        F.explode(rows).alias("r"),
    ).select(
        F.col("r.param").alias("param"),
        "n",
        F.col("r.coef").alias("coef"),
        F.col("r.se").alias("se"),
        F.col("r.z").alias("z"),
        F.col("r.rate_ratio").alias("rate_ratio"),
        "deviance",
        "dispersion",
    )


def negbin_fragments(p: int, alpha: float) -> dict:
    """Shared Spark/DuckDB SQL fragments for the p-covariate NB2
    negative-binomial GLM with KNOWN dispersion ``alpha``. Same
    contract as poisson_fragments; model y ~ NB2(mu, alpha) with
    Var = mu + alpha*mu^2, ln mu = b0 + sum b_j x_j. Fisher scoring:
    score x_j (y - mu)/(1 + alpha*mu), information
    x_j x_k mu/(1 + alpha*mu) — alpha = 0 IS Poisson, so the Poisson
    chain falls out as the reduction test. The alpha literal is
    injected verbatim into both engines' text — keep it binary-exact
    (0.5, 0.25, 1.0) for hash-certified contracts.

    NB2 deviance (no lgamma needed): 2*sum of
      y>0: y ln(y/mu) - (y + 1/alpha) ln((1+alpha y)/(1+alpha mu))
      y=0: (1/alpha) ln(1+alpha mu)
    """
    from .timeseries import _gauss_steps  # noqa: PLC0415

    if p < 1 or p > 7:
        raise ValueError(f"p must be in 1..7, got {p}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    a = repr(float(alpha))
    m = p + 1
    eta = "b0"
    for j in range(1, m):
        eta += f" + b{j} * CAST(x{j} AS DOUBLE)"
    mu = f"CAST(CAST(exp({eta}) AS DECIMAL(18,9)) AS DOUBLE)"
    den = f"(1.0 + {a} * {mu})"
    yd = "CAST(y AS DOUBLE)"

    def s28(term: str, name: str):
        return (
            name,
            f"CAST(SUM(CAST({term} AS DECIMAL(28,12))) AS DOUBLE)",
        )

    def xj(j: int) -> str:
        return "1.0" if j == 0 else f"CAST(x{j} AS DOUBLE)"

    agg_terms = []
    for j in range(m):
        agg_terms.append(
            s28(f"{xj(j)} * (({yd} - {mu}) / {den})", f"g{j}")
        )
    for j in range(m):
        for k in range(j, m):
            agg_terms.append(
                s28(f"({xj(j)} * {xj(k)}) * ({mu} / {den})", f"h{j}_{k}")
            )
    for j in range(m):
        agg_terms.append((f"b{j}", f"MIN(b{j})"))

    init_terms = [
        (
            "b0",
            "CASE WHEN COUNT(*) > 0 AND SUM(y) > 0 THEN"
            " CAST(CAST(ln(CAST(SUM(y) AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE)) AS DECIMAL(18,9))"
            " AS DOUBLE) END",
        )
    ]
    for j in range(1, m):
        init_terms.append((f"b{j}", "CAST(0.0 AS DOUBLE)"))

    def _a_names():
        return {
            (j, k): f"h{j}_{k}" for j in range(m) for k in range(j, m)
        }

    pnames = [f"b{j}" for j in range(m)]

    def solve_steps(round_idx: int):
        del round_idx
        b_names = [f"g{j}" for j in range(m)]
        steps, deltas, diag = _gauss_steps(m, _a_names(), b_names, "p")
        ok = " AND ".join(f"{d} > 0" for d in dict.fromkeys(diag))
        for j in range(m):
            steps.append(
                (
                    f"nb{j}",
                    f"CASE WHEN {ok} THEN CAST(CAST(b{j} + {deltas[j]}"
                    " AS DECIMAL(18,9)) AS DOUBLE) ELSE NULL END",
                )
            )
        return steps

    dev_term = (
        f"CASE WHEN y > 0 THEN {yd} * ln({yd} / {mu})"
        f" - ({yd} + 1.0 / {a})"
        f" * ln((1.0 + {a} * {yd}) / (1.0 + {a} * {mu}))"
        f" ELSE (1.0 / {a}) * ln(1.0 + {a} * {mu}) END"
    )
    final_terms = list(agg_terms) + [
        ("n", "CAST(COUNT(*) AS BIGINT)"),
        ("ysum", "CAST(COALESCE(SUM(y), 0) AS BIGINT)"),
        s28(dev_term, "devhalf"),
    ]

    def se_steps():
        steps = []
        for j in range(m):
            rhs = ["1.0" if i == j else "0.0" for i in range(m)]
            s, betas, diag = _gauss_steps(m, _a_names(), rhs, f"v{j}")
            ok = " AND ".join(f"{d} > 0" for d in dict.fromkeys(diag))
            steps.extend(s)
            steps.append(
                (
                    f"var{j}",
                    f"CASE WHEN {ok} AND {betas[j]} > 0"
                    f" THEN {betas[j]} END",
                )
            )
        return steps

    def param_outputs():
        outs = []
        for j in range(m):
            outs.append(
                {
                    "coef": f"round(b{j}, 6)",
                    "se": f"round(sqrt(var{j}), 6)",
                    "z": f"round(b{j} / sqrt(var{j}), 6)",
                    "rate_ratio": f"round(exp(b{j}), 6)",
                }
            )
        return outs

    return {
        "m": m,
        "init_terms": init_terms,
        "agg_terms": agg_terms,
        "solve_steps": solve_steps,
        "final_terms": final_terms,
        "se_steps": se_steps,
        "param_outputs": param_outputs,
        "pnames": pnames,
    }


def negbin_glm(
    df: DataFrame,
    response_col: str,
    covariate_cols: list[str],
    alpha: float = 0.5,
    rounds: int = 6,
) -> DataFrame:
    """NB2 negative-binomial regression with known dispersion ->
    one row per parameter (param, n, coef, se, z, rate_ratio,
    deviance).

    Completes the count triad: poisson_glm assumes Var = mu (its SEs
    collapse under real-world clumping), quasipoisson_glm rescales
    them post hoc, negbin_glm puts the overdispersion IN the
    likelihood — Var = mu + alpha*mu^2 — so both the coefficients'
    weighting and the deviance are overdispersion-aware. ``alpha``
    is supplied (estimate it upstream from quasipoisson's Pearson
    phi: alpha ~ (phi - 1)/mean(mu) as a method-of-moments seed);
    alpha -> 0 recovers Poisson exactly (tested).

    Plumbing is poisson_glm's verbatim: Fisher scoring where every
    round is ONE decimal-quantized aggregate over the checkpointed
    subject table crossJoined with the 1-row params relation;
    negbin_fragments shares the step text with the oracle. Keep
    alpha binary-exact for hash-certified use.
    """
    from .timeseries import _apply_steps_one_sql  # noqa: PLC0415

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if not covariate_cols:
        raise ValueError("covariate_cols must name at least one column")
    p = len(covariate_cols)
    frag = negbin_fragments(p, alpha)
    keep = (
        F.col(response_col).isNotNull()
        & (F.col(response_col).cast("long") >= 0)
    )
    for c in covariate_cols:
        keep = keep & F.col(c).isNotNull()
    # fan_out BEFORE the checkpoint: the subject relation is
    # scanned rounds+2 times and inherits the source's partitioning —
    # a single-file bench input would make every IRLS round a
    # single-task aggregate (measured 1.9s/round over 150k rows on
    # one core). Row-CAPPED (fan_out, ~16): an uncapped
    # defaultParallelism width was over-parallelism on the KB..MB
    # working set (driver scaling: 8 cores beat 32 on ipw/pca). The
    # per-round decimal sums are EXACT, so the row order change
    # cannot move a value (hashes re-certified).
    subj = df.filter(keep).select(
        F.col(response_col).cast("long").alias("y"),
        *[
            F.col(c).cast("decimal(18,6)").alias(f"x{j}")
            for j, c in enumerate(covariate_cols, 1)
        ],
    ).transform(_fan_out_capped).localCheckpoint(eager=True)
    b_cur = subj.agg(
        *[F.expr(e).alias(nm) for nm, e in frag["init_terms"]]
    )
    for r in range(1, rounds + 1):
        g = subj.crossJoin(F.broadcast(b_cur)).agg(
            *[F.expr(e).alias(nm) for nm, e in frag["agg_terms"]]
        )
        g = _apply_steps_one_sql(
            g,
            frag["solve_steps"](r),
            keep={f"n{nm}" for nm in frag["pnames"]},
            barrier_every=None,
        )
        b_cur = g.select(
            *[F.col(f"n{nm}").alias(nm) for nm in frag["pnames"]]
        ).localCheckpoint(eager=True)
    fin = subj.crossJoin(F.broadcast(b_cur)).agg(
        *[F.expr(e).alias(nm) for nm, e in frag["final_terms"]]
    )
    fin = _apply_steps_one_sql(
        fin, frag["se_steps"](), keep=None, barrier_every=None
    )
    labels = ["intercept", *covariate_cols]
    rows = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("param"),
                F.expr(o["coef"]).alias("coef"),
                F.expr(o["se"]).alias("se"),
                F.expr(o["z"]).alias("z"),
                F.expr(o["rate_ratio"]).alias("rate_ratio"),
            )
            for lbl, o in zip(labels, frag["param_outputs"]())
        ]
    )
    return fin.select(
        "n",
        F.round(F.lit(2.0) * F.col("devhalf"), 6).alias("deviance"),
        F.explode(rows).alias("r"),
    ).select(
        F.col("r.param").alias("param"),
        "n",
        F.col("r.coef").alias("coef"),
        F.col("r.se").alias("se"),
        F.col("r.z").alias("z"),
        F.col("r.rate_ratio").alias("rate_ratio"),
        "deviance",
    )
