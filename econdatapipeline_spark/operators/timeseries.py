"""Time-series repair: calendar gap-fill, forward fill, interpolation.

The reference stores monthly/quarterly economic series but leaves holes
where a source skipped a period (its export layer "merges with date
alignment" — documentation/economic_indicators.md:71 — which silently
drops or nulls missing months). An engine over the same data needs the
explicit repair operator: materialize the full period calendar per
series, carry the last observation forward, and linearly interpolate
interior gaps.

Shuffle shape: one tiny per-key MIN/MAX aggregate builds the calendar
scaffold via ``sequence()`` + ``explode`` (rows = periods, never more),
one left join back to the observations (broadcast when the scaffold is
small, shuffle-on-key at scale), and two windows partitioned by the
series key — the same partitioning, so a single sort serves both
directions. No driver-side date loops; the scaffold is plan-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_monthly(
    df: DataFrame,
    key_col: str = "dataset",
    date_col: str = "date",
    value_col: str = "value",
) -> DataFrame:
    """(key, date, is_observed, ffill, interpolated) on a dense monthly
    calendar spanning each key's observed range.

    - ``ffill``: last non-null observation at or before the period
      (what a point-in-time query should see).
    - ``interpolated``: linear in month-distance between the bracketing
      observations; equals the observation where one exists, and falls
      back to the nearer side at the edges.

    Dates are expected month-aligned (the engine's resample operators
    emit ``date_trunc('month', ...)``); interpolation weights are whole
    month counts via ``months_between``.
    """
    bounds = df.groupBy(key_col).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    scaffold = bounds.select(
        key_col,
        F.explode(F.expr("sequence(__d0, __d1, interval 1 month)")).alias(date_col),
    )
    obs = df.select(key_col, date_col, F.col(value_col).alias("__v"))
    j = scaffold.join(obs, [key_col, date_col], "left")

    back = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_date = F.when(F.col("__v").isNotNull(), F.col(date_col))
    prev_v = F.last("__v", ignorenulls=True).over(back)
    prev_d = F.last(obs_date, ignorenulls=True).over(back)
    next_v = F.first("__v", ignorenulls=True).over(fwd)
    next_d = F.first(obs_date, ignorenulls=True).over(fwd)

    pos = F.months_between(F.col(date_col), prev_d)
    gap = F.months_between(next_d, prev_d)
    interp = (
        F.when(F.col("__v").isNotNull(), F.col("__v"))
        .when(next_v.isNull(), prev_v)
        .when(prev_v.isNull(), next_v)
        .otherwise(prev_v + (next_v - prev_v) * pos / gap)
    )
    return j.select(
        key_col,
        date_col,
        F.col("__v").isNotNull().alias("is_observed"),
        F.round(prev_v, 6).alias("ffill"),
        F.round(interp, 6).alias("interpolated"),
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str = "dataset",
    date_col: str = "date",
    value_col: str = "value",
    window_rows: int = 12,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window anomaly score per observation.

    z = (x - mean(trailing w)) / stddev(trailing w), flagged when |z|
    exceeds the threshold. The trailing window EXCLUDES the current row
    (an observation should not vote on its own baseline). One window
    partitioned by series key — the same single-sort shape as gap-fill;
    at 100 TB state per task is the w-row frame, nothing more.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(-window_rows, -1)
    )
    mean = F.avg(value_col).over(w)
    # nullif: a flat window has zero variance — the z-score is undefined
    # there, and ANSI mode (Spark 4 default) would otherwise raise on
    # the division instead of yielding null.
    sd = F.nullif(F.stddev_samp(value_col).over(w), F.lit(0.0))
    z = (F.col(value_col) - mean) / sd
    return df.select(
        key_col,
        date_col,
        F.col(value_col),
        F.round(mean, 6).alias("trailing_mean"),
        F.round(z, 6).alias("zscore"),
        (F.abs(z) > z_threshold).alias("is_anomaly"),
    )


def rebase_index(
    df: DataFrame,
    base_date,
    key_col: str = "dataset",
    date_col: str = "date",
    value_col: str = "value",
) -> DataFrame:
    """Express each series as an index with base period = 100.

    The standard econ presentation ("2020-01 = 100"): every value is
    divided by its series' value at ``base_date``. The base values are
    one equality-filtered scan broadcast back onto the series — no
    window, no shuffle of the big side. Series with no observation at
    the base date yield null indexes (they cannot be rebased honestly).
    """
    base = df.filter(F.col(date_col) == F.lit(base_date)).select(
        key_col, F.col(value_col).alias("__base")
    )
    return (
        df.join(F.broadcast(base), key_col, "left")
        .select(
            key_col,
            date_col,
            F.col(value_col),
            F.round(F.col(value_col) / F.nullif(F.col("__base"), F.lit(0.0)) * 100, 6).alias(
                "index_value"
            ),
        )
    )


def seasonal_adjust_monthly(
    df: DataFrame,
    key_col: str = "dataset",
    date_col: str = "date",
    value_col: str = "value",
) -> DataFrame:
    """Ratio-to-moving-average seasonal adjustment (multiplicative).

    The X-11 family's first pass, as pure window/aggregate algebra:

    1. trend: 2x12 centered moving average (13-tap window, half weight
       on the end taps) — one window per series key.
    2. seasonal ratio: value / trend where the full window exists.
    3. seasonal factor: mean ratio per (series, calendar month),
       normalized so the 12 factors average to 1 (one tiny aggregate,
       broadcast back).
    4. adjusted = value / factor.

    Two shuffles total (the per-month factor aggregate and its join
    back; the trend window rides the series-key partitioning). At 100 TB
    the state per task is the 13-row frame — nothing grows with series
    count.
    """
    w = Window.partitionBy(key_col).orderBy(date_col)
    taps = (
        [F.lag(value_col, 6).over(w) * 0.5]
        + [F.lag(value_col, i).over(w) for i in range(5, 0, -1)]
        + [F.col(value_col)]
        + [F.lead(value_col, i).over(w) for i in range(1, 6)]
        + [F.lead(value_col, 6).over(w) * 0.5]
    )
    trend = sum(taps[1:], taps[0]) / 12.0
    with_trend = df.withColumn("__trend", trend)
    ratio = F.col(value_col) / F.nullif(F.col("__trend"), F.lit(0.0))

    # Means computed as exact-decimal sums divided by counts: a plain
    # double avg() accumulates in partial-aggregation order, which is
    # nondeterministic across engines AND across runs; the decimal sum
    # is order-independent, so the factor doubles are bit-reproducible.
    dec = "decimal(28,12)"
    factors = (
        with_trend.filter(F.col("__trend").isNotNull())
        .groupBy(key_col, F.month(date_col).alias("__m"))
        .agg(
            (F.sum(ratio.cast(dec)).cast("double") / F.count(ratio)).alias("__raw_factor")
        )
    )
    norm = factors.groupBy(key_col).agg(
        (
            F.sum(F.col("__raw_factor").cast(dec)).cast("double")
            / F.count("__raw_factor")
        ).alias("__norm")
    )
    factors = factors.join(norm, key_col).select(
        key_col, "__m", (F.col("__raw_factor") / F.col("__norm")).alias("__factor")
    )

    # floor(x*s + 0.5)/s instead of round(): money-shaped sums land
    # exactly on .005 boundaries where Spark (decimal-string HALF_UP)
    # and other engines (binary-double rounding) disagree; floor-based
    # rounding is a pure function of the identical double.
    def r2(c):
        return F.floor(c * 100 + F.lit(0.5)) / 100

    def r6(c):
        return F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000

    return (
        with_trend.withColumn("__m", F.month(date_col))
        .join(F.broadcast(factors), [key_col, "__m"], "left")
        .select(
            key_col,
            date_col,
            F.col(value_col),
            r2(F.col("__trend")).alias("trend"),
            r6(F.col("__factor")).alias("seasonal_factor"),
            r2(F.col(value_col) / F.col("__factor")).alias("adjusted"),
        )
    )


def holt_linear(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing per group ->
    (group, n_points, level, trend, forecast_1).

        l_t = alpha * x_t + (1 - alpha) * (l_{t-1} + b_{t-1})
        b_t = beta * (l_t - l_{t-1}) + (1 - beta) * b_{t-1}

    seeded l_1 = x_1, b_1 = 0; the one-step-ahead forecast is
    l_T + b_T. Like ewma, the recursion is a left fold over the sorted
    per-group series (collect_list + aggregate) — per-group arrays are
    bounded by the series length (dates), not the fact count, so they
    stay executor-safe at any fact-table scale while the heavy
    pre-aggregation runs distributed.

    Cross-engine determinism: keep alpha/beta dyadic (defaults 0.5 and
    0.25 — their 1-complements 0.5 and 0.75 are exact doubles), and an
    oracle must evaluate the recurrences through the identical
    expression tree; outputs round to 6 decimals at the edge.
    """
    a, one_a = F.lit(alpha), F.lit(1.0 - alpha)
    b_, one_b = F.lit(beta), F.lit(1.0 - beta)

    def step(acc, x):
        l_upd = a * x + one_a * (acc.getField("l") + acc.getField("b"))
        l_new = F.when(acc.getField("i") == 0, x).otherwise(l_upd)
        b_new = F.when(acc.getField("i") == 0, F.lit(0.0)).otherwise(
            b_ * (l_upd - acc.getField("l")) + one_b * acc.getField("b")
        )
        return F.struct(
            l_new.alias("l"), b_new.alias("b"), (acc.getField("i") + 1).alias("i")
        )

    series = df.groupBy(group_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("v")))
        ).alias("s")
    )
    acc0 = F.struct(
        F.lit(0.0).alias("l"), F.lit(0.0).alias("b"), F.lit(0).alias("i")
    )
    fold = F.aggregate(
        F.transform(F.col("s"), lambda r: r.getField("v")), acc0, step
    )
    return series.select(
        group_col,
        F.size("s").alias("n_points"),
        F.round(fold.getField("l"), 6).alias("level"),
        F.round(fold.getField("b"), 6).alias("trend"),
        F.round(fold.getField("l") + fold.getField("b"), 6).alias("forecast_1"),
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    threshold: float,
) -> DataFrame:
    """Two-sided CUSUM level-shift detection per series ->
    (group, order, value, cusum_pos, cusum_neg, alarm).

    Classic CUSUM recursions against the series' own starting level
    (Page 1954):

        S+_t = max(0, S+_{t-1} + (x_t - x_1))
        S-_t = max(0, S-_{t-1} - (x_t - x_1))

    with an alarm when either side exceeds ``threshold``. The
    recursion looks sequential, but both sides have a closed window
    form: with P_t the prefix sum of d_t = x_t - x_1,

        S+_t = P_t - min(0, min_{j<=t} P_j)
        S-_t = max(0, max_{j<=t} P_j) - P_t

    so the whole detector is TWO running-extreme frames over ONE sort
    per series — pure whole-stage-codegen window work, no fold, no UDF.
    At scale this is one shuffle keyed by series; frames never
    materialize the series in memory.

    Cross-engine determinism: deviations accumulate in DECIMAL, so the
    prefix sums are exact and order-independent; the baseline x_1 is
    the value at the series' minimum ``order_col`` (assumed unique per
    series, e.g. a date).
    """
    w_all = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Three chained selects — window functions can't nest inside one
    # another's arguments; all three frames share one sort (a single
    # Window physical node after the shuffle by group).
    with_d = df.select(
        group_col,
        order_col,
        value_col,
        (
            F.col(value_col).cast("decimal(28,6)")
            - F.first(F.col(value_col).cast("decimal(28,6)")).over(w_all)
        ).alias("d"),
    )
    with_p = with_d.select(
        group_col,
        order_col,
        value_col,
        F.sum("d").over(w_all).alias("p"),
    )
    w_p = w_all
    zero = F.lit(0).cast("decimal(38,6)")
    s_pos = F.col("p") - F.least(zero, F.min("p").over(w_p))
    s_neg = F.greatest(zero, F.max("p").over(w_p)) - F.col("p")
    return with_p.select(
        group_col,
        order_col,
        value_col,
        F.round(s_pos.cast("double"), 6).alias("cusum_pos"),
        F.round(s_neg.cast("double"), 6).alias("cusum_neg"),
        ((s_pos > threshold) | (s_neg > threshold)).alias("alarm"),
    )


def holt_backtest(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    cutoff,
    horizon: int = 7,
    alpha: float = 0.5,
    beta: float = 0.25,
) -> DataFrame:
    """Out-of-sample forecast evaluation per series -> (group, n_eval,
    mape, mean_err).

    The backtest loop every forecasting deployment needs: fit Holt's
    linear smoothing on observations at or before ``cutoff``, project
    h-step-ahead forecasts l_T + h·b_T for h = 1..horizon, and score
    them against the actuals after the cutoff — MAPE (mean |err|/|y|)
    and signed mean error (bias) per group.

    Shape: the fit is holt_linear's distributed pre-aggregation + per-
    group bounded fold; the evaluation joins the horizon rows (at most
    |groups|·horizon of them) to the |groups|-sized fit — broadcast.
    Error terms quantize to decimal(28,12) before the mean so results
    are partition-order-free. Uses the fit's ROUNDED level/trend (its
    public contract), so an oracle replays the identical arithmetic.
    """
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    train = df.filter(F.col(order_col) <= cutoff)
    fit = holt_linear(train, group_col, order_col, value_col, alpha, beta)
    w = Window.partitionBy(group_col).orderBy(order_col)
    test = (
        df.filter(F.col(order_col) > cutoff)
        .withColumn("h", F.row_number().over(w))
        .filter(F.col("h") <= horizon)
    )
    j = test.join(
        F.broadcast(fit.select(group_col, "level", "trend")), group_col
    )
    fc = F.col("level") + F.col("h") * F.col("trend")
    err = fc - F.col(value_col).cast("double")
    ape = F.abs(err) / F.abs(F.col(value_col).cast("double"))
    return (
        j.select(
            group_col,
            ape.cast("decimal(28,12)").alias("ape"),
            err.cast("decimal(28,12)").alias("err"),
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.round(
                F.sum("ape").cast("double") / F.count(F.lit(1)), 6
            ).alias("mape"),
            F.round(
                F.sum("err").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_err"),
        )
    )


def acf(
    df: DataFrame,
    value_col: str = "value",
    order_col: str = "date",
    group_col: str = "dataset",
    max_lag: int = 6,
) -> DataFrame:
    """Sample autocorrelation function per series ->
    (group, lag, n_pairs, acf) for lags 1..max_lag.

    The seasonality / mean-reversion diagnostic that decides whether
    seasonal_adjust_monthly or a differencing step is warranted:

        acf_k = sum_(t=1..n-k) (x_t - xbar)(x_(t+k) - xbar)
                / sum_(t=1..n) (x_t - xbar)^2

    (the standard full-series-variance denominator, so acf_0 = 1 and
    the values are comparable across k).

    Scale shape: the input is a SERIES — one row per (group, period)
    produced by an upstream aggregate — so the per-group row_number
    window is bounded by calendar length, never by fact count (the
    ewma/gap_fill posture). ALL lags come from ONE band self-join
    (b.pos between a.pos+1 and a.pos+max_lag), <= max_lag rows per
    position, then a (group, lag) hash aggregate.

    Determinism: xbar is an exact decimal(28,6) sum divided once in
    double; deviation products are deterministic IEEE doubles cast to
    decimal(38,6) before the sums, so numerator and denominator are
    order-free on both engines.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy(group_col).orderBy(order_col)
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("x"),
        F.row_number().over(w).alias("pos"),
    )
    stats = base.groupBy("g").agg(
        (
            F.sum(F.col("x").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("xbar"),
    )
    dev = base.join(stats, "g").select(
        "g", "pos", (F.col("x") - F.col("xbar")).alias("d")
    )
    den = dev.groupBy("g").agg(
        F.sum((F.col("d") * F.col("d")).cast("decimal(38,6)")).alias("den")
    )
    a, b = dev.alias("a"), dev.alias("b")
    num = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("b.pos") > F.col("a.pos"))
            & (F.col("b.pos") <= F.col("a.pos") + max_lag),
        )
        .groupBy(
            F.col("a.g").alias("g"),
            (F.col("b.pos") - F.col("a.pos")).alias("lag"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum((F.col("a.d") * F.col("b.d")).cast("decimal(38,6)")).alias(
                "num"
            ),
        )
    )
    return (
        num.join(den, "g")
        .select(
            F.col("g").alias(group_col),
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            F.when(
                F.col("den") != 0,
                F.round(
                    F.col("num").cast("double") / F.col("den").cast("double"),
                    6,
                ),
            )
            .otherwise(0.0)
            .alias("acf"),
        )
    )


def ljung_box(
    df: DataFrame,
    value_col: str = "value",
    order_col: str = "date",
    group_col: str = "dataset",
    max_lag: int = 6,
) -> DataFrame:
    """Ljung-Box portmanteau white-noise test per series ->
    (group, h, n, q_stat) with

        Q = n (n+2) * sum_(k=1..h) acf_k^2 / (n - k)

    — the standard residual-autocorrelation audit after holt_forecast /
    seasonal_adjust: under the null of white noise Q ~ chi2(h), so a
    large Q says the fitted model left structure on the table.

    Scale shape: everything rides on ``acf`` (one band self-join over
    calendar-bounded series positions) plus one series-length count and
    a per-group sum of h terms. Determinism: acf_k is acf()'s 6-decimal
    rounded output, so both engines square the *identical* doubles; the
    h per-lag terms are quantized to decimal(38,12) before the sum so
    Q is summation-order-free.
    """
    rho = acf(df, value_col, order_col, group_col, max_lag)
    n = df.groupBy(F.col(group_col)).agg(F.count(F.lit(1)).alias("n"))
    term = (
        (F.col("acf") * F.col("acf"))
        / (F.col("n") - F.col("lag")).cast("double")
    ).cast("decimal(38,12)")
    return (
        rho.join(n, group_col)
        .select(group_col, "n", "lag", term.alias("t"))
        .groupBy(group_col)
        .agg(
            F.max("lag").cast("int").alias("h"),
            F.max("n").cast("long").alias("n"),
            F.round(
                (F.max("n") * (F.max("n") + 2)).cast("double")
                * F.sum("t").cast("double"),
                6,
            ).alias("q_stat"),
        )
    )


def mann_kendall(
    df: DataFrame,
    value_col: str = "value",
    order_col: str = "date",
    group_col: str = "dataset",
) -> DataFrame:
    """Mann-Kendall monotonic-trend test per series -> one row per
    group (group, n, s_stat, var_s, z).

    The NONPARAMETRIC companion to theil_sen's robust slope (Mann
    1945, Kendall 1975): S = Σ_{time_i<time_j} sgn(x_j − x_i), with
    the FULL Kendall variance correcting ties in both the value and
    the time ranking (t = value-tie group sizes, u = time-tie sizes):

        Var(S) = [ n(n−1)(2n+5) − Σt(t−1)(2t+5) − Σu(u−1)(2u+5) ]/18
               + [Σt(t−1)(t−2)]·[Σu(u−1)(u−2)] / (9n(n−1)(n−2))
               + [Σt(t−1)]·[Σu(u−1)] / (2n(n−1))

    and the continuity-corrected z = (S∓1)/sqrt(Var). The standard
    trend screen for economic series where outliers poison OLS t-tests
    and theil_sen gives the magnitude but not the significance.

    Determinism (r9 ADVICE fix): pairs compare the ORDER VALUE itself,
    not a row_number over it — rows sharing a timestamp form a time-tie
    group whose pairs contribute 0 to S (and enter Var through the u
    terms) instead of flipping sign with arbitrary row order. Rows with
    a null value OR null order key are dropped BEFORE every aggregate,
    so n, the tie terms, and S count the same population. With unique
    non-null timestamps every u = 1, both correction terms vanish, and
    the statistic reduces exactly to the classic value-ties-only form.

    S and all five tie/count terms are EXACT INTEGERS (signs of exact
    decimal differences, tie counts); the only floats are the final
    divisions and one sqrt — no quantization needed anywhere (the
    kendall_tau discipline). Scale: the pair join is calendar-bounded
    (series-sized by contract, the theil_sen posture — a 50-year
    monthly series is 179,700 pairs, never fact-count-sized); ties and
    n are one hash aggregate each off the same pinned base.
    """
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("decimal(18,6)").alias("v"),
        F.col(order_col).alias("o"),
    ).where(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    ).localCheckpoint(eager=True)
    a, b = base.alias("a"), base.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("b.o") > F.col("a.o")),
        )
        .select(
            F.col("a.g").alias("g"),
            F.signum(
                (F.col("b.v") - F.col("a.v")).cast("double")
            ).cast("long").alias("sgn"),
        )
        .groupBy("g")
        .agg(F.sum("sgn").cast("long").alias("s_stat"))
    )
    ties = (
        base.groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("g")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("long").alias("tie_term"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (F.col("t") - 2)
            ).cast("long").alias("t3"),
            F.sum(
                F.col("t") * (F.col("t") - 1)
            ).cast("long").alias("t2"),
            F.sum("t").cast("long").alias("n"),
        )
    )
    tties = (
        base.groupBy("g", "o")
        .agg(F.count(F.lit(1)).cast("long").alias("u"))
        .groupBy("g")
        .agg(
            F.sum(
                F.col("u") * (F.col("u") - 1) * (2 * F.col("u") + 5)
            ).cast("long").alias("u_term"),
            F.sum(
                F.col("u") * (F.col("u") - 1) * (F.col("u") - 2)
            ).cast("long").alias("u3"),
            F.sum(
                F.col("u") * (F.col("u") - 1)
            ).cast("long").alias("u2"),
        )
    )
    j = (
        ties.join(tties, "g")
        .join(s, "g", "left")
        .fillna(0, ["s_stat"])
    )
    nn = F.col("n")
    var_s = (
        (
            nn * (nn - 1) * (2 * nn + 5)
            - F.col("tie_term") - F.col("u_term")
        ).cast("double") / 18.0
        + F.when(
            nn > 2,
            (F.col("t3") * F.col("u3")).cast("double")
            / (9.0 * (nn * (nn - 1) * (nn - 2)).cast("double")),
        ).otherwise(F.lit(0.0))
        + F.when(
            nn > 1,
            (F.col("t2") * F.col("u2")).cast("double")
            / (2.0 * (nn * (nn - 1)).cast("double")),
        ).otherwise(F.lit(0.0))
    )
    sd = F.col("s_stat").cast("double")
    z = F.when(
        var_s > 0,
        F.when(F.col("s_stat") > 0, (sd - 1.0) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (sd + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)),
    )
    return j.select(
        F.col("g").alias(group_col),
        "n",
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
    )


def theil_sen(
    df: DataFrame,
    value_col: str = "value",
    order_col: str = "date",
    group_col: str = "dataset",
) -> DataFrame:
    """Theil-Sen robust trend per series -> (group, n_pairs, slope,
    intercept): slope = median over all i<j of (y_j - y_i)/(j - i) on
    the series position axis, intercept = median of (y_i - slope*i).

    Robust alternative to grouped_ols's least-squares trend_fit — a
    single outlier month (strike, hurricane, data error) moves OLS but
    not the pairwise-slope median (breakdown point ~29%).

    Scale shape: the input is a SERIES (one row per group-period), so
    the all-pairs self-join is calendar-bounded — n(n-1)/2 pairs for an
    n-month series, never fact-count-sized (the acf posture; a 50-year
    monthly series is 179,700 pairs). Medians are exact percentile
    aggregates per group — partition-parallel across groups.

    Determinism: the slope median is rounded to 6 decimals BEFORE the
    residual pass, so both engines compute intercept residuals from the
    identical quantized slope; pair slopes are deterministic IEEE
    doubles of (decimal-exact) inputs and both engines interpolate the
    median identically (linear interpolation at position p*(n-1)).
    """
    w = Window.partitionBy(group_col).orderBy(order_col)
    # pinned: both sides of the pair join AND the residual pass read
    # this series-sized relation — without the checkpoint the whole
    # upstream derivation (often an aggregate) is re-planned three
    # times (the theil_index pinning discipline; measured at sf0.1:
    # 16 -> 6 exchanges, median 1.48 -> 1.15 s; upstream scans 3 -> 1)
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("y"),
        F.row_number().over(w).alias("pos"),
    ).localCheckpoint(eager=True)
    a, b = base.alias("a"), base.alias("b")
    slopes = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("b.pos") > F.col("a.pos")))
        .select(
            F.col("a.g").alias("g"),
            (
                (F.col("b.y") - F.col("a.y"))
                / (F.col("b.pos") - F.col("a.pos")).cast("double")
            ).alias("slope"),
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.percentile(F.col("slope"), F.lit(0.5)), 6).alias("slope"),
        )
    )
    resid = base.join(slopes, "g").select(
        "g", (F.col("y") - F.col("slope") * F.col("pos")).alias("r")
    )
    inter = resid.groupBy("g").agg(
        F.round(F.percentile(F.col("r"), F.lit(0.5)), 6).alias("intercept")
    )
    return slopes.join(inter, "g").select(
        F.col("g").alias(group_col), "n_pairs", "slope", "intercept"
    )


def pacf(
    df: DataFrame,
    value_col: str = "value",
    order_col: str = "date",
    group_col: str = "dataset",
    max_lag: int = 6,
) -> DataFrame:
    """Partial autocorrelation function per series -> (group, lag,
    pacf) for lags 1..max_lag, via the Durbin-Levinson recursion
    UNROLLED into column expressions (no iteration over data):

        phi_(1,1) = rho_1
        phi_(k,k) = (rho_k - sum_j phi_(k-1,j) rho_(k-j))
                    / (1 - sum_j phi_(k-1,j) rho_j)
        phi_(k,j) = phi_(k-1,j) - phi_(k,k) phi_(k-1,k-j)

    Completes the Box-Jenkins identification trio with acf and
    ljung_box: acf tails off + pacf cuts at p -> AR(p); the reverse ->
    MA(q).

    Scale shape: rides acf (band self-join over calendar-bounded
    series positions); the recursion itself runs on the GROUP-SIZED
    pivoted relation (one row per series, max_lag columns) — pure
    scalar expressions, no shuffle beyond acf's.

    Determinism: inputs are acf's 6-decimal rounded values; the
    recursion is fixed-order scalar IEEE arithmetic on them (no
    data-dependent summation order, no transcendentals), and the
    oracle replays the byte-identical expression tree, so every
    intermediate double agrees bit-for-bit. Degenerate denominators
    (constant series) guard to 0.
    """
    h = max_lag
    rho = acf(df, value_col, order_col, group_col, h)
    wide = (
        rho.groupBy(group_col)
        .pivot("lag", list(range(1, h + 1)))
        .agg(F.first("acf"))
    )
    # short series may lack high lags entirely -> 0 contribution
    cur = wide.select(
        group_col,
        *[
            F.coalesce(F.col(str(k)), F.lit(0.0)).alias(f"r{k}")
            for k in range(1, h + 1)
        ],
        F.coalesce(F.col("1"), F.lit(0.0)).alias("phi_1_1"),
    )
    # The naive fully-unrolled form nests phi_(k-1,*) inside BOTH the
    # phi_(k,k) ratio and every phi_(k,j) update -> the expression tree
    # grows ~3^k and Catalyst analysis/codegen dominates wall time
    # (measured: 140 s at max_lag=6 on sf0.1 where execution is
    # milliseconds). Materializing each recursion LEVEL as real columns
    # behind a localCheckpoint keeps every level's expressions O(k)
    # over plain column references — a plain select() is NOT enough
    # because Catalyst collapses adjacent projections and re-inlines
    # the tree. The checkpointed relation is GROUP-sized (one row per
    # series), so the h-1 tiny jobs are the cost of turning an
    # exponential plan into a linear one; arithmetic (and therefore
    # every rounded output and the oracle contract) is unchanged.
    for k in range(2, h + 1):
        num = F.col(f"r{k}")
        den = F.lit(1.0)
        for j in range(1, k):
            num = num - F.col(f"phi_{k-1}_{j}") * F.col(f"r{k-j}")
            den = den - F.col(f"phi_{k-1}_{j}") * F.col(f"r{j}")
        cur = cur.withColumn(
            f"phi_{k}_{k}",
            F.when(den != 0, num / den).otherwise(F.lit(0.0)),
        )
        cur = cur.select(
            "*",
            *[
                (
                    F.col(f"phi_{k-1}_{j}")
                    - F.col(f"phi_{k}_{k}") * F.col(f"phi_{k-1}_{k-j}")
                ).alias(f"phi_{k}_{j}")
                for j in range(1, k)
            ],
        )
        # every OTHER level is barrier enough: two uncheckpointed
        # levels grow the tree ~9x over column refs (fine); three+
        # start compounding toward the exponential regime again
        if k % 2 == 0 or k == h:
            cur = cur.localCheckpoint(eager=True)
    cols = [
        F.round(F.col(f"phi_{k}_{k}"), 6).alias(f"p{k}")
        for k in range(1, h + 1)
    ]
    stack = ", ".join(f"{k}, p{k}" for k in range(1, h + 1))
    return (
        cur.select(group_col, *cols)
        .select(
            group_col,
            F.expr(f"stack({h}, {stack}) as (lag, pacf)"),
        )
        .select(group_col, F.col("lag").cast("int").alias("lag"), "pacf")
    )


def ohlc_resample(
    df: DataFrame,
    date_col: str,
    value_col: str,
    tiebreak_col: str,
    freq: str = "month",
) -> DataFrame:
    """OHLC bar resampling -> one row per period:
    (period, open, high, low, close, volume, total).

    The canonical downsample for economic/market series (the reference
    domain): per calendar period, the FIRST and LAST observation in
    time order plus the extremes and volume. open/close use min_by/
    max_by over a lexicographic (yyyyMMdd + zero-padded tiebreak)
    string key — a total order both engines share (struct ordering
    keys are not portable to every SQL engine's arg_min), so same-day
    observations break ties identically everywhere.

    Scale shape: ONE hash aggregate over the scan — min_by/max_by are
    map-side combinable, so no window, no sort, no shuffle beyond the
    periods-sized exchange; `total` sums decimal(28,6)-quantized
    values for order-free exactness.
    """
    if freq == "month":
        period = F.date_format(F.col(date_col), "yyyy-MM")
    elif freq == "year":
        period = F.date_format(F.col(date_col), "yyyy")
    else:
        raise ValueError(f"freq must be month|year, got {freq}")
    from econdatapipeline_spark.functions.parsing import (  # noqa: PLC0415
        padded_tiebreak,
    )

    ordk = F.concat(
        F.date_format(F.col(date_col), "yyyyMMdd"),
        padded_tiebreak(F.col(tiebreak_col)),
    )
    v = F.col(value_col).cast("double")
    return (
        df.select(period.alias("period"), ordk.alias("__k"), v.alias("__v"))
        .groupBy("period")
        .agg(
            F.min_by("__v", "__k").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max_by("__v", "__k").alias("close"),
            F.count(F.lit(1)).cast("long").alias("volume"),
            F.round(
                F.sum(F.col("__v").cast("decimal(28,6)")).cast("double"), 6
            ).alias("total"),
        )
    )


def adf_test(
    df: DataFrame,
    value_col: str = "value",
    order_col: str = "date",
    group_col: str = "dataset",
) -> DataFrame:
    """Augmented Dickey-Fuller unit-root test (one augmentation lag,
    constant included) per series -> (group, n, beta, se, adf_stat).

    The stationarity gate in front of trend_fit / holt_forecast /
    acf: regress

        dy_t = a + b*y_(t-1) + c*dy_(t-1) + e_t

    and report b's t-ratio (the Dickey-Fuller statistic; reject the
    unit root when it is strongly negative — compare to the
    published DF critical values, e.g. -2.86 at 5% for large n).
    Differencing decisions made by eye are what this replaces.

    Relational shape: per-series lag windows are PARTITIONED by group
    (the acf posture: series-sized by contract, fact-sized work is
    the upstream aggregate that built the series); the regression
    itself is ONE hash aggregate of the nine normal-equation sums —
    all decimal-exact products of decimal(18,6)-quantized values —
    then Cramer's-rule 3x3 solve + t-ratio as FIXED-ORDER scalar
    doubles on those exact sums (the pacf discipline: no
    data-dependent float summation anywhere, so an oracle replays
    the formula tree bit-for-bit).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy(group_col).orderBy(order_col)
    y = F.col(value_col).cast("decimal(18,6)")
    lagged = df.select(
        F.col(group_col).alias("g"),
        y.alias("y"),
        F.lag(y, 1).over(w).alias("y1"),
        F.lag(y, 2).over(w).alias("y2"),
    ).filter(F.col("y2").isNotNull())
    # z = dy_t, l = y_(t-1), d = dy_(t-1) — decimal-exact differences.
    # Each is re-cast to decimal(18,6): a bare difference is
    # decimal(19,6) and its square would hit the 38-precision cap,
    # where Spark and DuckDB reduce scale DIFFERENTLY (silent
    # rounding); at (18,6) every product is an exact (37,12).
    rows = lagged.select(
        "g",
        (F.col("y") - F.col("y1")).cast("decimal(18,6)").alias("z"),
        F.col("y1").cast("decimal(18,6)").alias("l"),
        (F.col("y1") - F.col("y2")).cast("decimal(18,6)").alias("d"),
    )
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    sums = rows.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("l"))).alias("sl"),
        F.sum(dec(F.col("d"))).alias("sd"),
        F.sum(dec(F.col("z"))).alias("sz"),
        F.sum(dec(F.col("l") * F.col("l"))).alias("sll"),
        F.sum(dec(F.col("d") * F.col("d"))).alias("sdd"),
        F.sum(dec(F.col("l") * F.col("d"))).alias("sld"),
        F.sum(dec(F.col("z") * F.col("l"))).alias("szl"),
        F.sum(dec(F.col("z") * F.col("d"))).alias("szd"),
        F.sum(dec(F.col("z") * F.col("z"))).alias("szz"),
    )
    n = F.col("n").cast("double")
    sl = F.col("sl").cast("double")
    sd = F.col("sd").cast("double")
    sz = F.col("sz").cast("double")
    sll = F.col("sll").cast("double")
    sdd = F.col("sdd").cast("double")
    sld = F.col("sld").cast("double")
    szl = F.col("szl").cast("double")
    szd = F.col("szd").cast("double")
    szz = F.col("szz").cast("double")
    # X'X = [[n, sl, sd], [sl, sll, sld], [sd, sld, sdd]]; X'z =
    # [sz, szl, szd]. Cramer's rule; cof22 is the (l,l) cofactor the
    # se(beta) needs.
    det = (
        n * (sll * sdd - sld * sld)
        - sl * (sl * sdd - sld * sd)
        + sd * (sl * sld - sll * sd)
    )
    det_a = (
        sz * (sll * sdd - sld * sld)
        - sl * (szl * sdd - sld * szd)
        + sd * (szl * sld - sll * szd)
    )
    det_b = (
        n * (szl * sdd - sld * szd)
        - sz * (sl * sdd - sld * sd)
        + sd * (sl * szd - szl * sd)
    )
    det_c = (
        n * (sll * szd - szl * sld)
        - sl * (sl * szd - szl * sd)
        + sz * (sl * sld - sll * sd)
    )
    a_hat = det_a / det
    b_hat = det_b / det
    c_hat = det_c / det
    rss = szz - a_hat * sz - b_hat * szl - c_hat * szd
    cof_bb = n * sdd - sd * sd
    sigma2 = rss / (n - 3.0)
    se = F.sqrt(sigma2 * cof_bb / det)
    return sums.select(
        F.col("g").alias(group_col),
        "n",
        F.round(
            F.when(det != 0, b_hat).otherwise(F.lit(0.0)), 6
        ).alias("beta"),
        F.round(
            F.when((det != 0) & (F.col("n") > 3), se).otherwise(F.lit(0.0)),
            6,
        ).alias("se"),
        F.round(
            F.when(
                (det != 0) & (F.col("n") > 3) & (se > 0), b_hat / se
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("adf_stat"),
    )


def engle_granger(
    df: DataFrame,
    x_col: str,
    y_col: str,
    order_col: str = "date",
) -> DataFrame:
    """Engle-Granger two-step cointegration test -> one row
    (n, slope, intercept, adf_stat_resid).

    The "do these two series share a long-run equilibrium" question
    (Engle & Granger 1987) — the honest precondition for regressing
    one trending economic series on another (a spurious regression has
    non-stationary residuals): step 1 fits y = a + b*x by OLS; step 2
    runs the ADF unit-root test on the residuals. Strongly negative
    adf_stat_resid (beyond the EG critical values, e.g. -3.34 at 5%)
    means cointegrated.

    Relational shape: step 1 is ONE hash aggregate of five
    decimal-exact sums -> (slope, intercept) as fixed-order doubles of
    exact sums, broadcast back; step 2 is adf_test verbatim on the
    residual series (residual doubles are deterministic, and adf_test
    re-quantizes them to decimal(18,6) before its own exact sums).
    """
    x = F.col(x_col).cast("decimal(18,6)")
    y = F.col(y_col).cast("decimal(18,6)")
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    sums = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(x)).alias("sx"),
        F.sum(dec(y)).alias("sy"),
        F.sum(dec(x * x)).alias("sxx"),
        F.sum(dec(x * y)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    denom = n * sxx - sx * sx
    coef = sums.select(
        "n",
        F.when(denom != 0, (n * sxy - sx * sy) / denom)
        .otherwise(F.lit(0.0))
        .alias("slope"),
        F.when(denom != 0, (sy - (n * sxy - sx * sy) / denom * sx) / n)
        .otherwise(F.lit(0.0))
        .alias("intercept"),
    )
    resid = df.crossJoin(F.broadcast(coef)).select(
        F.lit("resid").alias("dataset"),
        F.col(order_col).alias("date"),
        (
            F.col(y_col).cast("double")
            - F.col("intercept")
            - F.col("slope") * F.col(x_col).cast("double")
        ).alias("value"),
    )
    stat = adf_test(resid).select(
        F.col("n"), F.col("adf_stat").alias("adf_stat_resid")
    )
    return coef.select(
        F.round(F.col("slope"), 6).alias("slope"),
        F.round(F.col("intercept"), 6).alias("intercept"),
    ).crossJoin(F.broadcast(stat)).select(
        "n", "slope", "intercept", "adf_stat_resid"
    )


def seasonal_strength(
    df: DataFrame,
    key_col: str = "dataset",
    date_col: str = "date",
    value_col: str = "value",
) -> DataFrame:
    """Seasonal-strength diagnostic per series -> (group, n,
    var_detrended, var_remainder, strength).

        F_s = max(0, 1 - Var(remainder) / Var(detrended))

    (Hyndman's STL strength measure, on the multiplicative
    ratio-to-moving-average decomposition seasonal_adjust_monthly
    already computes): near 1 means the calendar explains most of the
    detrended variation — seasonally adjust before modeling; near 0
    means the 'seasonal factors' are fitting noise — do NOT adjust.
    detrended = value/trend (seasonal x remainder), remainder =
    adjusted/trend.

    Shape: seasonal_adjust's two windows/joins, then ONE series-sized
    hash aggregate. Ratios derive from the ROUNDED decomposition
    outputs (engine-portable by construction); variance sums are
    decimal(28,12)/(38,12)-quantized per term, variances fixed-order
    doubles of those exact sums.
    """
    adj = seasonal_adjust_monthly(df, key_col, date_col, value_col)
    base = adj.filter(
        F.col("trend").isNotNull()
        & (F.col("trend") != 0)
        & F.col("seasonal_factor").isNotNull()
    ).select(
        F.col(key_col).alias("g"),
        (F.col(value_col) / F.col("trend")).alias("sr"),
        (F.col("adjusted") / F.col("trend")).alias("r"),
    )
    sums = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("sr").cast("decimal(28,12)")).alias("s_sr"),
        F.sum((F.col("sr") * F.col("sr")).cast("decimal(38,12)")).alias(
            "s_sr2"
        ),
        F.sum(F.col("r").cast("decimal(28,12)")).alias("s_r"),
        F.sum((F.col("r") * F.col("r")).cast("decimal(38,12)")).alias(
            "s_r2"
        ),
    )
    n = F.col("n").cast("double")
    m_sr = F.col("s_sr").cast("double") / n
    m_r = F.col("s_r").cast("double") / n
    var_sr = (F.col("s_sr2").cast("double") - n * m_sr * m_sr) / (n - 1.0)
    var_r = (F.col("s_r2").cast("double") - n * m_r * m_r) / (n - 1.0)
    return sums.select(
        F.col("g").alias(key_col),
        "n",
        F.round(
            F.when(F.col("n") > 1, var_sr).otherwise(0.0), 6
        ).alias("var_detrended"),
        F.round(
            F.when(F.col("n") > 1, var_r).otherwise(0.0), 6
        ).alias("var_remainder"),
        F.round(
            F.when(
                (F.col("n") > 1) & (var_sr > 0),
                F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_sr),
            ).otherwise(0.0),
            6,
        ).alias("strength"),
    )


def vwap(
    df: DataFrame,
    date_col: str,
    price_col: str,
    qty_col: str,
    freq: str = "month",
) -> DataFrame:
    """Volume-weighted average price per period -> one row per period
    (period, vwap, volume, notional).

    The OHLC family's weighted companion (ohlc_resample gives the
    bar, VWAP gives the execution benchmark): Σ(p·q)/Σq with the
    notional carried as decimal-exact products, so the aggregate is
    ONE map-side-combinable hash aggregate with order-free sums —
    identical streaming/batch semantics, nothing scales past the
    scan.
    """
    if freq == "month":
        period = F.date_format(F.col(date_col), "yyyy-MM")
    elif freq == "year":
        period = F.date_format(F.col(date_col), "yyyy")
    else:
        raise ValueError(f"freq must be month|year, got {freq}")
    p = F.col(price_col).cast("decimal(18,6)")
    q = F.col(qty_col).cast("long")
    return (
        df.select(
            period.alias("period"),
            (p * q).cast("decimal(38,6)").alias("pq"),
            q.alias("q"),
        )
        .groupBy("period")
        .agg(
            F.sum("pq").alias("notional6"),
            F.sum("q").cast("long").alias("volume"),
        )
        .select(
            "period",
            F.round(
                F.when(
                    F.col("volume") > 0,
                    F.col("notional6").cast("double")
                    / F.col("volume").cast("double"),
                ),
                6,
            ).alias("vwap"),
            "volume",
            F.round(F.col("notional6").cast("double"), 6).alias("notional"),
        )
    )


def _gauss_steps(m: int, a_names: dict, b_names: list, prefix: str):
    """Unrolled Gaussian elimination (no pivoting — normal-equation
    matrices are SPD) + back-substitution over NAMED scalar columns ->
    (steps, beta_names, final_diag_names).

    Each step is (new_name, infix_expr_over_previous_names) — plain
    double arithmetic valid verbatim in BOTH Spark SQL and DuckDB, so
    generating the sequence ONCE guarantees the operator and the
    oracle perform the identical operation order (the engine-parity
    rule that lets fixed-order doubles of exact decimal sums
    hash-match)."""
    # every division is guarded (NULL on zero divisor): Spark 4 runs
    # ANSI mode where even DOUBLE x/0 raises, and a degenerate group
    # (constant series, n <= params) must flow to NULL outputs under
    # the ok-gate, not crash the whole job. The guard text is valid
    # verbatim in DuckDB and value-identical whenever the divisor is
    # nonzero, so certified queries are unaffected.
    def div(a: str, b: str) -> str:
        return f"CASE WHEN {b} = 0 THEN NULL ELSE ({a}) / {b} END"

    cur = {}
    for i in range(m):
        for j in range(m):
            cur[(i, j)] = a_names[(min(i, j), max(i, j))]
    curb = list(b_names)
    steps = []
    for k in range(m):
        for i in range(k + 1, m):
            f = f"{prefix}_f{k}_{i}"
            steps.append((f, div(cur[(i, k)], cur[(k, k)])))
            for j in range(k + 1, m):
                nn = f"{prefix}_a{k}_{i}_{j}"
                steps.append((nn, f"{cur[(i, j)]} - {f} * {cur[(k, j)]}"))
                cur[(i, j)] = nn
            nb = f"{prefix}_b{k}_{i}"
            steps.append((nb, f"{curb[i]} - {f} * {curb[k]}"))
            curb[i] = nb
    betas = [None] * m
    for i in reversed(range(m)):
        expr = curb[i]
        for j in range(i + 1, m):
            expr = f"({expr} - {cur[(i, j)]} * {prefix}_beta{j})"
        steps.append((f"{prefix}_beta{i}", div(expr, cur[(i, i)])))
        betas[i] = f"{prefix}_beta{i}"
    diag = [cur[(k, k)] for k in range(m)]
    return steps, betas, diag


def _gauss_solve_fixed(a, bs):
    """Driver-side multi-RHS solve replaying EXACTLY the operation
    order _gauss_steps emits — no pivoting, row updates then RHS
    update per (k, i), left-nested back-substitution — so a python
    solve and an SQL-oracle solve of the same system produce
    bit-identical doubles (the discipline that lets p >= 3 Newton
    solves stay oracle-certified instead of falling back to numpy's
    LAPACK, whose pivot order no SQL text can replay).

    ``a`` is a full m x m matrix (list of rows), ``bs`` a list of RHS
    vectors sharing one elimination. Returns the list of solution
    vectors, or None when any elimination divisor is zero or any
    final pivot is non-positive (the SQL ok-gate: SPD contract,
    never-fabricate).
    """
    m = len(a)
    cur = [[float(a[i][j]) for j in range(m)] for i in range(m)]
    curbs = [[float(v) for v in b] for b in bs]
    for k in range(m):
        for i in range(k + 1, m):
            if cur[k][k] == 0:
                return None
            f = cur[i][k] / cur[k][k]
            for j in range(k + 1, m):
                cur[i][j] = cur[i][j] - f * cur[k][j]
            for b in curbs:
                b[i] = b[i] - f * b[k]
    for k in range(m):
        if not cur[k][k] > 0:
            return None
    outs = []
    for b in curbs:
        beta = [0.0] * m
        for i in reversed(range(m)):
            expr = b[i]
            for j in range(i + 1, m):
                expr = expr - cur[i][j] * beta[j]
            beta[i] = expr / cur[i][i]
        outs.append(beta)
    return outs


def _step_levels(steps):
    """Group a (name, expr) step sequence into maximal batches where
    no expr references a name introduced in the SAME batch — so a
    consumer can apply each batch as one projection (withColumns on
    the Spark side, one chained CTE on the oracle side) and plan depth
    stays O(levels) instead of O(steps). Pure regrouping: every step
    still sees exactly the names earlier steps produced, so the
    emitted arithmetic is unchanged."""
    import re  # noqa: PLC0415

    levels: list[dict] = []
    cur: dict = {}
    for nm, e in steps:
        if cur and any(
            re.search(rf"\b{re.escape(n)}\b", e) for n in cur
        ):
            levels.append(cur)
            cur = {}
        cur[nm] = e
    if cur:
        levels.append(cur)
    return levels


def _apply_steps_one_sql(
    cur: DataFrame, steps, keep=None, barrier_every: int | None = 8
) -> DataFrame:
    """Apply a (name, expr) step chain as ONE spark.sql call of
    liveness-pruned nested SELECTs instead of per-level withColumns.

    Two fixed Catalyst costs die here (measured on var_fit at sf0.1,
    the 49-level / 264-column Gauss chain):

    - withColumns re-analyzes the whole growing plan per call
      (sum-of-prefixes work) and every level carries EVERY column;
      one SQL string is a single parse + analysis of the same tree.
    - ``keep`` (the names the caller's final projection reads) drives
      a backward liveness pass: each nested SELECT lists only the
      columns some LATER level or the final output still references,
      and steps whose name is never live are dropped outright — so
      analysis width shrinks instead of growing monotonically.

    The emitted arithmetic for every surviving step is the fragment
    text verbatim — values, columns, and parity hashes are unchanged
    (the oracle keeps its own full SELECT * CTE chain; pruning is a
    Spark-plan concern). Used on the default (few-groups) path;
    many_groups keeps withColumns + persist barriers where barrier
    placement is the point.
    """
    import re  # noqa: PLC0415

    levels = _step_levels_topo(steps)
    known = set(cur.columns) | {nm for nm, _ in steps}

    def refs(expr: str) -> set:
        return {
            t
            for t in re.findall(r"\b[A-Za-z_]\w*\b", expr)
            if t in known
        }

    # Backward liveness: out_i = columns level i must output. keep
    # may be raw expression text tokens; only known names count.
    # keep=None disables pruning (every name survives) — right when
    # the caller consumes most of the chain or hasn't enumerated its
    # reads; the one-parse/one-analysis win still applies.
    # barrier_every=None disables the lazy checkpoint barriers —
    # right for short chains consumed ONCE (no fan-out duplication to
    # stop, and each barrier costs a micro-job per executed plan).
    need = known if keep is None else {t for t in keep if t in known}
    plans = []  # (passthrough_cols, {nm: expr}) per level, reversed
    for batch in reversed(levels):
        out = set(need)
        emitted = {nm: e for nm, e in batch.items() if nm in out}
        passthrough = out - set(emitted)
        need = set(passthrough)
        for e in emitted.values():
            need |= refs(e)
        plans.append((sorted(passthrough), emitted))
    plans.reverse()
    base_cols = sorted(need)
    text = (
        f"SELECT {', '.join(base_cols)} FROM {{cur}}"
        if base_cols
        else "SELECT * FROM {cur}"
    )
    # A LAZY checkpoint barrier every BARRIER levels: CollapseProject
    # would otherwise inline the whole chain into one projection
    # whose trees grow ~branching^depth, and the OPTIMIZER walk of
    # that tree (not codegen — measured ~3.2s even with
    # factoryMode=NO_CODEGEN) dominates the query. Depth-capped
    # segments keep every tree small; each barrier costs one
    # |groups|-row micro-job at action time and nothing at
    # explain()/plan-audit time.
    for i, (passthrough, emitted) in enumerate(plans):
        cols = ", ".join(
            passthrough + [f"{e} AS {nm}" for nm, e in emitted.items()]
        )
        if cols:  # a fully-dead level projects nothing — skip it
            text = f"SELECT {cols} FROM ({text})"
        if (
            barrier_every
            and (i + 1) % barrier_every == 0
            and (i + 1) < len(plans)
        ):
            cur = cur.sparkSession.sql(text, cur=cur).localCheckpoint(
                eager=False
            )
            text = "SELECT * FROM {cur}"
    return cur.sparkSession.sql(text, cur=cur)


def _step_levels_topo(steps):
    """Topological variant of _step_levels: level(step) = 1 + max
    level of the names it references, so independent steps share a
    level regardless of their textual position (the var Gauss chain
    packs 209 steps into 22 levels vs the greedy splitter's 49 —
    half the nested projections to analyze and optimize). Requires
    UNIQUE step names (asserted): a redefinition would make "which
    definition does this reference mean" order-dependent, which is
    why the greedy splitter remains the default (weibull's se chain
    redefines names). Same guarantee as _step_levels: every expr
    only ever references names from strictly earlier levels, so the
    emitted arithmetic is unchanged."""
    import re  # noqa: PLC0415

    names = [nm for nm, _ in steps]
    assert len(names) == len(set(names)), "topo levels need unique names"
    depth: dict = {}
    levels: list[dict] = []
    for nm, e in steps:
        d = 1 + max(
            (
                depth[t]
                for t in re.findall(r"\b[A-Za-z_]\w*\b", e)
                if t in depth
            ),
            default=0,
        )
        depth[nm] = d
        while len(levels) < d:
            levels.append({})
        levels[d - 1][nm] = e
    return levels


def granger_fragments(lags: int) -> dict:
    """Shared Spark/DuckDB SQL fragments for the multi-lag Granger
    test — the single source of truth both the operator and the
    oracle consume, so the two engines execute the same text.

    Returns {aggs, steps, beta_x, f, ok, m}: ``aggs`` are the
    decimal-exact normal-equation aggregate expressions over a
    relation with columns y (decimal(18,6)) and z1..z2p (y lags then
    x lags, decimal(18,6)); ``steps`` the named fixed-order double
    sequence (Gauss solves for both models + RSS + F); ``beta_x`` /
    ``f`` / ``ok`` the output expressions.
    """
    p = lags
    m = 2 * p + 1
    zs = list(range(1, 2 * p + 1))
    aggs = [
        "CAST(COUNT(*) AS BIGINT) AS n",
        "CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy",
        "CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy",
    ]
    for i in zs:
        aggs.append(
            f"CAST(SUM(CAST(z{i} AS DECIMAL(38,12))) AS DOUBLE) AS s_{i}"
        )
        aggs.append(
            f"CAST(SUM(CAST(z{i} * y AS DECIMAL(38,12))) AS DOUBLE)"
            f" AS t_{i}"
        )
    for i in zs:
        for j in zs:
            if j >= i:
                aggs.append(
                    f"CAST(SUM(CAST(z{i} * z{j} AS DECIMAL(38,12)))"
                    f" AS DOUBLE) AS c_{i}_{j}"
                )
    steps = [("nd", "CAST(n AS DOUBLE)")]
    a_u = {(0, 0): "nd"}
    for j in zs:
        a_u[(0, j)] = f"s_{j}"
    for i in zs:
        for j in zs:
            if j >= i:
                a_u[(i, j)] = f"c_{i}_{j}"
    b_u = ["sy"] + [f"t_{i}" for i in zs]
    su, betas_u, diag_u = _gauss_steps(m, a_u, b_u, "u")
    steps += su
    a_r = {(0, 0): "nd"}
    for j in range(1, p + 1):
        a_r[(0, j)] = f"s_{j}"
    for i in range(1, p + 1):
        for j in range(i, p + 1):
            a_r[(i, j)] = f"c_{i}_{j}"
    b_r = ["sy"] + [f"t_{i}" for i in range(1, p + 1)]
    sr, betas_r, diag_r = _gauss_steps(p + 1, a_r, b_r, "r")
    steps += sr
    rss_u = "syy"
    for bn, orig in zip(betas_u, b_u):
        rss_u = f"({rss_u} - {bn} * {orig})"
    steps.append(("u_rss", rss_u))
    rss_r = "syy"
    for bn, orig in zip(betas_r, b_r):
        rss_r = f"({rss_r} - {bn} * {orig})"
    steps.append(("r_rss", rss_r))
    steps.append(
        (
            "gdenom",
            f"CASE WHEN (nd - CAST({m} AS DOUBLE)) = 0 THEN NULL"
            f" ELSE u_rss / (nd - CAST({m} AS DOUBLE)) END",
        )
    )
    steps.append(
        (
            "gf",
            f"CASE WHEN gdenom = 0 THEN NULL"
            f" ELSE ((r_rss - u_rss) / CAST({p} AS DOUBLE)) / gdenom END",
        )
    )
    pivots = " AND ".join(
        f"{d} > 0" for d in dict.fromkeys(diag_u + diag_r)
    )
    ok = f"n > {m} AND u_rss > 0 AND {pivots}"
    return {
        "aggs": aggs,
        "steps": steps,
        "beta_x": betas_u[p + 1],
        "f": "gf",
        "ok": ok,
        "m": m,
    }


def granger_causality(
    df: DataFrame,
    y_col: str,
    x_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
    lags: int = 1,
) -> DataFrame:
    """Granger causality test per series pair -> one row per
    group (group, n, beta_x, f_stat).

    "Do lagged values of x improve the forecast of y beyond y's own
    lags?" (Granger 1969) — the standard lead/lag screen between
    economic indicators before any structural claim. Restricted model
    y_t ~ a + Σ b_i·y_(t-i); unrestricted adds Σ c_i·x_(t-i);
    F = ((RSS_r − RSS_u)/p)/(RSS_u/(n − (2p+1))).

    The adf_test discipline verbatim: per-group lag windows
    (PARTITIONED, never global), both regressions from ONE hash
    aggregate of decimal-exact normal-equation sums (every product an
    exact (37,12) of decimal(18,6) re-quantized inputs), fixed-order
    double solves and the F ratio — an oracle replays the formula tree
    bit-for-bit. ``lags=1`` keeps the original explicit Cramer 3x3 /
    2x2 path (hash-stable with prior rounds); ``lags >= 2`` (p <= 4,
    VERDICT r7 #5) runs the generated unrolled Gauss elimination from
    granger_fragments — the SAME (name, expr) sequence the SQL oracle
    chains, so operation order is shared by construction. beta_x is
    the first x-lag coefficient in both paths.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if lags < 1 or lags > 4:
        raise ValueError(f"lags must be in 1..4, got {lags}")
    if lags >= 2:
        p = lags
        frag = granger_fragments(p)
        w = Window.partitionBy(group_col).orderBy(order_col)
        yq = F.col(y_col).cast("decimal(18,6)")
        xq = F.col(x_col).cast("decimal(18,6)")
        sel = [F.col(group_col).alias("g"), yq.alias("y")]
        for i in range(1, p + 1):
            sel.append(F.lag(yq, i).over(w).alias(f"z{i}"))
        for i in range(1, p + 1):
            sel.append(F.lag(xq, i).over(w).alias(f"z{p + i}"))
        lagged = df.select(*sel)
        keep = F.lit(True)
        for i in range(1, 2 * p + 1):
            keep = keep & F.col(f"z{i}").isNotNull()
        lagged = lagged.filter(keep)
        cur = lagged.groupBy("g").agg(
            *[F.expr(a) for a in frag["aggs"]]
        )
        for name, e in frag["steps"]:
            cur = cur.withColumn(name, F.expr(e))
        ok = F.expr(frag["ok"])
        return cur.select(
            F.col("g").alias(group_col),
            "n",
            F.round(F.when(ok, F.expr(frag["beta_x"])), 6).alias(
                "beta_x"
            ),
            F.round(F.when(ok, F.expr(frag["f"])), 6).alias("f_stat"),
        )
    w = Window.partitionBy(group_col).orderBy(order_col)
    yq = F.col(y_col).cast("decimal(18,6)")
    xq = F.col(x_col).cast("decimal(18,6)")
    lagged = df.select(
        F.col(group_col).alias("g"),
        yq.alias("y"),
        F.lag(yq, 1).over(w).alias("y1"),
        F.lag(xq, 1).over(w).alias("x1"),
    ).filter(F.col("y1").isNotNull() & F.col("x1").isNotNull())
    rows = lagged.select(
        "g",
        F.col("y").cast("decimal(18,6)").alias("z"),
        F.col("y1").cast("decimal(18,6)").alias("l"),
        F.col("x1").cast("decimal(18,6)").alias("d"),
    )
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    sums = rows.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("l"))).alias("sl"),
        F.sum(dec(F.col("d"))).alias("sd"),
        F.sum(dec(F.col("z"))).alias("sz"),
        F.sum(dec(F.col("l") * F.col("l"))).alias("sll"),
        F.sum(dec(F.col("d") * F.col("d"))).alias("sdd"),
        F.sum(dec(F.col("l") * F.col("d"))).alias("sld"),
        F.sum(dec(F.col("z") * F.col("l"))).alias("szl"),
        F.sum(dec(F.col("z") * F.col("d"))).alias("szd"),
        F.sum(dec(F.col("z") * F.col("z"))).alias("szz"),
    )
    n = F.col("n").cast("double")
    sl = F.col("sl").cast("double")
    sd = F.col("sd").cast("double")
    sz = F.col("sz").cast("double")
    sll = F.col("sll").cast("double")
    sdd = F.col("sdd").cast("double")
    sld = F.col("sld").cast("double")
    szl = F.col("szl").cast("double")
    szd = F.col("szd").cast("double")
    szz = F.col("szz").cast("double")
    # unrestricted: X = [1, y1, x1] — same 3x3 Cramer layout as adf
    det = (
        n * (sll * sdd - sld * sld)
        - sl * (sl * sdd - sld * sd)
        + sd * (sl * sld - sll * sd)
    )
    det_a = (
        sz * (sll * sdd - sld * sld)
        - sl * (szl * sdd - sld * szd)
        + sd * (szl * sld - sll * szd)
    )
    det_b = (
        n * (szl * sdd - sld * szd)
        - sz * (sl * sdd - sld * sd)
        + sd * (sl * szd - szl * sd)
    )
    det_c = (
        n * (sll * szd - szl * sld)
        - sl * (sl * szd - szl * sd)
        + sz * (sl * sld - sll * sd)
    )
    a_u = det_a / det
    b_u = det_b / det
    c_u = det_c / det
    rss_u = szz - a_u * sz - b_u * szl - c_u * szd
    # restricted: X = [1, y1] — 2x2 solve on the same sums
    det_r = n * sll - sl * sl
    a_r = (sz * sll - sl * szl) / det_r
    b_r = (n * szl - sl * sz) / det_r
    rss_r = szz - a_r * sz - b_r * szl
    f_stat = (rss_r - rss_u) / (rss_u / (n - 3.0))
    ok = (F.col("n") > 3) & (det != 0) & (det_r != 0) & (rss_u > 0)
    return sums.select(
        F.col("g").alias(group_col),
        "n",
        F.round(F.when(ok, c_u), 6).alias("beta_x"),
        F.round(F.when(ok, f_stat), 6).alias("f_stat"),
    )


def newey_west(
    df: DataFrame,
    y_col: str = "value",
    x_col: str = "x",
    order_col: str = "date",
    group_col: str = "dataset",
    lags: int = 4,
) -> DataFrame:
    """OLS slope with Newey-West HAC standard errors per series ->
    (group, n, slope, se_ols, se_hac).

    Economic time series have autocorrelated residuals, so trend_fit's
    i.i.d. standard error overstates certainty; Newey-West (1987)
    corrects the slope variance with Bartlett-weighted residual
    autocovariances: Var(b) = Σ_l w_l γ_l / (Σ x̃²)², w_l = 1−l/(L+1),
    γ_l = Σ_t u_t u_(t−l) (doubled for l >= 1), u_t = x̃_t e_t.

    Relational shape (the adf_test discipline): the OLS fit is ONE
    hash aggregate of decimal-exact sums of decimal(18,6)-quantized
    inputs; u_t is a deterministic IEEE double; the L autocovariance
    terms come from per-group LAG windows (PARTITIONED — series-sized
    by contract) with products decimal(38,6)-quantized before the
    order-free sums. All outputs are O(1)-to-small ratios of the big
    sums, which is what keeps them inside the engine-parity wall
    (ORACLE_PARITY.md: ratios of quantized sums are portable; raw
    big-magnitude sums are not).
    """
    if lags < 1:
        raise ValueError(f"lags must be >= 1, got {lags}")
    from pyspark.sql import Window  # noqa: PLC0415

    xq = F.col(x_col).cast("decimal(18,6)")
    yq = F.col(y_col).cast("decimal(18,6)")
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("t"),
        xq.alias("x"),
        yq.alias("y"),
    )
    sums = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    det = n * sxx - sx * sx
    fit = sums.select(
        "g",
        "n",
        ((n * sxy - sx * sy) / det).alias("b"),
        ((sy * sxx - sx * sxy) / det).alias("a"),
        (sx / n).alias("xbar"),
        (sxx - sx * sx / n).alias("sxt"),
        (
            (syy - (sy * (sy * sxx - sx * sxy) / det)
             - (sxy * (n * sxy - sx * sy) / det))
        ).alias("rss"),
    )
    u = (
        (F.col("x").cast("double") - F.col("xbar"))
        * (
            F.col("y").cast("double")
            - F.col("a")
            - F.col("b") * F.col("x").cast("double")
        )
    )
    w = Window.partitionBy("g").orderBy("t")
    scored = base.join(fit, "g").withColumn("u", u)
    gcols = [
        F.sum((F.col("u") * F.col("u")).cast("decimal(38,6)")).alias("g0")
    ]
    for lag in range(1, lags + 1):
        scored = scored.withColumn(
            f"u{lag}", F.lag(F.col("u"), lag).over(w)
        )
        gcols.append(
            F.sum(
                F.when(
                    F.col(f"u{lag}").isNotNull(),
                    (F.col("u") * F.col(f"u{lag}")).cast("decimal(38,6)"),
                )
            ).alias(f"g{lag}")
        )
    hac = scored.groupBy(
        "g", "n", "b", "rss", "sxt"
    ).agg(*gcols)
    v = F.col("g0").cast("double")
    for lag in range(1, lags + 1):
        wgt = 1.0 - float(lag) / float(lags + 1)
        v = v + 2.0 * F.lit(wgt) * F.coalesce(
            F.col(f"g{lag}").cast("double"), F.lit(0.0)
        )
    n2 = F.col("n").cast("double")
    sxt = F.col("sxt")
    ok = (F.col("n") > 2) & (sxt > 0)
    return hac.select(
        F.col("g").alias(group_col),
        "n",
        F.round(F.when(ok, F.col("b")), 6).alias("slope"),
        F.round(
            F.when(ok, F.sqrt((F.col("rss") / (n2 - 2.0)) / sxt)), 6
        ).alias("se_ols"),
        F.round(
            F.when(ok & (v > 0), F.sqrt(v / (sxt * sxt))), 6
        ).alias("se_hac"),
    )


def rolling_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
    window_rows: int = 12,
) -> DataFrame:
    """Trailing-window Pearson correlation of two aligned series ->
    (group, order, n_w, corr).

    The co-movement monitor (rolling beta's symmetric sibling): has
    the relationship between two indicators drifted? Inputs quantize
    to decimal(18,6) so every windowed sum (Σx, Σy, Σxy, Σx², Σy²) is
    an EXACT decimal over the trailing frame — order-free, engine
    portable; the correlation is a fixed-order double formula of
    those exact window sums. One window spec PARTITIONED by series
    key serves all five sums (single sort; the rolling_zscore
    posture). corr is null until the frame holds >= 2 rows or when
    either variance is 0.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    xq = F.col(x_col).cast("decimal(18,6)")
    yq = F.col(y_col).cast("decimal(18,6)")
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("t"),
        xq.alias("x"),
        yq.alias("y"),
    )
    n_w = F.count(F.lit(1)).over(
        Window.partitionBy("g").orderBy("t").rowsBetween(
            -(window_rows - 1), 0
        )
    )
    wb = Window.partitionBy("g").orderBy("t").rowsBetween(
        -(window_rows - 1), 0
    )
    sx = F.sum(dec(F.col("x"))).over(wb).cast("double")
    sy = F.sum(dec(F.col("y"))).over(wb).cast("double")
    sxy = F.sum(dec(F.col("x") * F.col("y"))).over(wb).cast("double")
    sxx = F.sum(dec(F.col("x") * F.col("x"))).over(wb).cast("double")
    syy = F.sum(dec(F.col("y") * F.col("y"))).over(wb).cast("double")
    nd = n_w.cast("double")
    cov = nd * sxy - sx * sy
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    return base.select(
        F.col("g").alias(group_col),
        F.col("t").alias(order_col),
        n_w.cast("long").alias("n_w"),
        F.round(
            F.when(
                (n_w >= 2) & (vx > 0) & (vy > 0),
                cov / F.sqrt(vx * vy),
            ),
            6,
        ).alias("corr"),
    )


def kpss_test(
    df: DataFrame,
    value_col: str = "value",
    order_col: str = "date",
    group_col: str = "dataset",
    lags: int = 4,
) -> DataFrame:
    """KPSS level-stationarity test per series ->
    (group, n, kpss_stat, reject_5pct).

    The complement of adf_test: ADF's null is a unit root (reject =
    evidence of stationarity), KPSS's null is stationarity (reject =
    evidence of a unit root). Running both is the standard
    confirmatory protocol — agreement settles the differencing
    decision, disagreement flags near-integrated series. Statistic
    (Kwiatkowski-Phillips-Schmidt-Shin 1992, level case):

        eta = n^-2 Σ_t S_t²,  S_t = Σ_{s<=t} e_s,  e_t = y_t − ybar
        kpss = eta / lrv,  lrv = γ0 + 2 Σ_{l=1..q} (1 − l/(q+1)) γ_l

    with γ_l = n^-1 Σ e_t e_{t−l} (Bartlett weights, the newey_west
    kernel). reject_5pct compares to the published 5% critical value
    0.463 (1%: 0.739, 10%: 0.347).

    Decimal-exactness trick: the residual e_t = y_t − sy/n is NOT a
    decimal, but its scaling E_t = n·y_t − sy IS (exact integer-scaled
    decimal), as are the partial sums of E and all their products —
    so every data-dependent sum here is order-free decimal, and the
    statistic reduces to kpss = ΣS² / (n·(G0 + 2Σ w_l G_l)) in E-units
    (the n powers cancel), leaving only fixed-order doubles of exact
    sums for the oracle to replay. Domain: |n·y| and |S| must fit
    decimal(18,6) (~1e12) — pre-scale big-magnitude series (the
    ORACLE_PARITY rule), as elsewhere.

    Relational shape: per-series windows are PARTITIONED by group
    (the adf_test/acf posture — series-sized by contract); the rest
    is ONE hash aggregate. NULL when n <= lags + 1 or the long-run
    variance degenerates to <= 0.
    """
    if lags < 1:
        raise ValueError(f"lags must be >= 1, got {lags}")
    from pyspark.sql import Window  # noqa: PLC0415

    base = df.filter(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("t"),
        F.col(value_col).cast("decimal(18,6)").alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    grp = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("y").cast("decimal(38,6)")).alias("sy"),
    )
    w = Window.partitionBy("g").orderBy("t")
    joined = base.join(F.broadcast(grp), "g")
    rows = joined.select(
        "g",
        "t",
        "n",
        (
            F.col("y") * F.col("n").cast("decimal(18,0)") - F.col("sy")
        ).cast("decimal(18,6)").alias("e"),
    )
    cum = rows.select(
        "g",
        "n",
        F.col("e"),
        F.sum("e").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("decimal(18,6)").alias("s"),
        *[
            F.lag("e", lag).over(w).alias(f"e{lag}")
            for lag in range(1, lags + 1)
        ],
    )
    sums = cum.groupBy("g").agg(
        F.max("n").alias("n"),
        F.sum(dec(F.col("s") * F.col("s"))).alias("ss"),
        F.sum(dec(F.col("e") * F.col("e"))).alias("g0"),
        *[
            F.sum(dec(F.col("e") * F.col(f"e{lag}"))).alias(f"g{lag}")
            for lag in range(1, lags + 1)
        ],
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    wsum = None
    for lag in range(1, lags + 1):
        term = F.lit(1.0 - lag / (lags + 1.0)) * d(f"g{lag}")
        wsum = term if wsum is None else wsum + term
    den = F.col("n").cast("double") * (d("g0") + 2.0 * wsum)
    stat = F.try_divide(d("ss"), den)
    ok = (F.col("n") > lags + 1) & (den > 0)
    return sums.select(
        F.col("g").alias("dataset"),
        "n",
        F.when(ok, F.round(stat, 6)).alias("kpss_stat"),
        F.when(ok, stat > 0.463).alias("reject_5pct"),
    )


def chow_test(
    df: DataFrame,
    y_col: str,
    x_col: str,
    regime_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Chow structural-break test at a KNOWN break -> one row per
    group (group?, n1, n2, f_stat, df2).

    Did the y~x relationship change between two regimes (pre/post a
    policy date, an algorithm launch, a redefinition)? With simple
    OLS per regime and pooled,

        F = ((RSS_p − RSS_1 − RSS_2) / 2) / ((RSS_1 + RSS_2)/(n−4))

    ~ F(2, n−4) under no break. ``regime_col`` is the caller-built
    0/1 indicator (e.g. date >= break). df2 = n−4 is emitted so the
    caller can look up the critical value; the statistic itself is
    the portable output (the anova_oneway rule — no data-dependent
    quantile approximations in the engine).

    Relational shape: ONE hash aggregate of CASE-gated decimal-exact
    sums (both regimes + implicit pooled via their sums), then O(1)
    fixed-order double closed forms RSS = cyy − cxy²/cxx per piece.
    NULLs when either regime has n < 3, any cxx degenerates, or
    pooled RSS < split RSS by rounding (clamped at 0 numerator).
    """
    gcols = [group_col] if group_col else []
    r = F.col(regime_col).cast("int")
    base = df.filter(
        F.col(y_col).isNotNull()
        & F.col(x_col).isNotNull()
        & r.isNotNull()
    ).select(
        *gcols,
        r.alias("rg"),
        F.col(x_col).cast("decimal(18,6)").alias("x"),
        F.col(y_col).cast("decimal(18,6)").alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    zero6 = F.lit(0).cast("decimal(18,6)")

    def rsum(regime, expr):
        return F.sum(
            dec(F.when(F.col("rg") == regime, expr).otherwise(zero6))
        )

    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for rg in (0, 1):
        aggs += [
            F.sum(F.when(F.col("rg") == rg, 1).otherwise(0))
            .cast("long")
            .alias(f"n{rg}"),
            rsum(rg, F.col("x")).alias(f"sx{rg}"),
            rsum(rg, F.col("y")).alias(f"sy{rg}"),
            rsum(rg, F.col("x") * F.col("x")).alias(f"sxx{rg}"),
            rsum(rg, F.col("x") * F.col("y")).alias(f"sxy{rg}"),
            rsum(rg, F.col("y") * F.col("y")).alias(f"syy{rg}"),
        ]
    sums = base.groupBy(*gcols).agg(*aggs)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    dv = F.try_divide

    def rss(nn, sx, sy, sxx, sxy, syy):
        cxx = sxx - dv(sx * sx, nn)
        cxy = sxy - dv(sx * sy, nn)
        cyy = syy - dv(sy * sy, nn)
        return cyy - dv(cxy * cxy, cxx), cxx

    n0, n1 = d("n0"), d("n1")
    rss0, cxx0 = rss(
        n0, d("sx0"), d("sy0"), d("sxx0"), d("sxy0"), d("syy0")
    )
    rss1, cxx1 = rss(
        n1, d("sx1"), d("sy1"), d("sxx1"), d("sxy1"), d("syy1")
    )
    nP = n0 + n1
    rssP, cxxP = rss(
        nP,
        d("sx0") + d("sx1"),
        d("sy0") + d("sy1"),
        d("sxx0") + d("sxx1"),
        d("sxy0") + d("sxy1"),
        d("syy0") + d("syy1"),
    )
    num = F.greatest(F.lit(0.0), rssP - (rss0 + rss1)) / 2.0
    den = dv(rss0 + rss1, nP - 4.0)
    fstat = dv(num, den)
    ok = (
        (F.col("n0") > 2)
        & (F.col("n1") > 2)
        & (cxx0 > 0)
        & (cxx1 > 0)
        & (cxxP > 0)
        & (den > 0)
    )
    return sums.select(
        *gcols,
        F.col("n0").alias("n1_regime0"),
        F.col("n1").alias("n2_regime1"),
        F.when(ok, F.round(fstat, 6)).alias("f_stat"),
        (F.col("n") - 4).cast("long").alias("df2"),
    )


def breusch_pagan(
    df: DataFrame,
    y_col: str,
    x_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Breusch-Pagan heteroskedasticity test (Koenker studentized
    form) -> one row per group (group?, n, lm_stat, reject_5pct).

    OLS inference (trend_fit, newey_west's base fit, chow_test)
    assumes constant residual variance; BP regresses the squared
    residuals on x and reports LM = n·R², asymptotically
    chi-square(1) for one regressor (5% critical value 3.841459).
    Fan-shaped revenue series — the normal state of economic data —
    fail this loudly and should route to newey_west/robust errors.

    Relational shape: TWO aggregates (the aipw two-pass rule). Pass
    one fits OLS from decimal-exact sums and broadcasts (a, b) as a
    1-row relation; pass two computes e² = (y − a − bx)² per row as
    a fixed-order double, quantizes e², x·e², e⁴ to decimal(28,12),
    and reduces. R² of e² on x comes from those sums as O(1)
    fixed-order doubles. Domain: |e²| < ~1e16 quantizer capacity —
    pre-scale big-magnitude series. NULLs when n < 4 or either
    variance degenerates.
    """
    from econdatapipeline_spark.sources.tables import fan_out  # noqa: PLC0415

    gcols = [group_col] if group_col else []
    # fan_out: both Breusch-Pagan passes re-scan this projection and a
    # single-split source would serialize their decimal-sum map sides
    base = fan_out(
        df.filter(
            F.col(y_col).isNotNull() & F.col(x_col).isNotNull()
        ).select(
            *gcols,
            F.col(x_col).cast("decimal(18,6)").alias("x"),
            F.col(y_col).cast("decimal(18,6)").alias("y"),
        )
    )
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    sums = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    dv = F.try_divide
    nn = d("n")
    cxx = d("sxx") - dv(d("sx") * d("sx"), nn)
    cxy = d("sxy") - dv(d("sx") * d("sy"), nn)
    b = dv(cxy, cxx)
    a = dv(d("sy"), nn) - b * dv(d("sx"), nn)
    params = sums.select(
        *gcols,
        F.col("n"),
        a.cast("decimal(18,9)").cast("double").alias("a"),
        b.cast("decimal(18,9)").cast("double").alias("b"),
    )
    if gcols:
        joined = base.join(F.broadcast(params), gcols)
    else:
        joined = base.crossJoin(F.broadcast(params))
    xd = F.col("x").cast("double")
    e = F.col("y").cast("double") - F.col("a") - F.col("b") * xd
    e2 = e * e
    q28 = lambda c: c.cast("decimal(28,12)")  # noqa: E731
    pass2 = joined.groupBy(*gcols).agg(
        F.max("n").alias("n"),
        F.sum(q28(F.col("x").cast("double"))).alias("px"),
        F.sum(q28(xd * xd)).alias("pxx"),
        F.sum(q28(e2)).alias("pe2"),
        F.sum(q28(xd * e2)).alias("pxe2"),
        F.sum(q28(e2 * e2)).alias("pe4"),
    )
    n2 = F.col("n").cast("double")
    d2 = lambda c: F.col(c).cast("double")  # noqa: E731
    cxx2 = d2("pxx") - dv(d2("px") * d2("px"), n2)
    ce2x = d2("pxe2") - dv(d2("px") * d2("pe2"), n2)
    ve2 = d2("pe4") - dv(d2("pe2") * d2("pe2"), n2)
    r2 = dv(ce2x * ce2x, cxx2 * ve2)
    lm = n2 * r2
    ok = (F.col("n") > 3) & (cxx2 > 0) & (ve2 > 0)
    return pass2.select(
        *gcols,
        "n",
        F.when(ok, F.round(lm, 6)).alias("lm_stat"),
        F.when(ok, lm > 3.841459).alias("reject_5pct"),
    )


def durbin_watson(
    df: DataFrame,
    y_col: str,
    x_col: str,
    order_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Durbin-Watson first-order autocorrelation test on OLS
    residuals -> one row per group (group?, n, dw_stat, rho_approx).

    The quick serial-correlation gate in front of any per-series OLS
    readout: DW = Σ(e_t − e_{t−1})² / Σe², ~2 under independence,
    →0 under positive AR(1), →4 under negative; rho_approx =
    1 − DW/2. DW < ~1.5 says trend_fit's plain SEs are untrustworthy
    — use newey_west.

    Relational shape: the breusch_pagan two-pass — OLS params from
    ONE decimal-exact aggregate, broadcast back, residuals as
    fixed-order doubles, then a PARTITIONED lag window (the
    adf_test/acf posture: series-sized by contract) with both
    quadratic sums decimal(28,12)-quantized. NULLs when n < 3 or
    zero residual variance.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    gcols = [group_col] if group_col else []
    base = df.filter(
        F.col(y_col).isNotNull()
        & F.col(x_col).isNotNull()
        & F.col(order_col).isNotNull()
    ).select(
        *gcols,
        F.col(order_col).alias("t"),
        F.col(x_col).cast("decimal(18,6)").alias("x"),
        F.col(y_col).cast("decimal(18,6)").alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    sums = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    dv = F.try_divide
    nn = d("n")
    cxx = d("sxx") - dv(d("sx") * d("sx"), nn)
    cxy = d("sxy") - dv(d("sx") * d("sy"), nn)
    b = dv(cxy, cxx)
    a = dv(d("sy"), nn) - b * dv(d("sx"), nn)
    params = sums.select(
        *gcols,
        F.col("n"),
        a.cast("decimal(18,9)").cast("double").alias("a"),
        b.cast("decimal(18,9)").cast("double").alias("b"),
    )
    if gcols:
        joined = base.join(F.broadcast(params), gcols)
        w = Window.partitionBy(*gcols).orderBy("t")
    else:
        joined = base.crossJoin(F.broadcast(params))
        w = Window.partitionBy(F.lit(1)).orderBy("t")
    e = (
        F.col("y").cast("double")
        - F.col("a")
        - F.col("b") * F.col("x").cast("double")
    )
    staged = joined.select(
        *gcols, F.col("n"), F.col("t"), e.alias("e")
    ).withColumn("e1", F.lag("e").over(w))
    q28 = lambda c: c.cast("decimal(28,12)")  # noqa: E731
    agg = staged.groupBy(*gcols).agg(
        F.max("n").alias("n"),
        F.sum(q28(F.col("e") * F.col("e"))).alias("see"),
        F.sum(
            q28(
                (F.col("e") - F.col("e1")) * (F.col("e") - F.col("e1"))
            )
        ).alias("sdd"),
    )
    dw = dv(F.col("sdd").cast("double"), F.col("see").cast("double"))
    ok = (F.col("n") > 2) & (F.col("see").cast("double") > 0)
    zero = F.lit(0.0)
    return agg.select(
        *gcols,
        "n",
        F.when(ok, F.round(dw, 6)).alias("dw_stat"),
        F.when(ok, F.round(1.0 - dw / 2.0, 6) + zero).alias(
            "rho_approx"
        ),
    )


def hurst_exponent(
    df: DataFrame,
    value_col: str = "value",
    order_col: str = "date",
    group_col: str = "dataset",
    max_level: int = 6,
) -> DataFrame:
    """Hurst exponent by the aggregated-variance method -> one row
    per series (group, n, levels_used, slope, hurst).

    The long-memory diagnostic completing the stationarity pair
    (adf_test: unit root; kpss_test: level stationarity): H ~ 0.5 is
    short-memory noise, H > 0.5 persistent long-range dependence
    (shocks echo — vol clustering, demand persistence), H < 0.5
    anti-persistent mean reversion. Input should be INCREMENTS /
    returns, not levels (a random walk's levels trivially read
    H ~ 1). Method: block the series at sizes s = 2^0..2^max_level,
    variance of block means scales as s^(2H-2); H = 1 + slope/2 from
    the ln var vs ln s regression.

    Relational shape: one PARTITIONED row_number (the adf posture:
    series-sized by contract), a level explode (max_level+1 copies —
    a bounded constant, not a corpus blowup), one (g, level, block)
    decimal collapse keeping only COMPLETE blocks, one (g, level)
    moment aggregate (block means quantized decimal(28,12)), then a
    fixed-level-order OLS fold over <= max_level+1 points per group
    (the anova_oneway list-fold rule). ln goes through the
    decimal(18,9) libm quantizer on both engines. NULL when fewer
    than 3 usable levels (need a line, not a point).
    """
    if not 1 <= max_level <= 12:
        raise ValueError(f"max_level must be in 1..12, got {max_level}")
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy(group_col).orderBy(order_col)
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("decimal(18,6)").alias("y"),
        (F.row_number().over(w) - 1).alias("rn"),
    )
    lev = base.select(
        "g",
        "y",
        "rn",
        F.explode(
            F.sequence(F.lit(0), F.lit(max_level))
        ).alias("lvl"),
    ).withColumn(
        "blk",
        (F.col("rn") / F.expr("shiftleft(1, lvl)")).cast("long"),
    )
    per_blk = lev.groupBy("g", "lvl", "blk").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.col("y").cast("decimal(38,12)")).alias("bs"),
    ).filter(F.col("cnt") == F.expr("shiftleft(1, lvl)"))
    s_d = F.expr("shiftleft(1, lvl)").cast("double")
    m = F.col("bs").cast("double") / s_d
    q28 = lambda c: c.cast("decimal(28,12)")  # noqa: E731
    per_lvl = per_blk.groupBy("g", "lvl").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum(q28(m)).alias("sm"),
        F.sum(q28(m * m)).alias("smm"),
    )
    nb = F.col("nb").cast("double")
    var = F.try_divide(F.col("smm").cast("double"), nb) - (
        F.try_divide(F.col("sm").cast("double"), nb)
        * F.try_divide(F.col("sm").cast("double"), nb)
    )
    q9d = lambda c: c.cast("decimal(18,9)").cast("double")  # noqa: E731
    pts = per_lvl.withColumn("var", var).filter(
        (F.col("nb") > 1) & (F.col("var") > 0)
    ).select(
        "g",
        "lvl",
        "nb",
        q9d(
            F.log(F.expr("shiftleft(1, lvl)").cast("double"))
        ).alias("lx"),
        q9d(F.log(F.col("var"))).alias("ly"),
    )
    folded = pts.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("lvl"),
                    F.col("lx"),
                    F.col("ly"),
                )
            )
        ).alias("ps"),
    )
    zero = F.lit(0.0)
    fold = lambda expr: F.aggregate(  # noqa: E731
        F.col("ps"), zero, lambda acc, p: acc + expr(p)
    )
    sx = fold(lambda p: p["lx"])
    sy = fold(lambda p: p["ly"])
    sxy = fold(lambda p: p["lx"] * p["ly"])
    sxx = fold(lambda p: p["lx"] * p["lx"])
    k_d = F.col("k").cast("double")
    slope = F.try_divide(
        k_d * sxy - sx * sy, k_d * sxx - sx * sx
    )
    n_tot = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    out = folded.join(n_tot, "g")
    ok = F.col("k") >= 3
    return out.select(
        F.col("g").alias("dataset"),
        "n",
        F.col("k").alias("levels_used"),
        F.when(ok, F.round(slope, 6) + zero).alias("slope"),
        F.when(ok, F.round(1.0 + slope / 2.0, 6) + zero).alias(
            "hurst"
        ),
    )


def huber_regression(
    df: DataFrame,
    y_col: str,
    x_col: str,
    group_col: str | None = None,
    delta: float = 1.345,
    rounds: int = 3,
) -> DataFrame:
    """Huber robust simple regression -> one row per group
    (group?, n, intercept, slope, scale_mad, n_downweighted).

    Between trend_fit (OLS — one wild revision wrecks the slope) and
    theil_sen (median slope — robust but pairwise-quadratic per
    series), Huber IRLS is the standard middle road: quadratic loss
    near zero, linear in the tails, 95% Gaussian efficiency at
    delta = 1.345. Residual scale is re-estimated each round by the
    normalized MAD (1.4826·median|e|, the robust_zscore constant);
    weights w = min(1, delta·s/|e|); refit by weighted least
    squares. n_downweighted counts |e| > delta·s at the final fit —
    the influence audit.

    Relational shape: an OLS seed plus ``rounds`` bounded IRLS
    rounds, each TWO fact passes — an exact-percentile MAD (the
    certified quantile channel) and one weighted normal-equation
    aggregate with every term decimal(28,12)-quantized — with the
    (a, b, s) params re-entering as a decimal(18,9)-quantized
    groups-sized broadcast relation (the breusch_pagan two-pass
    pattern, per-group aware; zero driver collects). NULLs on
    degenerate variance / n < 3; zero-MAD groups (over half the
    residuals identical) fall back to unit weights, documented OLS
    behavior.
    """
    if rounds < 1 or rounds > 8:
        raise ValueError(f"rounds must be in 1..8, got {rounds}")
    if delta <= 0:
        raise ValueError(f"delta must be > 0, got {delta}")
    gcols = [group_col] if group_col else []
    base = df.filter(
        F.col(y_col).isNotNull() & F.col(x_col).isNotNull()
    ).select(
        *gcols,
        F.col(x_col).cast("decimal(18,6)").alias("x"),
        F.col(y_col).cast("decimal(18,6)").alias("y"),
    ).localCheckpoint(eager=True)
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    q28 = lambda c: c.cast("decimal(28,12)")  # noqa: E731
    q9 = lambda c: c.cast("decimal(18,9)").cast("double")  # noqa: E731
    dv = F.try_divide
    d = lambda c: F.col(c).cast("double")  # noqa: E731

    def _join(params):
        if gcols:
            return base.join(F.broadcast(params), gcols)
        return base.crossJoin(F.broadcast(params))

    # OLS seed
    sums = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
    )
    nn = d("n")
    cxx = d("sxx") - dv(d("sx") * d("sx"), nn)
    cxy = d("sxy") - dv(d("sx") * d("sy"), nn)
    b = dv(cxy, cxx)
    a = dv(d("sy"), nn) - b * dv(d("sx"), nn)
    params = sums.select(
        *gcols, F.col("n"), q9(a).alias("a"), q9(b).alias("b")
    )
    dl = float(delta)
    for _ in range(rounds):
        joined = _join(params)
        e = (
            F.col("y").cast("double")
            - F.col("a")
            - F.col("b") * F.col("x").cast("double")
        )
        # normalized MAD through the certified percentile channel
        mads = joined.groupBy(*gcols).agg(
            q9(
                F.percentile(F.abs(e), 0.5) * F.lit(1.4826)
            ).alias("s"),
            F.max("n").alias("n"),
            F.max("a").alias("a"),
            F.max("b").alias("b"),
        )
        j2 = _join(
            mads.select(*gcols, "n", "a", "b", "s")
        )
        e2 = (
            F.col("y").cast("double")
            - F.col("a")
            - F.col("b") * F.col("x").cast("double")
        )
        w = F.when(
            (F.col("s") > 0) & (F.abs(e2) > F.lit(dl) * F.col("s")),
            dv(F.lit(dl) * F.col("s"), F.abs(e2)),
        ).otherwise(F.lit(1.0))
        xd = F.col("x").cast("double")
        yd = F.col("y").cast("double")
        wsums = j2.groupBy(*gcols).agg(
            F.max("n").alias("n"),
            F.max("s").alias("s"),
            F.sum(q28(w)).alias("sw"),
            F.sum(q28(w * xd)).alias("swx"),
            F.sum(q28(w * yd)).alias("swy"),
            F.sum(q28((w * xd) * xd)).alias("swxx"),
            F.sum(q28((w * xd) * yd)).alias("swxy"),
            F.sum(
                F.when(
                    (F.col("s") > 0)
                    & (F.abs(e2) > F.lit(dl) * F.col("s")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("ndw"),
        )
        sw = d("sw")
        cwxx = d("swxx") - dv(d("swx") * d("swx"), sw)
        cwxy = d("swxy") - dv(d("swx") * d("swy"), sw)
        nb = dv(cwxy, cwxx)
        na = dv(d("swy"), sw) - nb * dv(d("swx"), sw)
        params = wsums.select(
            *gcols,
            F.col("n"),
            q9(na).alias("a"),
            q9(nb).alias("b"),
            F.col("s"),
            F.col("ndw"),
        )
    ok = (F.col("n") > 2) & F.col("a").isNotNull()
    zero = F.lit(0.0)
    return params.select(
        *gcols,
        "n",
        F.when(ok, F.round(F.col("a"), 6) + zero).alias("intercept"),
        F.when(ok, F.round(F.col("b"), 6) + zero).alias("slope"),
        F.when(ok, F.round(F.col("s"), 6)).alias("scale_mad"),
        F.col("ndw").alias("n_downweighted"),
    )


def quantile_regression(
    df: DataFrame,
    y_col: str,
    x_col: str,
    tau: float = 0.5,
    group_col: str | None = None,
    rounds: int = 6,
    eps: float = 1e-3,
) -> DataFrame:
    """Quantile (pinball-loss) simple regression -> one row per group
    (group?, n, intercept, slope, pinball_loss, n_below).

    Fits the conditional tau-quantile line by iteratively reweighted
    least squares (Schlossmacher's IRLS for asymmetric L1): the
    pinball loss rho_tau(e) = e*(tau - 1[e<0]) is majorized by the
    weighted quadratic w*e^2 with w = |tau - 1[e<0]| / max(|e|, eps),
    so each round is ONE weighted normal-equation aggregate. ``eps``
    is the Huberization width of the pinball vertex: as eps -> 0 the
    fit approaches exact quantile regression but the IRLS weights
    become 1/|e|-sharp and the iteration oscillates between
    interpolating point pairs (measured: eps=1e-6 drifts ~4e-3 from a
    float replay; eps=1e-3 agrees to ~1e-5). Keep eps ~ 1e-3 of the
    response scale. tau=0.5
    is median (LAD) regression; tau=0.9 bounds the upper envelope a
    capacity planner cares about. The reference's export layer trends
    series with plain OLS (documentation/economic_indicators.md:71);
    this is the distribution-tail member of the trend family
    (trend_fit OLS / theil_sen / huber_regression).

    Relational shape: an OLS seed, ONE tau-quantile residual shift
    through the certified percentile channel (tail taus would
    otherwise need ~30 rounds to walk there), plus ``rounds`` bounded
    IRLS rounds,
    each ONE fact pass with every sum term decimal(28,12)-quantized
    and the (a, b) params re-entering as a decimal(18,9)-quantized
    groups-sized broadcast relation (huber_regression's pattern minus
    the MAD pass; zero driver collects). The final pass also folds the
    mean pinball loss (fit quality, decimal-quantized) and n_below
    (share of residuals below the line ~ tau, the calibration audit).
    NULLs on degenerate x-variance / n < 3.
    """
    if rounds < 1 or rounds > 10:
        raise ValueError(f"rounds must be in 1..10, got {rounds}")
    if not 0.0 < tau < 1.0:
        raise ValueError(f"tau must be in (0,1), got {tau}")
    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    gcols = [group_col] if group_col else []
    base = df.filter(
        F.col(y_col).isNotNull() & F.col(x_col).isNotNull()
    ).select(
        *gcols,
        F.col(x_col).cast("decimal(18,6)").alias("x"),
        F.col(y_col).cast("decimal(18,6)").alias("y"),
    ).localCheckpoint(eager=True)
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    q28 = lambda c: c.cast("decimal(28,12)")  # noqa: E731
    q9 = lambda c: c.cast("decimal(18,9)").cast("double")  # noqa: E731
    dv = F.try_divide
    d = lambda c: F.col(c).cast("double")  # noqa: E731

    def _join(params):
        if gcols:
            return base.join(F.broadcast(params), gcols)
        return base.crossJoin(F.broadcast(params))

    # OLS seed (identical to huber_regression's)
    sums = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
    )
    nn = d("n")
    cxx = d("sxx") - dv(d("sx") * d("sx"), nn)
    cxy = d("sxy") - dv(d("sx") * d("sy"), nn)
    b = dv(cxy, cxx)
    a = dv(d("sy"), nn) - b * dv(d("sx"), nn)
    params = sums.select(
        *gcols, F.col("n"), q9(a).alias("a"), q9(b).alias("b")
    )
    tl = F.lit(float(tau))
    el = F.lit(float(eps))
    # seed shift: raise the OLS line by the tau-quantile of its
    # residuals (ONE pass through the certified percentile channel)
    # so extreme taus start at the right height — measured: without
    # it tau=0.1 needs ~30 IRLS rounds, with it 6
    j0 = _join(params)
    e0 = (
        F.col("y").cast("double")
        - F.col("a")
        - F.col("b") * F.col("x").cast("double")
    )
    shifted = j0.groupBy(*gcols).agg(
        F.max("n").alias("n"),
        F.max("a").alias("a"),
        F.max("b").alias("b"),
        F.percentile(e0, float(tau)).alias("dq"),
    )
    params = shifted.select(
        *gcols,
        F.col("n"),
        q9(F.col("a") + F.col("dq")).alias("a"),
        F.col("b"),
    )
    for _ in range(rounds):
        joined = _join(params)
        e = (
            F.col("y").cast("double")
            - F.col("a")
            - F.col("b") * F.col("x").cast("double")
        )
        # asymmetric IRLS weight: |tau - 1[e<0]| / max(|e|, eps)
        w = dv(
            F.when(e < 0, F.lit(1.0) - tl).otherwise(tl),
            F.greatest(F.abs(e), el),
        )
        xd = F.col("x").cast("double")
        yd = F.col("y").cast("double")
        wsums = joined.groupBy(*gcols).agg(
            F.max("n").alias("n"),
            F.sum(q28(w)).alias("sw"),
            F.sum(q28(w * xd)).alias("swx"),
            F.sum(q28(w * yd)).alias("swy"),
            F.sum(q28((w * xd) * xd)).alias("swxx"),
            F.sum(q28((w * xd) * yd)).alias("swxy"),
        )
        sw = d("sw")
        cwxx = d("swxx") - dv(d("swx") * d("swx"), sw)
        cwxy = d("swxy") - dv(d("swx") * d("swy"), sw)
        nb2 = dv(cwxy, cwxx)
        na = dv(d("swy"), sw) - nb2 * dv(d("swx"), sw)
        params = wsums.select(
            *gcols,
            F.col("n"),
            q9(na).alias("a"),
            q9(nb2).alias("b"),
        )
    # final audit pass: mean pinball loss + below-line count AT the
    # final params (not the penultimate round's)
    fj = _join(params)
    ef = (
        F.col("y").cast("double")
        - F.col("a")
        - F.col("b") * F.col("x").cast("double")
    )
    pin = F.when(ef >= 0, tl * ef).otherwise((tl - F.lit(1.0)) * ef)
    params = fj.groupBy(*gcols).agg(
        F.max("n").alias("n"),
        F.max("a").alias("a"),
        F.max("b").alias("b"),
        q9(dv(F.sum(q28(pin)).cast("double"), F.max("n").cast("double")))
        .alias("pl"),
        F.sum(F.when(ef < 0, 1).otherwise(0)).cast("long").alias("nb"),
    )
    ok = (F.col("n") > 2) & F.col("a").isNotNull()
    zero = F.lit(0.0)
    return params.select(
        *gcols,
        "n",
        F.when(ok, F.round(F.col("a"), 6) + zero).alias("intercept"),
        F.when(ok, F.round(F.col("b"), 6) + zero).alias("slope"),
        F.when(ok, F.round(F.col("pl"), 6) + zero).alias(
            "pinball_loss"
        ),
        F.col("nb").alias("n_below"),
    )


_CHI2_CRIT_5PCT = {
    1: 3.841459,
    2: 5.991465,
    3: 7.814728,
    4: 9.487729,
}


def arch_fragments(lags: int) -> dict:
    """Shared Spark/DuckDB SQL fragments for Engle's ARCH LM test —
    the granger_fragments discipline: one aggregate over a relation
    with columns u (squared residual, decimal(18,6)) and z1..zq (its
    lags, decimal(18,6)), then a named fixed-order double sequence
    (Gauss solve of the auxiliary regression + RSS/TSS + LM) both
    engines execute verbatim.

    Returns {aggs, steps, lm, r2, ok, m}.
    """
    q = lags
    m = q + 1
    zs = list(range(1, q + 1))
    aggs = [
        "CAST(COUNT(*) AS BIGINT) AS n",
        "CAST(SUM(CAST(u AS DECIMAL(38,12))) AS DOUBLE) AS su",
        "CAST(SUM(CAST(u * u AS DECIMAL(38,12))) AS DOUBLE) AS suu",
    ]
    for i in zs:
        aggs.append(
            f"CAST(SUM(CAST(z{i} AS DECIMAL(38,12))) AS DOUBLE) AS s_{i}"
        )
        aggs.append(
            f"CAST(SUM(CAST(z{i} * u AS DECIMAL(38,12))) AS DOUBLE)"
            f" AS t_{i}"
        )
    for i in zs:
        for j in zs:
            if j >= i:
                aggs.append(
                    f"CAST(SUM(CAST(z{i} * z{j} AS DECIMAL(38,12)))"
                    f" AS DOUBLE) AS c_{i}_{j}"
                )
    steps = [("nd", "CAST(n AS DOUBLE)")]
    a_u = {(0, 0): "nd"}
    for j in zs:
        a_u[(0, j)] = f"s_{j}"
    for i in zs:
        for j in zs:
            if j >= i:
                a_u[(i, j)] = f"c_{i}_{j}"
    b_u = ["su"] + [f"t_{i}" for i in zs]
    su_steps, betas, diag = _gauss_steps(m, a_u, b_u, "a")
    steps += su_steps
    rss = "suu"
    for bn, orig in zip(betas, b_u):
        rss = f"({rss} - {bn} * {orig})"
    steps.append(("a_rss", rss))
    steps.append(
        ("a_tss", "(suu - CASE WHEN nd = 0 THEN NULL ELSE su * su / nd END)")
    )
    steps.append(
        (
            "a_r2",
            "CASE WHEN a_tss = 0 THEN NULL"
            " ELSE 1.0 - a_rss / a_tss END",
        )
    )
    steps.append(("a_lm", "nd * a_r2"))
    pivots = " AND ".join(f"{d} > 0" for d in dict.fromkeys(diag))
    ok = f"n > {m} AND a_tss > 0 AND {pivots}"
    return {
        "aggs": aggs,
        "steps": steps,
        "lm": "a_lm",
        "r2": "a_r2",
        "ok": ok,
        "m": m,
    }


def arch_test(
    df: DataFrame,
    value_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
    lags: int = 1,
) -> DataFrame:
    """Engle's ARCH LM test per series -> one row per group
    (group, n, lm_stat, r2, reject_5pct).

    "Is today's volatility predicted by yesterday's?" (Engle 1982) —
    the standard conditional-heteroskedasticity screen an economist
    runs before trusting homoskedastic standard errors on a series.
    Residuals from the constant-mean model e_t = v_t − v̄ (the
    classic presentation; run it on your own model's residuals for a
    full mean equation), then the auxiliary regression
    e²_t ~ a + Σ b_i·e²_(t−i); LM = n·R² ~ chi2(lags) under H0.

    The granger/adf discipline verbatim: ONE groups-sized mean
    relation joined back broadcast (decimal-exact sum / n — never a
    float-order-dependent AVG), squared residuals quantized
    decimal(18,6), per-group PARTITIONED lag windows, one hash
    aggregate of exact normal-equation sums, and the
    arch_fragments fixed-order double sequence both engines share.
    reject_5pct compares LM to the literal chi2 5% critical value
    (3.841459 / 5.991465 / 7.814728 / 9.487729 for lags 1..4).
    NULLs on degenerate variance / n <= lags + 1.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if lags < 1 or lags > 4:
        raise ValueError(f"lags must be in 1..4, got {lags}")
    frag = arch_fragments(lags)
    crit = _CHI2_CRIT_5PCT[lags]

    # floor-based half-up quantize (pure double chain) BEFORE the
    # decimal cast: money-scale inputs land exactly on .xxxxxx50
    # midpoints where Spark's string-HALF_UP and DuckDB's binary
    # rounding disagree (ORACLE_PARITY "round() is not portable");
    # after the floor the double is ~nearest a 1e-6 grid point and
    # both engines cast it to the SAME decimal. Domain: |x| < ~1e9.
    def _q6(c):
        return (
            F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
        ).cast("decimal(18,6)")

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        _q6(F.col(value_col).cast("double")).alias("v"),
    )
    means = base.groupBy("g").agg(
        F.sum(F.col("v").cast("decimal(38,12)"))
        .cast("double")
        .alias("sv"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )
    with_mean = base.join(F.broadcast(means), "g").withColumn(
        "u",
        _q6(
            (
                F.col("v").cast("double")
                - F.col("sv") / F.col("nv").cast("double")
            )
            * (
                F.col("v").cast("double")
                - F.col("sv") / F.col("nv").cast("double")
            )
        ),
    )
    w = Window.partitionBy("g").orderBy("o")
    sel = [F.col("g"), F.col("u")]
    for i in range(1, lags + 1):
        sel.append(F.lag(F.col("u"), i).over(w).alias(f"z{i}"))
    lagged = with_mean.select(*sel)
    keep = F.lit(True)
    for i in range(1, lags + 1):
        keep = keep & F.col(f"z{i}").isNotNull()
    lagged = lagged.filter(keep)
    cur = lagged.groupBy("g").agg(*[F.expr(a) for a in frag["aggs"]])
    for name, e in frag["steps"]:
        cur = cur.withColumn(name, F.expr(e))
    ok = F.expr(frag["ok"])
    return cur.select(
        F.col("g").alias(group_col),
        "n",
        F.when(ok, F.round(F.expr(frag["lm"]), 6)).alias("lm_stat"),
        F.when(ok, F.round(F.expr(frag["r2"]), 6)).alias("r2"),
        F.when(ok, F.expr(frag["lm"]) > F.lit(crit)).alias(
            "reject_5pct"
        ),
    )


def ar_fragments(order: int) -> dict:
    """Shared Spark/DuckDB fragments for the Yule-Walker AR(p) fit —
    aggregates over a relation with columns z0 (x_t, decimal(18,6))
    and z1..zp (x_{t-k} lags), then a named fixed-order double
    sequence: autocovariances c_0..c_p from exact sums, the p x p
    Toeplitz solve via the unrolled SPD Gauss elimination, and the
    innovation variance. Returns {aggs, steps, phis, sigma2, ok}.
    """
    p = order
    aggs = [
        "CAST(COUNT(*) AS BIGINT) AS n",
        "CAST(SUM(CAST(z0 AS DECIMAL(38,12))) AS DOUBLE) AS sx",
        "CAST(SUM(CAST(z0 * z0 AS DECIMAL(38,12))) AS DOUBLE) AS sxx",
    ]
    for k in range(1, p + 1):
        aggs += [
            f"CAST(SUM(CASE WHEN z{k} IS NOT NULL THEN"
            f" CAST(z0 * z{k} AS DECIMAL(38,12)) END) AS DOUBLE)"
            f" AS sp_{k}",
            f"CAST(SUM(CASE WHEN z{k} IS NOT NULL THEN"
            f" CAST(z0 AS DECIMAL(38,12)) END) AS DOUBLE) AS sa_{k}",
            f"CAST(SUM(CAST(z{k} AS DECIMAL(38,12))) AS DOUBLE)"
            f" AS sb_{k}",
            f"CAST(COUNT(z{k}) AS BIGINT) AS nk_{k}",
        ]
    steps = [
        ("nd", "CAST(n AS DOUBLE)"),
        ("xm", "CASE WHEN nd = 0 THEN NULL ELSE sx / nd END"),
        (
            "cc_0",
            "CASE WHEN nd = 0 THEN NULL ELSE"
            " (sxx - 2.0 * xm * sx + nd * xm * xm) / nd END",
        ),
    ]
    for k in range(1, p + 1):
        steps.append(
            (
                f"cc_{k}",
                f"CASE WHEN nd = 0 THEN NULL ELSE"
                f" (sp_{k} - xm * (sa_{k} + sb_{k})"
                f" + CAST(nk_{k} AS DOUBLE) * xm * xm) / nd END",
            )
        )
    a = {}
    for i in range(p):
        for j in range(i, p):
            a[(i, j)] = f"cc_{j - i}"
    b = [f"cc_{k}" for k in range(1, p + 1)]
    g_steps, phis, diag = _gauss_steps(p, a, b, "w")
    steps += g_steps
    s2 = "cc_0"
    for k, ph in enumerate(phis, start=1):
        s2 = f"({s2} - {ph} * cc_{k})"
    steps.append(("w_s2", s2))
    pivots = " AND ".join(f"{d} > 0" for d in dict.fromkeys(diag))
    ok = f"n > {p + 1} AND cc_0 > 0 AND {pivots}"
    return {
        "aggs": aggs,
        "steps": steps,
        "phis": phis,
        "sigma2": "w_s2",
        "ok": ok,
    }


def ar_fit(
    df: DataFrame,
    value_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
    order: int = 2,
) -> DataFrame:
    """Yule-Walker AR(p) fit per series -> one row per group
    (group, n, phi_1..phi_p, sigma2, r2).

    The classical autoregression estimate: autocovariances
    c_k = (1/n) sum (x_t - xbar)(x_{t-k} - xbar) from the biased
    (positive-definite) estimator, then the Toeplitz system
    R phi = r. Completes the series-diagnostics family (acf/pacf
    describe, adf gates, ar_fit parameterizes) and feeds residual
    screens (ljung_box, arch_test) a mean equation. r2 = 1 -
    sigma2/c0, the in-sample one-step explanatory share.

    Discipline: floor-quantized decimal(18,6) inputs (portable at
    money midpoints), per-group PARTITIONED lag windows, ONE hash
    aggregate of exact normal-equation sums (per-lag alignment via
    conditional sums, never a second scan), ar_fragments fixed-order
    doubles both engines execute verbatim. NULLs on constant series /
    n <= p + 1 / non-PD sample autocovariance.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if order < 1 or order > 4:
        raise ValueError(f"order must be in 1..4, got {order}")
    frag = ar_fragments(order)

    def _q6(c):
        return (
            F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
        ).cast("decimal(18,6)")

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        _q6(F.col(value_col).cast("double")).alias("z0"),
    )
    w = Window.partitionBy("g").orderBy("o")
    sel = [F.col("g"), F.col("z0")]
    for k in range(1, order + 1):
        sel.append(F.lag(F.col("z0"), k).over(w).alias(f"z{k}"))
    lagged = base.select(*sel)
    cur = lagged.groupBy("g").agg(*[F.expr(a) for a in frag["aggs"]])
    for name, e in frag["steps"]:
        cur = cur.withColumn(name, F.expr(e))
    ok = F.expr(frag["ok"])
    out = [F.col("g").alias(group_col), "n"]
    for k, ph in enumerate(frag["phis"], start=1):
        out.append(
            F.when(ok, F.round(F.expr(ph), 6)).alias(f"phi_{k}")
        )
    out.append(
        F.when(ok, F.round(F.expr(frag["sigma2"]), 6)).alias("sigma2")
    )
    out.append(
        F.when(
            ok,
            F.round(
                F.lit(1.0) - F.expr(frag["sigma2"]) / F.col("cc_0"), 6
            ),
        ).alias("r2")
    )
    return cur.select(*out)


def periodogram(
    df: DataFrame,
    value_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
    max_k: int = 12,
    assume_indexed: bool = False,
) -> DataFrame:
    """Schuster periodogram at the first ``max_k`` Fourier
    frequencies -> (group, k, n, period, power).

    The spectral view of a series: power at harmonic k concentrates
    when the series cycles every n/k observations — the direct test
    for "is there an annual cycle" that seasonal_strength infers from
    autocorrelations. I(f_k) = (1/n)[(sum x_t cos(2*pi*k*t/n))^2 +
    (sum x_t sin(2*pi*k*t/n))^2] over the demeaned series.

    Engine-parity discipline: t and k stay INTEGERS and the angle is
    2*pi*((k*t) mod n)/n — the modulus keeps libm's argument in
    [0, 2*pi) so neither engine pays large-argument reduction, and
    pi enters as each engine's correctly-rounded double (identical).
    cos/sin terms are quantized decimal(28,12) before the sum (the
    ln/entropy channel). The mean is the decimal-exact sum / n.
    Shape: one rank window per group (order_col must be unique per
    group), a bounded k-grid explode (rows = n * max_k), ONE hash
    aggregate. NULL power when n < 2*max_k (frequencies above
    Nyquist).

    ``assume_indexed``: the rank window sorts each series in ONE
    partition — measured 65 s of the 2M-point probe. When order_col
    is ALREADY a dense 0-based integer index per group (the usual
    contract for a series this long), pass True: t = order_col
    directly, n from a per-group aggregate, zero windows anywhere.
    """
    import math  # noqa: PLC0415

    from pyspark.sql import Window  # noqa: PLC0415

    if max_k < 1 or max_k > 64:
        raise ValueError(f"max_k must be in 1..64, got {max_k}")

    # floor-based half-up quantize (portable at money midpoints —
    # the arch_test note)
    def _q6(c):
        return (
            F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
        ).cast("decimal(18,6)")

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        _q6(F.col(value_col).cast("double")).alias("v"),
    )
    if assume_indexed:
        counts = base.groupBy("g").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        ranked = base.join(counts, "g").select(
            "g", "v", F.col("o").cast("long").alias("t"), "n"
        )
    else:
        w = Window.partitionBy("g").orderBy("o")
        ranked = base.select(
            "g",
            "v",
            (F.row_number().over(w) - F.lit(1)).cast("long").alias("t"),
            F.count(F.lit(1))
            .over(Window.partitionBy("g"))
            .cast("long")
            .alias("n"),
        )
    means = ranked.groupBy("g").agg(
        F.sum(F.col("v").cast("decimal(38,12)"))
        .cast("double")
        .alias("sv"),
        F.max("n").alias("nn"),
    )
    centered = ranked.join(F.broadcast(means), "g").select(
        "g",
        "t",
        "n",
        (
            F.col("v").cast("double")
            - F.col("sv") / F.col("nn").cast("double")
        ).alias("x"),
    )
    grid = centered.select(
        "g",
        "t",
        "n",
        "x",
        F.explode(
            F.sequence(F.lit(1), F.lit(int(max_k)))
        ).alias("k0"),
    ).withColumn("k", F.col("k0").cast("long")).drop("k0")
    two_pi = F.lit(2.0) * F.lit(math.pi)
    ang = two_pi * (
        ((F.col("k") * F.col("t")) % F.col("n")).cast("double")
        / F.col("n").cast("double")
    )
    q28 = lambda c: c.cast("decimal(28,12)")  # noqa: E731
    sums = grid.groupBy("g", "k").agg(
        F.max("n").alias("n"),
        F.sum(q28(F.col("x") * F.cos(ang))).cast("double").alias("sc"),
        F.sum(q28(F.col("x") * F.sin(ang))).cast("double").alias("ss"),
    )
    nd = F.col("n").cast("double")
    power = F.try_divide(
        F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss"), nd
    )
    ok = F.col("n") >= F.lit(2 * int(max_k))
    return sums.select(
        F.col("g").alias(group_col),
        "k",
        "n",
        F.round(F.try_divide(nd, F.col("k").cast("double")), 6).alias(
            "period"
        ),
        F.when(ok, F.round(power, 6)).alias("power"),
    )


def binseg_changepoints(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    depth: int = 2,
    min_gain: float = 3.0,
    min_size: int = 5,
) -> DataFrame:
    """Binary-segmentation level-shift changepoints per series ->
    (group, round, order_at, cstat) — one row per ACCEPTED split.

    Where cusum_changepoint raises a single alarm, this finds
    MULTIPLE mean shifts: each round scans every active segment for
    the split tau maximizing the standardized two-sample CUSUM

        C_tau = (mean_left - mean_right) * sqrt(tau*(n-tau)/n)

    accepts it when |C_tau| >= min_gain (raw value units — calibrate
    to ~z * sigma of the series noise), then recurses into both
    halves up to ``depth`` rounds (Scott & Knott 1974 / standard
    binseg). order_at is the order key of the LAST point of the left
    segment.

    Determinism & parity: prefix sums of floor-quantized
    decimal(18,6) values are exact window sums; C is a fixed double
    chain; the argmax is "max of the decimal(18,9)-quantized |C|,
    then the SMALLEST tau among maximizers" — two portable
    aggregates, no engine-specific arg_max tie semantics anywhere.
    Splits respect ``min_size`` on both halves.

    Shape per round: one sort per (series, segment) partition key
    (the same single shuffle at scale — segment ids ride the series
    key), one segment aggregate, one broadcast-sized relabel join.
    Rounds are bounded by ``depth`` (<= 4).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if depth < 1 or depth > 4:
        raise ValueError(f"depth must be in 1..4, got {depth}")
    if min_size < 2:
        raise ValueError(f"min_size must be >= 2, got {min_size}")
    if min_gain <= 0:
        raise ValueError(f"min_gain must be > 0, got {min_gain}")

    def _q6(c):
        return (
            F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
        ).cast("decimal(18,6)")

    q9 = lambda c: c.cast("decimal(18,9)").cast("double")  # noqa: E731
    dv = F.try_divide
    work = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        _q6(F.col(value_col).cast("double")).alias("v"),
        F.lit(0).cast("long").alias("seg"),
    ).localCheckpoint(eager=True)
    gain = F.lit(float(min_gain))
    msize = int(min_size)
    splits = None
    for rnd in range(1, depth + 1):
        w = Window.partitionBy("g", "seg").orderBy("o")
        wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wall = Window.partitionBy("g", "seg")
        ranked = work.select(
            "g",
            "seg",
            "o",
            "v",
            F.row_number().over(w).cast("long").alias("t"),
            F.count(F.lit(1)).over(wall).cast("long").alias("n"),
            F.sum(F.col("v").cast("decimal(38,12)"))
            .over(wcum)
            .cast("double")
            .alias("p"),
            F.sum(F.col("v").cast("decimal(38,12)"))
            .over(wall)
            .cast("double")
            .alias("s"),
        )
        td = F.col("t").cast("double")
        nd = F.col("n").cast("double")
        c = (
            dv(F.col("p"), td)
            - dv(F.col("s") - F.col("p"), nd - td)
        ) * F.sqrt(dv(td * (nd - td), nd))
        cand = ranked.filter(
            (F.col("t") >= F.lit(msize))
            & (F.col("n") - F.col("t") >= F.lit(msize))
        ).select(
            "g", "seg", "o", "t", q9(F.abs(c)).alias("cq")
        )
        mx = cand.groupBy("g", "seg").agg(F.max("cq").alias("mx"))
        best = (
            cand.join(mx, ["g", "seg"])
            .filter((F.col("cq") == F.col("mx")) & (F.col("mx") >= gain))
            .groupBy("g", "seg")
            .agg(
                F.min("t").alias("tau"),
                F.max("mx").alias("cstat"),
            )
        )
        # order key at the split = the o where t == tau
        split_rows = (
            cand.join(best, ["g", "seg"])
            .filter(F.col("t") == F.col("tau"))
            .select(
                "g",
                "seg",
                F.lit(rnd).cast("long").alias("round"),
                F.col("o").alias("order_at"),
                F.round(F.col("cstat"), 6).alias("cstat"),
                "tau",
            )
        ).localCheckpoint(eager=True)
        splits = (
            split_rows
            if splits is None
            else splits.unionByName(split_rows)
        )
        if rnd == depth:
            break
        # relabel: accepted segments split into 2*seg / 2*seg + 1
        ranked_t = work.select("g", "seg", "o", "v").join(
            F.broadcast(
                split_rows.select("g", "seg", "tau")
            ),
            ["g", "seg"],
            "left",
        )
        w2 = Window.partitionBy("g", "seg").orderBy("o")
        work = ranked_t.select(
            "g",
            "seg",
            "o",
            "v",
            "tau",
            F.row_number().over(w2).cast("long").alias("t2"),
        ).select(
            "g",
            "o",
            "v",
            F.when(
                F.col("tau").isNotNull() & (F.col("t2") > F.col("tau")),
                F.col("seg") * 2 + 1,
            )
            .otherwise(F.col("seg") * 2)
            .alias("seg"),
        )
    return splits.select(
        F.col("g").alias(group_col), "round", "order_at", "cstat"
    ).orderBy(group_col, "round", "order_at")


def runs_test(
    df: DataFrame,
    value_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
) -> DataFrame:
    """Wald-Wolfowitz runs test per series -> one row per group
    (group, n_pos, n_neg, n_runs, z, reject_5pct).

    The sign-pattern randomness check: values are classified above /
    below the series MEDIAN (the exact percentile channel; ties-at-
    median dropped, the standard convention), runs of equal signs are
    counted, and too FEW runs (trending) or too MANY (oscillating)
    reject randomness: z = (R - mu)/sigma with mu = 2 n1 n2 / n + 1.
    Catches structure ljung_box's linear acf misses (sign-level
    dependence with zero correlation).

    Shape: one percentile pass for the median (broadcast back), one
    partitioned lag window for sign changes, one aggregate. Exact
    integer run counts; only the final z is floating point. NULLs
    when either sign class is empty.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        F.col(value_col).cast("double").alias("v"),
    )
    med = base.groupBy("g").agg(
        F.percentile(F.col("v"), 0.5).alias("md")
    )
    signed = (
        base.join(F.broadcast(med), "g")
        .filter(F.col("v") != F.col("md"))
        .select(
            "g", "o", (F.col("v") > F.col("md")).alias("s")
        )
    )
    w = Window.partitionBy("g").orderBy("o")
    runs = signed.select(
        "g",
        "s",
        F.when(
            F.lag("s").over(w).isNull()
            | (F.lag("s").over(w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.groupBy("g").agg(
        F.sum(F.when(F.col("s"), 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(~F.col("s"), 1).otherwise(0))
        .cast("long")
        .alias("n_neg"),
        F.sum("new_run").cast("long").alias("n_runs"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    dv = F.try_divide
    n1 = d("n_pos")
    n2 = d("n_neg")
    nn = n1 + n2
    mu = dv(F.lit(2.0) * n1 * n2, nn) + F.lit(1.0)
    var = dv(
        (F.lit(2.0) * n1 * n2) * (F.lit(2.0) * n1 * n2 - nn),
        (nn * nn) * (nn - F.lit(1.0)),
    )
    z = dv(d("n_runs") - mu, F.sqrt(var))
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0) & (var > 0)
    return agg.select(
        F.col("g").alias(group_col),
        "n_pos",
        "n_neg",
        "n_runs",
        F.when(ok, F.round(z, 6)).alias("z"),
        F.when(ok, F.abs(z) > F.lit(1.959964)).alias("reject_5pct"),
    )


def _gauss_steps_multi(
    m: int, a_names: dict, bs_names: list[list[str]], prefix: str
):
    """Multi-RHS variant of _gauss_steps: ONE shared elimination of
    the SPD matrix (row updates then EVERY RHS update per (k, i) —
    the exact operation order _gauss_solve_fixed replays for its
    ``bs`` list), then an independent left-nested back-substitution
    per RHS. Returns (steps, betas_per_rhs, diag). Used where several
    regressions share one design matrix (VAR: k equations, one X'X),
    so the elimination text is emitted once instead of k times.
    """

    def div(a: str, b: str) -> str:
        return f"CASE WHEN {b} = 0 THEN NULL ELSE ({a}) / {b} END"

    cur = {}
    for i in range(m):
        for j in range(m):
            cur[(i, j)] = a_names[(min(i, j), max(i, j))]
    curbs = [list(b) for b in bs_names]
    steps = []
    for k in range(m):
        for i in range(k + 1, m):
            f = f"{prefix}_f{k}_{i}"
            steps.append((f, div(cur[(i, k)], cur[(k, k)])))
            for j in range(k + 1, m):
                nn = f"{prefix}_a{k}_{i}_{j}"
                steps.append(
                    (nn, f"{cur[(i, j)]} - {f} * {cur[(k, j)]}")
                )
                cur[(i, j)] = nn
            for q, curb in enumerate(curbs):
                nb = f"{prefix}{q}_b{k}_{i}"
                steps.append((nb, f"{curb[i]} - {f} * {curb[k]}"))
                curb[i] = nb
    betas_all = []
    for q, curb in enumerate(curbs):
        betas = [None] * m
        for i in reversed(range(m)):
            expr = curb[i]
            for j in range(i + 1, m):
                expr = f"({expr} - {cur[(i, j)]} * {prefix}{q}_beta{j})"
            steps.append(
                (f"{prefix}{q}_beta{i}", div(expr, cur[(i, i)]))
            )
            betas[i] = f"{prefix}{q}_beta{i}"
        betas_all.append(betas)
    diag = [cur[(k, k)] for k in range(m)]
    return steps, betas_all, diag


def var_fragments(k: int, p: int) -> dict:
    """Shared Spark/DuckDB fragments for the VAR(p) system fit over k
    series — aggregates over a relation with columns y_1..y_k (the
    current values, decimal(18,6)) and z_1..z_{k*p} (the lag matrix,
    z_{(e-1)*p + l} = lag l of series e), then one shared unrolled
    Gauss elimination (the design matrix [1, z_1..z_q] is common to
    every equation) and per-equation back-substitutions.

    Returns {aggs, steps, betas (per equation, const first), cov
    (names keyed (e, f), 1-based, e <= f), ok, m}. Residual
    cross-moments use the normal-equation identity
    S_ef = sum(y_e y_f) - sum_a beta_e[a] * b_f[a] (the granger rss
    form) with the (e <= f) orientation pinned, so both engines fold
    the identical tree; cov_ef = S_ef / (n - m).
    """
    q = k * p
    m = q + 1
    # Decimal sums leave for double via STRING (exact decimal text ->
    # one correctly-rounded IEEE parse, identical on any engine):
    # DuckDB's direct DECIMAL(38,12)->DOUBLE cast converts the int128
    # then divides by 1e12 — TWO roundings, measured one ulp off
    # Spark's BigDecimal path on 13 of this fragment's 55 sums.
    aggs = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for e in range(1, k + 1):
        aggs.append(
            f"CAST(CAST(SUM(CAST(y_{e} AS DECIMAL(38,12))) AS STRING)"
            f" AS DOUBLE) AS sy_{e}"
        )
    for e in range(1, k + 1):
        for f_ in range(e, k + 1):
            aggs.append(
                f"CAST(CAST(SUM(CAST(y_{e} * y_{f_} AS DECIMAL(38,12)))"
                f" AS STRING) AS DOUBLE) AS syy_{e}_{f_}"
            )
    for i in range(1, q + 1):
        aggs.append(
            f"CAST(CAST(SUM(CAST(z{i} AS DECIMAL(38,12))) AS STRING)"
            f" AS DOUBLE) AS s_{i}"
        )
    for e in range(1, k + 1):
        for i in range(1, q + 1):
            aggs.append(
                f"CAST(CAST(SUM(CAST(z{i} * y_{e} AS DECIMAL(38,12)))"
                f" AS STRING) AS DOUBLE) AS t_{e}_{i}"
            )
    for i in range(1, q + 1):
        for j in range(i, q + 1):
            aggs.append(
                f"CAST(CAST(SUM(CAST(z{i} * z{j} AS DECIMAL(38,12)))"
                f" AS STRING) AS DOUBLE) AS c_{i}_{j}"
            )
    steps = [("nd", "CAST(n AS DOUBLE)")]
    a = {(0, 0): "nd"}
    for j in range(1, q + 1):
        a[(0, j)] = f"s_{j}"
    for i in range(1, q + 1):
        for j in range(i, q + 1):
            a[(i, j)] = f"c_{i}_{j}"
    bs = [
        [f"sy_{e}"] + [f"t_{e}_{i}" for i in range(1, q + 1)]
        for e in range(1, k + 1)
    ]
    gs, betas_all, diag = _gauss_steps_multi(m, a, bs, "v")
    steps += gs
    cov = {}
    for e in range(1, k + 1):
        for f_ in range(e, k + 1):
            s = f"syy_{e}_{f_}"
            for bn, orig in zip(betas_all[e - 1], bs[f_ - 1]):
                s = f"({s} - {bn} * {orig})"
            steps.append((f"v_s_{e}_{f_}", s))
            steps.append(
                (
                    f"v_cov_{e}_{f_}",
                    f"CASE WHEN (nd - {float(m)}) = 0 THEN NULL"
                    f" ELSE v_s_{e}_{f_} / (nd - {float(m)}) END",
                )
            )
            cov[(e, f_)] = f"v_cov_{e}_{f_}"
    pivots = " AND ".join(f"{d} > 0" for d in dict.fromkeys(diag))
    ok = f"n > {m + 1} AND {pivots}"
    return {
        "aggs": aggs,
        "steps": steps,
        "betas": betas_all,
        "cov": cov,
        "ok": ok,
        "m": m,
    }


def var_fit(
    df: DataFrame,
    value_cols: list[str],
    order_col: str = "date",
    group_col: str = "dataset",
    lags: int = 1,
    many_groups: bool = False,
) -> DataFrame:
    """VAR(p) system estimation per group -> one row per (group,
    equation): (group, equation, n, const, <series>_l<lag>...,
    sigma2, resid_cov_<series>...).

    The multi-equation step past granger_causality/ar_fit: every
    series is regressed on p lags of EVERY series (per-equation OLS
    is the MLE for a VAR with unrestricted covariance), giving the
    coefficient matrix macro analysis reads lead/lag structure from
    and the residual covariance that turns it into impulse responses.
    The reference's analysis layer promises exactly this multi-
    indicator view (documentation/economic_indicators.md:123
    "variable selection, seasonal decomposition, component analysis"
    over the 26-indicator table).

    Shape (the granger_fragments discipline, widened): per-group
    PARTITIONED lag windows build the shared lag matrix once; ONE
    hash aggregate collects every decimal-exact normal-equation sum
    (m = k*p + 1 unknowns, all k RHS vectors, all residual
    cross-moments); the shared Gauss elimination is generated text
    both engines execute verbatim (_gauss_steps_multi); equations
    leave as an explode of a k-element struct array — no per-equation
    re-scan, no second shuffle. Thousands of groups fit their VARs in
    parallel; a single aggregate row per group is all that moves.
    NULLs under the SPD ok-gate (n <= m + 1 or singular design).
    Bounds: 2 <= k <= 3 series, 1 <= p <= 2 (m <= 7; the unrolled
    elimination text grows O(m^3) — the cox_ph_multi3 budget).
    """
    k = len(value_cols)
    if k < 2 or k > 3:
        raise ValueError(f"need 2..3 value_cols, got {k}")
    if lags < 1 or lags > 2:
        raise ValueError(f"lags must be in 1..2, got {lags}")
    p = lags
    q = k * p
    frag = var_fragments(k, p)
    w2 = Window.partitionBy("g").orderBy(F.col("__o"))
    lagged = df.select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("__o"),
        *[
            F.col(c).cast("decimal(18,6)").alias(f"y_{e}")
            for e, c in enumerate(value_cols, start=1)
        ],
    )
    zcols = []
    for e in range(1, k + 1):
        for l_ in range(1, p + 1):
            zcols.append(
                F.lag(F.col(f"y_{e}"), l_)
                .over(w2)
                .alias(f"z{(e - 1) * p + l_}")
            )
    rel = lagged.select(
        "g", *[f"y_{e}" for e in range(1, k + 1)], *zcols
    )
    keep = F.lit(True)
    for i in range(1, q + 1):
        keep = keep & F.col(f"z{i}").isNotNull()
    rel = rel.filter(keep)
    cur = rel.groupBy("g").agg(*[F.expr(a) for a in frag["aggs"]])
    # ``many_groups`` picks the physical strategy for the step chain.
    # Default (False): plain withColumns — Catalyst collapses the
    # whole chain into one projection whose 36 output trees are
    # combinatorially deep (codegen falls back past 64KB, so each
    # ROW pays an interpreted walk of the giant tree) — ideal while
    # groups are few (the per-plan cost is ~1s and rows are few).
    # True (the 10k-systems shape): lazy persist() barriers every 6
    # step-levels stop the collapse (InMemoryRelation boundary), and
    # a flat localCheckpoint precedes the struct/explode stage —
    # measured 40.7 -> 21.1s at 10k systems / 2M rows, while the
    # SAME barriers cost 2-3x at 5 groups (13 extra tiny jobs), which
    # is why this is a mode, not a default. Values are identical on
    # both paths (re-certified).
    persisted = []
    if many_groups:
        for i, batch in enumerate(_step_levels(frag["steps"])):
            cur = cur.withColumns(
                {nm: F.expr(e) for nm, e in batch.items()}
            )
            if (i + 1) % 6 == 0:
                cur = cur.persist()
                persisted.append(cur)
    else:
        # One liveness-pruned spark.sql for the whole 49-level chain
        # (see _apply_steps_one_sql) — cuts this query's fixed
        # Catalyst cost, values bit-identical.
        import re as _re  # noqa: PLC0415

        keep = {"g", "n"}
        keep.update(_re.findall(r"\b[A-Za-z_]\w*\b", frag["ok"]))
        keep.update(n_ for bl in frag["betas"] for n_ in bl)
        keep.update(frag["cov"].values())
        cur = _apply_steps_one_sql(cur, frag["steps"], keep)
        # LAZY checkpoint barrier between the solved chain and the
        # output projection: without it CollapseProject inlines the
        # full Gauss tree into every one of the 36 struct fields and
        # the OPTIMIZER itself (not codegen — measured via
        # factoryMode=NO_CODEGEN still ~3.2s) walks a combinatorial
        # tree every call. The barrier costs one ~|groups|-row
        # micro-job at action time; lazy, so explain()/plan audits
        # never execute it. var_fit+var_irf at sf0.1: 8.3s -> ~4s.
        cur = cur.localCheckpoint(eager=False)
    ok = F.expr(frag["ok"])

    def _covname(e: int, f_: int) -> str:
        return frag["cov"][(min(e, f_), max(e, f_))]

    # Outputs pass through the floor-quantize chain, NOT F.round:
    # residual (co)variances of money-scale series reach 1e6+ where
    # 6-dp rounding sits at double's repr noise floor and Spark's
    # shortest-string HALF_UP vs DuckDB's binary rounding coin-flip
    # the last digit (ORACLE_PARITY midpoint note). floor(x*1e6+0.5)
    # / 1e6 is pure double arithmetic — bit-identical on any engine.
    def _r6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    # Materialization boundary BEFORE the struct/explode stage:
    # without it, Catalyst's project collapse inlines the ENTIRE
    # unrolled Gauss tree (plus the ok-gate over every pivot) into
    # EVERY struct field — measured 30s vs 3s at 10k groups, all
    # codegen. The checkpointed relation is k*(k*p+2)+2 scalars per
    # group; values (and hashes) are unchanged — the rounding happens
    # before the boundary exactly as it did inline.
    flat_cols = [F.col("g"), F.col("n")]
    for e in range(1, k + 1):
        betas = frag["betas"][e - 1]
        flat_cols.append(
            F.when(ok, _r6(F.expr(betas[0]))).alias(f"__c0_{e}")
        )
        for s in range(1, k + 1):
            for l_ in range(1, p + 1):
                flat_cols.append(
                    F.when(
                        ok,
                        _r6(F.expr(betas[(s - 1) * p + l_])),
                    ).alias(f"__b_{e}_{s}_{l_}")
                )
        flat_cols.append(
            F.when(ok, _r6(F.expr(_covname(e, e)))).alias(f"__s2_{e}")
        )
        for s in range(1, k + 1):
            flat_cols.append(
                F.when(ok, _r6(F.expr(_covname(e, s)))).alias(
                    f"__cv_{e}_{s}"
                )
            )
    if many_groups:
        flat = cur.select(*flat_cols).localCheckpoint(eager=True)
        for p_ in persisted:
            p_.unpersist()
    else:
        flat = cur.select(*flat_cols)
    structs = []
    for e in range(1, k + 1):
        fields = [
            F.lit(value_cols[e - 1]).alias("equation"),
            F.col(f"__c0_{e}").alias("const"),
        ]
        for s in range(1, k + 1):
            for l_ in range(1, p + 1):
                fields.append(
                    F.col(f"__b_{e}_{s}_{l_}").alias(
                        f"{value_cols[s - 1]}_l{l_}"
                    )
                )
        fields.append(F.col(f"__s2_{e}").alias("sigma2"))
        for s in range(1, k + 1):
            fields.append(
                F.col(f"__cv_{e}_{s}").alias(
                    f"resid_cov_{value_cols[s - 1]}"
                )
            )
        structs.append(F.struct(*fields))
    exploded = flat.select(
        F.col("g").alias(group_col),
        "n",
        F.explode(F.array(*structs)).alias("__eq"),
    )
    return exploded.select(
        group_col,
        F.col("__eq.equation").alias("equation"),
        "n",
        *[
            F.col(f"__eq.{f.name}").alias(f.name)
            for f in exploded.schema["__eq"].dataType.fields
            if f.name != "equation"
        ],
    )


def co_fragments(prais_winsten: bool) -> dict:
    """Shared Spark/DuckDB fragments for the AR(1)-corrected simple
    regression (Cochrane-Orcutt two-step; Prais-Winsten keeps the
    first observation weighted sqrt(1 - rho^2)).

    Aggregates run over a relation with columns rn (1-based row
    number per group), y, x (decimal(18,6)) and yl, xl (lag-1
    values); everything downstream is a named fixed-order double
    sequence both engines execute verbatim: OLS slope/intercept ->
    rho from the EXPANDED residual lag-moment (u_t u_{t-1} and
    u_{t-1}^2 written out in the level cross-sums, so no residual
    materialization, no second scan) -> quasi-differenced normal
    equations, again expanded in the same sums. Returns {aggs,
    steps, out, ok}.
    """
    dec = "DECIMAL(38,12)"
    lagged = "yl IS NOT NULL"
    aggs = [
        "CAST(COUNT(*) AS BIGINT) AS n",
        f"CAST(SUM(CAST(x AS {dec})) AS DOUBLE) AS sx",
        f"CAST(SUM(CAST(y AS {dec})) AS DOUBLE) AS sy",
        f"CAST(SUM(CAST(x * x AS {dec})) AS DOUBLE) AS sxx",
        f"CAST(SUM(CAST(x * y AS {dec})) AS DOUBLE) AS sxy",
        f"CAST(COUNT(CASE WHEN {lagged} THEN 1 END) AS BIGINT) AS n1",
    ]
    cond = {
        "sy_c": "y", "sx_c": "x",
        "syy_c": "y * y", "sxx_c": "x * x", "sxy_c": "x * y",
        "sy_l": "yl", "sx_l": "xl",
        "syy_l": "yl * yl", "sxx_l": "xl * xl", "sxy_l": "xl * yl",
        "s_ycyl": "y * yl", "s_ycxl": "y * xl",
        "s_xcyl": "x * yl", "s_xcxl": "x * xl",
    }
    for nm, term in cond.items():
        aggs.append(
            f"CAST(SUM(CASE WHEN {lagged} THEN"
            f" CAST({term} AS {dec}) END) AS DOUBLE) AS {nm}"
        )
    aggs.append(
        "CAST(MAX(CASE WHEN rn = 1 THEN CAST(y AS DOUBLE) END)"
        " AS DOUBLE) AS y1v"
    )
    aggs.append(
        "CAST(MAX(CASE WHEN rn = 1 THEN CAST(x AS DOUBLE) END)"
        " AS DOUBLE) AS x1v"
    )

    def div(a: str, b: str) -> str:
        # parenthesized denominator: b here can be a compound
        # expression ("nt - 2.0"), unlike the single pivot names
        # _gauss_steps feeds its own div
        return f"CASE WHEN ({b}) = 0 THEN NULL ELSE ({a}) / ({b}) END"

    pw = prais_winsten
    steps = [
        ("nd", "CAST(n AS DOUBLE)"),
        ("n1d", "CAST(n1 AS DOUBLE)"),
        ("det_o", "nd * sxx - sx * sx"),
        ("b_ols", div("nd * sxy - sx * sy", "det_o")),
        ("a_ols", div("sy - b_ols * sx", "nd")),
        (
            "rnum",
            "s_ycyl - a_ols * (sy_c + sy_l)"
            " - b_ols * (s_ycxl + s_xcyl)"
            " + n1d * (a_ols * a_ols)"
            " + (a_ols * b_ols) * (sx_c + sx_l)"
            " + (b_ols * b_ols) * s_xcxl",
        ),
        (
            "rden",
            "syy_l - 2.0 * a_ols * sy_l - 2.0 * b_ols * sxy_l"
            " + n1d * (a_ols * a_ols)"
            " + 2.0 * (a_ols * b_ols) * sx_l"
            " + (b_ols * b_ols) * sxx_l",
        ),
        ("rho", div("rnum", "rden")),
        ("cc", "1.0 - rho"),
        ("w2", "1.0 - rho * rho"),
        (
            "szz",
            "n1d * (cc * cc)" + (" + w2" if pw else ""),
        ),
        (
            "szx",
            "cc * (sx_c - rho * sx_l)"
            + (" + w2 * x1v" if pw else ""),
        ),
        (
            "szy",
            "cc * (sy_c - rho * sy_l)"
            + (" + w2 * y1v" if pw else ""),
        ),
        (
            "sxxs",
            "sxx_c - 2.0 * rho * s_xcxl + (rho * rho) * sxx_l"
            + (" + w2 * (x1v * x1v)" if pw else ""),
        ),
        (
            "sxys",
            "sxy_c - rho * s_xcyl - rho * s_ycxl"
            " + (rho * rho) * sxy_l"
            + (" + w2 * (x1v * y1v)" if pw else ""),
        ),
        (
            "syys",
            "syy_c - 2.0 * rho * s_ycyl + (rho * rho) * syy_l"
            + (" + w2 * (y1v * y1v)" if pw else ""),
        ),
        ("det_g", "szz * sxxs - szx * szx"),
        ("a_gls", div("szy * sxxs - szx * sxys", "det_g")),
        ("b_gls", div("szz * sxys - szx * szy", "det_g")),
        ("co_rss", "(syys - a_gls * szy) - b_gls * sxys"),
        ("nt", "n1d" + (" + 1.0" if pw else "")),
        ("co_s2", div("co_rss", "nt - 2.0")),
        (
            "se_b",
            "CASE WHEN co_s2 * szz / det_g >= 0"
            " THEN sqrt(co_s2 * szz / det_g) END",
        ),
    ]
    ok = (
        "n > 3 AND det_o > 0 AND rden > 0 AND abs(rho) < 1.0"
        " AND det_g > 0 AND co_rss >= 0"
    )
    return {
        "aggs": aggs,
        "steps": steps,
        "out": {
            "rho": "rho",
            "beta_ols": "b_ols",
            "beta_gls": "b_gls",
            "alpha_gls": "a_gls",
            "se_beta_gls": "se_b",
        },
        "ok": ok,
    }


def cochrane_orcutt(
    df: DataFrame,
    y_col: str,
    x_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
    prais_winsten: bool = False,
) -> DataFrame:
    """AR(1)-corrected regression per series (Cochrane-Orcutt 1949;
    Prais-Winsten 1954 with ``prais_winsten=True``) -> one row per
    group: (group, n, rho, beta_ols, beta_gls, alpha_gls,
    se_beta_gls).

    The GLS companion to newey_west: when the regression residual is
    AR(1) (the usual state of a macro level-on-level fit), OLS
    standard errors lie and OLS itself is inefficient. Two-step CO:
    rho from the lag-1 autocorrelation of the OLS residuals, then OLS
    on the quasi-differences y_t - rho y_{t-1} ~ (1-rho) + x_t -
    rho x_{t-1}. Prais-Winsten keeps observation 1, weighted
    sqrt(1 - rho^2) — preferred on short series where dropping a row
    costs real information. The structural intercept alpha_gls comes
    out directly because the "intercept" regressor is the transformed
    constant column, not 1.

    Scale discipline: ONE per-group lag window builds (y, x, lags,
    rn); ONE hash aggregate collects every decimal-exact sum (the
    residual lag-moments are EXPANDED into level cross-sums — no
    residual column, no second pass); co_fragments' fixed-order
    double chain is the shared text both engines run. NULLs under the
    ok-gate (n <= 3, constant x, degenerate residuals, |rho| >= 1).
    """
    frag = co_fragments(prais_winsten)
    w = Window.partitionBy("g").orderBy("__o")
    base = df.filter(
        F.col(y_col).isNotNull() & F.col(x_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("__o"),
        F.col(y_col).cast("decimal(18,6)").alias("y"),
        F.col(x_col).cast("decimal(18,6)").alias("x"),
    )
    rel = base.select(
        "g",
        F.row_number().over(w).alias("rn"),
        "y",
        "x",
        F.lag("y", 1).over(w).alias("yl"),
        F.lag("x", 1).over(w).alias("xl"),
    )
    cur = rel.groupBy("g").agg(*[F.expr(a) for a in frag["aggs"]])
    for batch in _step_levels(frag["steps"]):
        cur = cur.withColumns({nm: F.expr(e) for nm, e in batch.items()})
    ok = F.expr(frag["ok"])
    return cur.select(
        F.col("g").alias(group_col),
        "n",
        *[
            F.when(ok, F.round(F.expr(expr), 6)).alias(nm)
            for nm, expr in frag["out"].items()
        ],
    )


def _hp_pentadiag_solve(y: list, lam: float, order: int = 2) -> list:
    """Exact Hodrick-Prescott trend: solve (I + lam * D'D) x = y for
    the second-difference matrix D via the banded LDL' factorization
    (bandwidth 2), forward then backward substitution — O(n), exact
    to the factorization's rounding (agrees with a dense
    numpy.linalg.solve to ~1e-9 on economic magnitudes).

    PARITY-PINNED: every formula below is mirrored, operation for
    operation, by the recursive-CTE oracle (__spark_entry__
    hp_filter SQL) — plain IEEE-double arithmetic in identical
    left-associated order, sentinel d[-1] = 1.0 / z[-1] = 0.0 so the
    i = 1 step runs the uniform formulas with exact no-op terms
    (x - 0.0 * a * b is exact). Touch one side only with the other
    open. Band values come from indicator sums valid for EVERY n
    (n <= 2 degenerates to trend = y exactly: D has no rows, A = I).
    """
    n = len(y)
    if n == 0:
        return []
    if order not in (1, 2):
        raise ValueError(f"order must be 1 or 2, got {order}")
    d = [0.0] * n
    e = [0.0] * n
    f = [0.0] * n
    z = [0.0] * n

    if order == 2:

        def a0(i: int) -> float:
            w = 0.0
            if i <= n - 3:
                w += 1.0
            if i >= 1 and i - 1 <= n - 3:
                w += 4.0
            if i >= 2:
                w += 1.0
            return 1.0 + lam * w

        def a1m(i: int) -> float:  # A[i, i-1]
            w = 0.0
            if i >= 2 and i - 2 <= n - 3:
                w += -2.0
            if i >= 1 and i - 1 <= n - 3:
                w += -2.0
            return lam * w

        a2lit = lam  # A[i, i-2] = lam wherever defined
    else:  # order 1: D is first differences, A is TRIdiagonal

        def a0(i: int) -> float:
            w = 0.0
            if i <= n - 2:
                w += 1.0
            if i >= 1:
                w += 1.0
            return 1.0 + lam * w

        def a1m(i: int) -> float:  # A[i, i-1]
            w = 0.0
            if i >= 1 and i - 1 <= n - 2:
                w += -1.0
            return lam * w

        a2lit = 0.0  # no second off-diagonal: f stays exactly 0

    d[0] = a0(0)
    z[0] = y[0]
    dp, zp = 1.0, 0.0  # sentinels d[-1], z[-1]
    for i in range(1, n):
        d1, d2 = d[i - 1], dp
        e1, z1, z2 = e[i - 1], z[i - 1], zp
        fi = a2lit / d2 if i >= 2 else 0.0
        ei = (a1m(i) - fi * e1 * d2) / d1
        di = a0(i) - ei * ei * d1 - fi * fi * d2
        zi = y[i] - ei * z1 - fi * z2
        f[i], e[i], d[i], z[i] = fi, ei, di, zi
        dp, zp = d1, z1
    x = [0.0] * n
    x[n - 1] = z[n - 1] / d[n - 1]
    xn, fn = 0.0, 0.0  # sentinels x[n], f[n]
    for i in range(n - 2, -1, -1):
        xi = z[i] / d[i] - e[i + 1] * x[i + 1] - fn * xn
        xn, fn = x[i + 1], f[i + 1]
        x[i] = xi
    return x


def _penalized_smooth(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_col: str,
    lam: float,
    max_len: int,
    order: int,
    op_name: str = "hp_filter",
) -> DataFrame:
    """Shared Whittaker-smoother engine: order-2 = hp_filter,
    order-1 = whittaker_level (see the public wrappers for the
    full scale/parity contract).

    ``order_col`` must be UNIQUE per group (the standard series
    contract, as for periodogram's rank window): the kernel's stable
    sort can only pin a total order when keys don't tie — duplicate
    keys would make the recursion's input order, and therefore the
    trend, depend on partition layout.
    """

    import pandas as pd  # noqa: PLC0415

    if lam <= 0:
        raise ValueError(f"lam must be > 0, got {lam}")
    if max_len < 3:
        raise ValueError(f"max_len must be >= 3, got {max_len}")
    lam = float(lam)
    cap = int(max_len)

    def _q6(c):
        return (
            F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
        ).cast("decimal(18,6)")

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        _q6(F.col(value_col).cast("double"))
        .cast("double")
        .alias("v"),
    )
    g_t = base.schema["g"].dataType.simpleString()
    o_t = base.schema["o"].dataType.simpleString()
    schema = f"g {g_t}, o {o_t}, v double, trend_raw double"

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("o", kind="mergesort")
        y = [float(v) for v in pdf["v"].tolist()]
        if len(y) > cap:
            raise ValueError(
                f"{op_name}: series of {len(y)} rows exceeds the"
                f" max_len={cap} series-sized contract; aggregate"
                " first or raise max_len deliberately"
            )
        x = _hp_pentadiag_solve(y, lam, order)
        return pd.DataFrame(
            {
                "g": pdf["g"].to_numpy(),
                "o": pdf["o"].to_numpy(),
                "v": y,
                "trend_raw": x,
            }
        )

    out = base.groupBy("g").applyInPandas(kernel, schema)
    return out.select(
        F.col("g").alias(group_col),
        F.col("o").alias(order_col),
        F.col("v").alias("value"),
        F.round(F.col("trend_raw"), 6).alias("trend"),
        F.round(F.col("v") - F.col("trend_raw"), 6).alias("cycle"),
    )


def hp_filter(
    df: DataFrame,
    value_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
    lam: float = 1600.0,
    max_len: int = 100_000,
) -> DataFrame:
    """Hodrick-Prescott trend-cycle decomposition per series -> one
    row per input row: (group, order, value, trend, cycle).

    THE econ trend filter (Hodrick & Prescott 1997; lam = 1600 for
    quarterly, 129600 monthly, 6.25 annual): trend minimizes
    sum (y_t - tau_t)^2 + lam * sum (d2 tau_t)^2 — the missing
    member of the decomposition family (seasonal_adjust_monthly
    removes seasonality, holt_linear levels, hp_filter extracts the
    smooth trend the reference's analysis layer promises,
    documentation/economic_indicators.md:123-124 "seasonal
    decomposition, component analysis").

    Execution shape: the normal equations (I + lam D'D) tau = y are
    pentadiagonal; the exact O(n) banded LDL' solve is an inherently
    SEQUENTIAL two-pass recursion no engine parallelizes WITHIN a
    series — so it runs as one Arrow-batched applyInPandas kernel
    PER GROUP (_hp_pentadiag_solve: plain IEEE doubles, mirrored
    op-for-op by the recursive-CTE oracle), while thousands of
    series decompose in parallel across executors — the multimodal
    decode posture: vectorized boundary, per-series state bounded by
    the series, never a driver collect. ``max_len`` guards the
    SERIES-sized contract (the theil_sen posture): a group longer
    than it fails loudly rather than absorbing an unbounded
    single-task sort. Inputs floor-quantized decimal(18,6) then
    DOUBLE (the portable money channel); trend/cycle rounded 6dp in
    column expressions AFTER the kernel. n <= 2 series return
    trend = value, cycle = 0 exactly (A = I).
    """
    return _penalized_smooth(
        df, value_col, order_col, group_col, lam, max_len, order=2,
        op_name="hp_filter",
    )


def whittaker_level(
    df: DataFrame,
    value_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
    lam: float = 16.0,
    max_len: int = 100_000,
) -> DataFrame:
    """Order-1 Whittaker smoother (the local-level / random-walk-plus-
    noise smoother) per series -> (group, order, value, level, noise).

    hp_filter's first-difference sibling: level minimizes
    sum (y_t - mu_t)^2 + lam * sum (d1 mu_t)^2 — exactly the
    fixed-interval smoother of the local-level state-space model with
    signal-to-noise 1/lam (Whittaker 1923; Durbin & Koopman's LLM).
    Where HP extracts a smooth TREND (penalizing curvature), this
    tracks a drifting LEVEL (penalizing change) — the right filter
    for noisy rate/flow series where the mean relocates.

    Same execution and parity shape as hp_filter: banded (here
    TRIdiagonal — the second off-diagonal is exactly 0 and the shared
    LDL' recursion's f-terms vanish as exact no-ops) LDL' solve in
    one sequential Arrow kernel per series, series in parallel,
    max_len loud-gate, recursive-CTE oracle mirroring every double
    op. n = 1 returns level = value.
    """
    out = _penalized_smooth(
        df, value_col, order_col, group_col, lam, max_len, order=1,
        op_name="whittaker_level",
    )
    return out.select(
        group_col,
        order_col,
        "value",
        F.col("trend").alias("level"),
        F.col("cycle").alias("noise"),
    )


def var_irf_fragments(k: int, p: int, horizons: int = 2) -> dict:
    """var_fragments plus reduced-form impulse responses: Phi_0 = I,
    Phi_h = sum_{j=1..min(h,p)} A_j Phi_{h-j} (the companion-matrix
    power unrolled as named fixed-order double steps). Identity
    entries enter as literal 1.0/0.0 — exact multiplicative no-ops in
    both engines. Returns var_fragments' dict plus {"irf": {(h, e, s)
    -> name-or-literal}, "horizons": horizons}; e = response
    equation, s = shocked series, both 1-based.
    """
    if horizons < 1 or horizons > 3:
        raise ValueError(f"horizons must be in 1..3, got {horizons}")
    frag = var_fragments(k, p)
    steps = list(frag["steps"])
    betas = frag["betas"]

    def coef(l_: int, e: int, s_: int) -> str:
        # coefficient of (series s_, lag l_) in equation e
        return betas[e - 1][(s_ - 1) * p + l_]

    irf: dict = {}
    for e in range(1, k + 1):
        for s_ in range(1, k + 1):
            irf[(0, e, s_)] = "1.0" if e == s_ else "0.0"
            irf[(1, e, s_)] = coef(1, e, s_)
    for h in range(2, horizons + 1):
        for e in range(1, k + 1):
            for s_ in range(1, k + 1):
                terms = []
                for j in range(1, min(h, p) + 1):
                    inner = None
                    for m in range(1, k + 1):
                        t = f"{coef(j, e, m)} * {irf[(h - j, m, s_)]}"
                        inner = t if inner is None else f"({inner} + {t})"
                    terms.append(inner)
                expr = terms[0]
                for t in terms[1:]:
                    expr = f"({expr} + {t})"
                nm = f"irf_{h}_{e}_{s_}"
                steps.append((nm, expr))
                irf[(h, e, s_)] = nm
    out = dict(frag)
    out["steps"] = steps
    out["irf"] = irf
    out["horizons"] = horizons
    return out


def var_irf(
    df: DataFrame,
    value_cols: list[str],
    order_col: str = "date",
    group_col: str = "dataset",
    lags: int = 1,
    horizons: int = 2,
    many_groups: bool = False,
) -> DataFrame:
    """Reduced-form impulse responses from a VAR(p) fit -> one row
    per (group, h, shock, response): (group, h, shock, response,
    irf). irf[h, e, s] = d E[y_e(t+h)] / d eps_s(t) — how a one-unit
    reduced-form innovation in series s propagates into series e
    after h periods; h = 0 is the identity, horizon 1 is A_1, higher
    horizons the companion power. The standard readout of var_fit's
    coefficient matrix (orthogonalized IRFs would add a Cholesky
    rotation of the residual covariance — deliberately out of scope:
    shock ordering is an analyst's modeling choice, not an engine's).

    Same single-aggregate shape as var_fit: the IRF steps are pure
    arithmetic on the solved coefficients (var_irf_fragments), so the
    marginal cost over the fit is zero shuffles — rows leave as one
    exploded (horizons+1) * k * k struct array. NULLs under the same
    SPD ok-gate.
    """
    k = len(value_cols)
    if k < 2 or k > 3:
        raise ValueError(f"need 2..3 value_cols, got {k}")
    if lags < 1 or lags > 2:
        raise ValueError(f"lags must be in 1..2, got {lags}")
    p = lags
    q = k * p
    frag = var_irf_fragments(k, p, horizons)
    w2 = Window.partitionBy("g").orderBy(F.col("__o"))
    lagged = df.select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("__o"),
        *[
            F.col(c).cast("decimal(18,6)").alias(f"y_{e}")
            for e, c in enumerate(value_cols, start=1)
        ],
    )
    zcols = []
    for e in range(1, k + 1):
        for l_ in range(1, p + 1):
            zcols.append(
                F.lag(F.col(f"y_{e}"), l_)
                .over(w2)
                .alias(f"z{(e - 1) * p + l_}")
            )
    rel = lagged.select(
        "g", *[f"y_{e}" for e in range(1, k + 1)], *zcols
    )
    keep = F.lit(True)
    for i in range(1, q + 1):
        keep = keep & F.col(f"z{i}").isNotNull()
    rel = rel.filter(keep)
    cur = rel.groupBy("g").agg(*[F.expr(a) for a in frag["aggs"]])
    # same many_groups strategy switch as var_fit (see comment there)
    persisted = []
    if many_groups:
        for i, batch in enumerate(_step_levels(frag["steps"])):
            cur = cur.withColumns(
                {nm: F.expr(e) for nm, e in batch.items()}
            )
            if (i + 1) % 6 == 0:
                cur = cur.persist()
                persisted.append(cur)
    else:
        import re as _re  # noqa: PLC0415

        keep = {"g"}
        keep.update(_re.findall(r"\b[A-Za-z_]\w*\b", frag["ok"]))
        for v in frag["irf"].values():
            keep.update(_re.findall(r"\b[A-Za-z_]\w*\b", v))
        cur = _apply_steps_one_sql(cur, frag["steps"], keep)
        # same lazy barrier as var_fit (see comment there)
        cur = cur.localCheckpoint(eager=False)
    ok = F.expr(frag["ok"])

    def _r6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    # Same materialization boundary as var_fit (see comment there).
    flat_cols = [F.col("g")]
    for h in range(0, frag["horizons"] + 1):
        for e in range(1, k + 1):
            for s_ in range(1, k + 1):
                flat_cols.append(
                    F.when(
                        ok, _r6(F.expr(frag["irf"][(h, e, s_)]))
                    ).alias(f"__irf_{h}_{e}_{s_}")
                )
    if many_groups:
        flat = cur.select(*flat_cols).localCheckpoint(eager=True)
        for p_ in persisted:
            p_.unpersist()
    else:
        flat = cur.select(*flat_cols)
    structs = []
    for h in range(0, frag["horizons"] + 1):
        for e in range(1, k + 1):
            for s_ in range(1, k + 1):
                structs.append(
                    F.struct(
                        F.lit(h).alias("h"),
                        F.lit(value_cols[s_ - 1]).alias("shock"),
                        F.lit(value_cols[e - 1]).alias("response"),
                        F.col(f"__irf_{h}_{e}_{s_}").alias("irf"),
                    )
                )
    exploded = flat.select(
        F.col("g").alias(group_col),
        F.explode(F.array(*structs)).alias("__r"),
    )
    return exploded.select(
        group_col,
        F.col("__r.h").alias("h"),
        F.col("__r.shock").alias("shock"),
        F.col("__r.response").alias("response"),
        F.col("__r.irf").alias("irf"),
    )


def bk_weights(p_low: int, p_high: int, trunc: int) -> list[float]:
    """Baxter-King (1999) symmetric band-pass weights a_{-K..K} for
    cycles of period p_low..p_high observations, truncated at K =
    ``trunc`` and re-centered so the weights sum to exactly zero (the
    BK correction that makes the filter annihilate constants and,
    by symmetry, linear trends).

    Pure driver-side floats shared by the operator (F.lit) and the
    oracle (CAST(repr AS DOUBLE) literals), so both engines multiply
    by bit-identical coefficients.
    """
    import math  # noqa: PLC0415

    if p_low < 2 or p_high <= p_low:
        raise ValueError(
            f"need 2 <= p_low < p_high, got ({p_low}, {p_high})"
        )
    if trunc < 1 or trunc > 120:
        raise ValueError(f"trunc must be in 1..120, got {trunc}")
    w_h = 2.0 * math.pi / float(p_low)
    w_l = 2.0 * math.pi / float(p_high)
    b = [(w_h - w_l) / math.pi]
    for j in range(1, trunc + 1):
        b.append(
            (math.sin(w_h * j) - math.sin(w_l * j)) / (math.pi * j)
        )
    # zero-sum correction over the FULL -K..K window
    theta = (b[0] + 2.0 * sum(b[1:])) / (2.0 * trunc + 1.0)
    a = [bj - theta for bj in b]
    return [a[abs(j)] for j in range(-trunc, trunc + 1)]


def bk_filter(
    df: DataFrame,
    value_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
    p_low: int = 6,
    p_high: int = 32,
    trunc: int = 12,
) -> DataFrame:
    """Baxter-King band-pass filter per series -> one row per input
    row: (group, order, value, cycle). ``cycle`` isolates
    fluctuations with period between p_low and p_high OBSERVATIONS
    (the classical business-cycle setting: 6..32 quarters, K=12);
    the first and last K rows of each series are NULL by
    construction — BK's defining edge behavior, never extrapolated.

    Completes the trend-cycle family next to hp_filter (curvature
    penalty) and whittaker_level (drift penalty): where HP fits a
    trend and calls the remainder cycle, BK passes ONLY the chosen
    frequency band — the standard cross-check on HP cycles over the
    reference's indicator table
    (documentation/economic_indicators.md:123-124).

    Shape: a fixed +-K window of lag/lead terms folded in one
    left-associated column expression — pure JVM window functions
    over the per-group partition, no Arrow kernel, no recursion, ONE
    shuffle (the window partition). The zero-sum weights come from
    bk_weights; the sum runs j = -K..K in fixed order so the oracle
    (same literals, same order) folds the identical doubles.
    ``order_col`` must be unique per group (the series contract).
    """
    w = bk_weights(p_low, p_high, trunc)
    win = Window.partitionBy("g").orderBy("o")

    def _q6(c):
        return (
            F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
        ).cast("decimal(18,6)")

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        _q6(F.col(value_col).cast("double")).cast("double").alias("v"),
    )

    def term(j: int):
        if j < 0:
            shifted = F.lag(F.col("v"), -j).over(win)
        elif j > 0:
            shifted = F.lead(F.col("v"), j).over(win)
        else:
            shifted = F.col("v")
        return F.lit(w[j + trunc]) * shifted

    acc = term(-trunc)
    for j in range(-trunc + 1, trunc + 1):
        acc = acc + term(j)
    out = base.withColumn("__c", acc)
    return out.select(
        F.col("g").alias(group_col),
        F.col("o").alias(order_col),
        F.col("v").alias("value"),
        (F.floor(F.col("__c") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
        .alias("cycle"),
    )


def hamilton_filter(
    df: DataFrame,
    value_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
    h: int = 24,
    p: int = 4,
    many_groups: bool = False,
) -> DataFrame:
    """Hamilton (2018) regression filter per series -> one row per
    input row: (group, order, value, trend, cycle). ``trend`` is the
    h-step-ahead linear projection of y_t on [1, y_{t-h}, ...,
    y_{t-h-p+1}]; ``cycle`` is the projection residual — "the part
    of y_t that could not be predicted from the series' own history
    h periods earlier". value = trend + cycle within 1e-6 (the two
    outputs round independently). Defaults h=24, p=4 are Hamilton's
    monthly convention (8 and 4 for quarterly data).

    The modern alternative to hp_filter ("Why You Should Never Use
    the Hodrick-Prescott Filter"): no filter-induced spurious cycles,
    no end-point revisions — completing the trend-cycle family (HP
    curvature / Whittaker drift / BK band-pass / Hamilton projection)
    over the reference's indicator table
    (documentation/economic_indicators.md:123-124).

    Shape: per-group lag windows build the h-shifted regressor block,
    ONE decimal-exact hash aggregate collects the m = p+1 normal-
    equation sums (var_fragments at k=1 — the identical shared Gauss
    text), the solved chain runs behind the depth-capped lazy-barrier
    path, and the |groups|-row ROUNDED-beta relation joins back to
    the fact unhinted (AQE broadcasts when small). The first h+p-1
    rows per series and all rows of singular/short groups emit NULL
    trend/cycle under the fragments' ok-gate — never an extrapolated
    edge.
    """
    if h < 1 or h > 120:
        raise ValueError(f"h must be in 1..120, got {h}")
    if p < 1 or p > 6:
        raise ValueError(f"p must be in 1..6, got {p}")
    frag = var_fragments(1, p)
    win = Window.partitionBy("g").orderBy("o")

    def _q6(c):
        return (
            F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
        ).cast("decimal(18,6)")

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        _q6(F.col(value_col).cast("double")).cast("double").alias("v"),
    )
    lagged = base.select(
        "g",
        "o",
        "v",
        *[
            F.lag("v", h + j - 1).over(win).alias(f"z{j}")
            for j in range(1, p + 1)
        ],
    )
    keep = F.lit(True)
    for j in range(1, p + 1):
        keep = keep & F.col(f"z{j}").isNotNull()
    rel = lagged.filter(keep).select(
        "g",
        F.col("v").cast("decimal(18,6)").alias("y_1"),
        *[
            F.col(f"z{j}").cast("decimal(18,6)").alias(f"z{j}")
            for j in range(1, p + 1)
        ],
    )
    cur = rel.groupBy("g").agg(*[F.expr(a) for a in frag["aggs"]])
    if many_groups:
        for i, batch in enumerate(_step_levels(frag["steps"])):
            cur = cur.withColumns(
                {nm: F.expr(e) for nm, e in batch.items()}
            )
    else:
        import re as _re  # noqa: PLC0415

        keepcols = {"g"}
        keepcols.update(_re.findall(r"\b[A-Za-z_]\w*\b", frag["ok"]))
        keepcols.update(frag["betas"][0])
        cur = _apply_steps_one_sql(cur, frag["steps"], keepcols)
        cur = cur.localCheckpoint(eager=False)
    ok = F.expr(frag["ok"])

    def _r6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    betas = frag["betas"][0]
    fit = cur.select(
        "g",
        *[
            F.when(ok, _r6(F.expr(b))).alias(f"b{i}")
            for i, b in enumerate(betas)
        ],
    )
    # fact x |groups|-row fit LEFT join (a group too short to fit any
    # regression row has no fit row at all — its series rows must
    # still come back, NULL-gated), unhinted (the seasonal_decompose
    # broadcast discipline). Fitted value composes the PUBLIC rounded
    # betas left-associated, so the oracle folds identical doubles.
    tr = F.col("b0")
    for j in range(1, p + 1):
        tr = tr + F.col(f"b{j}") * F.col(f"z{j}")
    out = lagged.join(fit, "g", "left").select(
        F.col("g").alias(group_col),
        F.col("o").alias(order_col),
        F.col("v").alias("value"),
        _r6(tr).alias("trend"),
        _r6(F.col("v") - tr).alias("cycle"),
    )
    return out


def var_irf_orth_fragments(k: int, p: int, horizons: int = 2) -> dict:
    """var_irf_fragments plus the orthogonalized readout: a Cholesky
    factor L of the residual covariance (lower-triangular, generated
    closed-form for k <= 3), Theta_h = Phi_h L, and the cumulative
    forecast-error variance decomposition
    share_{h,e,s} = sum_{j<=h} theta_{j,e,s}^2 / sum_{s'} sum_{j<=h}
    theta_{j,e,s'}^2 (Luetkepohl ch. 2; shocks ordered as
    ``value_cols`` — the ordering IS the identification assumption).

    Everything is named fixed-order double steps both engines run
    verbatim: sqrt() is IEEE correctly-rounded on both (bit-identical
    on the same operand); each Cholesky pivot is guarded by a
    positive-squared-pivot term that also extends the ok-gate, and
    every generated division parenthesizes its denominator (the
    co_fragments precedence rule). Returns the var dict plus
    {"orth": {(h, e, s) -> (theta name-or-literal, share name)},
    "ok_orth", "horizons"}.
    """
    frag = var_irf_fragments(k, p, horizons)
    steps = list(frag["steps"])
    cov = frag["cov"]

    def covn(a: int, b: int) -> str:
        return cov[(min(a, b), max(a, b))]

    # Cholesky: for s = 1..k, pivot ch_s_s_sq then column below it.
    ok_terms = []
    for s_ in range(1, k + 1):
        piv = covn(s_, s_)
        for t in range(1, s_):
            piv = f"({piv} - ch_{s_}_{t} * ch_{s_}_{t})"
        steps.append((f"ch_{s_}_{s_}_sq", piv))
        ok_terms.append(f"ch_{s_}_{s_}_sq > 0")
        steps.append(
            (
                f"ch_{s_}_{s_}",
                f"CASE WHEN ch_{s_}_{s_}_sq > 0"
                f" THEN sqrt(ch_{s_}_{s_}_sq) ELSE 0.0 END",
            )
        )
        for m in range(s_ + 1, k + 1):
            num = covn(s_, m)
            for t in range(1, s_):
                num = f"({num} - ch_{m}_{t} * ch_{s_}_{t})"
            steps.append(
                (
                    f"ch_{m}_{s_}",
                    f"CASE WHEN (ch_{s_}_{s_}) = 0 THEN 0.0"
                    f" ELSE {num} / (ch_{s_}_{s_}) END",
                )
            )
    ok_orth = f"{frag['ok']} AND {' AND '.join(ok_terms)}"

    # Theta_h = Phi_h L: theta_{h,e,s} = sum_{m>=s} phi_{h,e,m} ch_m_s.
    # Literal phis (the h=0 identity) simplify at GENERATION time so
    # both engines fold the same text.
    irf = frag["irf"]
    theta: dict = {}
    for h in range(0, horizons + 1):
        for e in range(1, k + 1):
            for s_ in range(1, k + 1):
                terms = []
                for m in range(s_, k + 1):
                    phi = irf[(h, e, m)]
                    if phi == "0.0":
                        continue
                    if phi == "1.0":
                        terms.append(f"ch_{m}_{s_}")
                    else:
                        terms.append(f"{phi} * ch_{m}_{s_}")
                if not terms:
                    theta[(h, e, s_)] = "0.0"
                    continue
                expr = terms[0]
                for t in terms[1:]:
                    expr = f"({expr} + {t})"
                nm = f"th_{h}_{e}_{s_}"
                steps.append((nm, expr))
                theta[(h, e, s_)] = nm

    # Cumulative FEVD: fv (running sum of squares), den, share.
    orth: dict = {}
    for h in range(0, horizons + 1):
        for e in range(1, k + 1):
            for s_ in range(1, k + 1):
                t_ = theta[(h, e, s_)]
                sq = "0.0" if t_ == "0.0" else f"{t_} * {t_}"
                if h == 0:
                    steps.append((f"fv_{h}_{e}_{s_}", sq))
                else:
                    steps.append(
                        (
                            f"fv_{h}_{e}_{s_}",
                            f"(fv_{h - 1}_{e}_{s_} + {sq})",
                        )
                    )
            den = f"fv_{h}_{e}_1"
            for s_ in range(2, k + 1):
                den = f"({den} + fv_{h}_{e}_{s_})"
            steps.append((f"fvden_{h}_{e}", den))
            for s_ in range(1, k + 1):
                steps.append(
                    (
                        f"sh_{h}_{e}_{s_}",
                        f"CASE WHEN (fvden_{h}_{e}) = 0 THEN NULL"
                        f" ELSE fv_{h}_{e}_{s_} / (fvden_{h}_{e}) END",
                    )
                )
                orth[(h, e, s_)] = (
                    theta[(h, e, s_)],
                    f"sh_{h}_{e}_{s_}",
                )
    out = dict(frag)
    out["steps"] = steps
    out["orth"] = orth
    out["ok_orth"] = ok_orth
    return out


def var_irf_orth(
    df: DataFrame,
    value_cols: list[str],
    order_col: str = "date",
    group_col: str = "dataset",
    lags: int = 1,
    horizons: int = 2,
    many_groups: bool = False,
) -> DataFrame:
    """Orthogonalized impulse responses + forecast-error variance
    decomposition per group -> one row per (group, h, shock,
    response): (group, h, shock, response, irf_orth, fevd_share).

    The causal readout var_irf deliberately stops short of: rotate
    the reduced-form responses by the Cholesky factor of var_fit's
    residual covariance so shocks are mutually uncorrelated unit-
    variance innovations, and report each shock's cumulative share of
    every response's forecast-error variance at each horizon. This is
    the "which indicator drives which" analysis the reference's docs
    promise for the multi-indicator table
    (documentation/economic_indicators.md:123-126 "forecasting,
    variable selection, component analysis"); the shock ordering is
    ``value_cols`` order — an explicit identification choice the
    caller makes, per the recursive-identification convention.

    Shape: identical to var_irf — ONE per-group hash aggregate, a
    generated step chain (Gauss solve + companion powers + Cholesky
    + variance folds) behind the depth-capped lazy-barrier path, rows
    leaving as one exploded struct array. fevd_share rows for a group
    sum to 1 across shocks at every (h, response) when the ok-gate
    passes; all outputs NULL when the design is singular or the
    residual covariance is not positive-definite.
    """
    k = len(value_cols)
    if k < 2 or k > 3:
        raise ValueError(f"need 2..3 value_cols, got {k}")
    if lags < 1 or lags > 2:
        raise ValueError(f"lags must be in 1..2, got {lags}")
    if horizons < 1 or horizons > 3:
        raise ValueError(f"horizons must be in 1..3, got {horizons}")
    p = lags
    q = k * p
    frag = var_irf_orth_fragments(k, p, horizons)
    w2 = Window.partitionBy("g").orderBy(F.col("__o"))
    lagged = df.select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("__o"),
        *[
            F.col(c).cast("decimal(18,6)").alias(f"y_{e}")
            for e, c in enumerate(value_cols, start=1)
        ],
    )
    zcols = []
    for e in range(1, k + 1):
        for l_ in range(1, p + 1):
            zcols.append(
                F.lag(F.col(f"y_{e}"), l_)
                .over(w2)
                .alias(f"z{(e - 1) * p + l_}")
            )
    rel = lagged.select(
        "g", *[f"y_{e}" for e in range(1, k + 1)], *zcols
    )
    keep = F.lit(True)
    for i in range(1, q + 1):
        keep = keep & F.col(f"z{i}").isNotNull()
    rel = rel.filter(keep)
    cur = rel.groupBy("g").agg(*[F.expr(a) for a in frag["aggs"]])
    persisted = []
    if many_groups:
        for i, batch in enumerate(_step_levels(frag["steps"])):
            cur = cur.withColumns(
                {nm: F.expr(e) for nm, e in batch.items()}
            )
            if (i + 1) % 6 == 0:
                cur = cur.persist()
                persisted.append(cur)
    else:
        import re as _re  # noqa: PLC0415

        keepcols = {"g"}
        keepcols.update(
            _re.findall(r"\b[A-Za-z_]\w*\b", frag["ok_orth"])
        )
        for t_, s_ in frag["orth"].values():
            keepcols.update(_re.findall(r"\b[A-Za-z_]\w*\b", t_))
            keepcols.update(_re.findall(r"\b[A-Za-z_]\w*\b", s_))
        cur = _apply_steps_one_sql(cur, frag["steps"], keepcols)
        cur = cur.localCheckpoint(eager=False)
    ok = F.expr(frag["ok_orth"])

    def _r6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    flat_cols = [F.col("g")]
    for h in range(0, frag["horizons"] + 1):
        for e in range(1, k + 1):
            for s_ in range(1, k + 1):
                t_, sh = frag["orth"][(h, e, s_)]
                flat_cols.append(
                    F.when(ok, _r6(F.expr(t_))).alias(
                        f"__th_{h}_{e}_{s_}"
                    )
                )
                flat_cols.append(
                    F.when(ok, _r6(F.expr(sh))).alias(
                        f"__sh_{h}_{e}_{s_}"
                    )
                )
    if many_groups:
        flat = cur.select(*flat_cols).localCheckpoint(eager=True)
        for p_ in persisted:
            p_.unpersist()
    else:
        flat = cur.select(*flat_cols)
    structs = []
    for h in range(0, frag["horizons"] + 1):
        for e in range(1, k + 1):
            for s_ in range(1, k + 1):
                structs.append(
                    F.struct(
                        F.lit(h).alias("h"),
                        F.lit(value_cols[s_ - 1]).alias("shock"),
                        F.lit(value_cols[e - 1]).alias("response"),
                        F.col(f"__th_{h}_{e}_{s_}").alias("irf_orth"),
                        F.col(f"__sh_{h}_{e}_{s_}").alias(
                            "fevd_share"
                        ),
                    )
                )
    exploded = flat.select(
        F.col("g").alias(group_col),
        F.explode(F.array(*structs)).alias("__r"),
    )
    return exploded.select(
        group_col,
        F.col("__r.h").alias("h"),
        F.col("__r.shock").alias("shock"),
        F.col("__r.response").alias("response"),
        F.col("__r.irf_orth").alias("irf_orth"),
        F.col("__r.fevd_share").alias("fevd_share"),
    )


def seasonal_decompose(
    df: DataFrame,
    value_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
    lam: float = 129600.0,
    period: str = "month",
    max_len: int = 100_000,
    model: str = "additive",
    min_cycles: int = 1,
) -> DataFrame:
    """Classical decomposition per series -> one row per input row:
    (group, order, value, trend, seasonal, remainder). Additive
    (default): value = trend + seasonal + remainder within 1e-6
    (trend and the detrended cycle are rounded to the 6-dp grid
    independently from trend_raw, so the three-way sum can sit one
    output-grid ulp off value when trend_raw lands near a half-grid
    midpoint). ``model="multiplicative"``: value = trend * seasonal
    * remainder to the same tolerance — the ratio-to-trend index
    re-normalized to mean 1 — for level series whose seasonal swing
    grows with the level (CPI-style); rows where the HP trend is not
    strictly positive get NULL seasonal/remainder (a ratio to a
    non-positive trend is not a seasonal factor — the NULL-gate
    discipline, never a silent fabrication).

    PERIOD-COVERAGE CONTRACT: the seasonal index for a period label
    is the mean over that label's observations; a series covering
    fewer than ``min_cycles`` occurrences of a label (e.g. an
    8-month series has single-observation labels) absorbs trend
    curvature into the "index". Labels with fewer than ``min_cycles``
    observations therefore emit NULL seasonal/remainder; the
    centering (or mean-1 normalization) runs over the surviving
    labels only. The default min_cycles=1 keeps every label and is
    output-identical to the pre-gate operator.

    The component analysis the reference's docs promise
    (documentation/economic_indicators.md:123-124), assembled from
    certified parts: trend is the HP filter at ``lam`` (129600 =
    Ravn-Uhlig monthly; pass 1600 with period="quarter"), the
    seasonal index is the exact per-period mean of the detrended
    series re-centered to sum zero across periods (the classical
    seasonal-means step), and the remainder closes the identity.
    Complements seasonal_adjust_monthly (which REMOVES seasonality in
    one step) by exposing all three components side by side.

    Shape: hp_filter's kernel (one sequential Arrow task per series,
    series in parallel), PINNED via eager localCheckpoint because two
    plan branches consume it (the per-period mean aggregate and the
    final join's fact side) — without the pin Catalyst re-executes
    the sequential LDL' kernel once per branch (r10 PLANS showed
    arrow=3). Then two tiny exact-mean aggregates joined SMALL-side
    first (index x centering -> one |groups x periods|-row relation)
    and ONE fact-side join, unhinted: AQE broadcasts the index when
    it is small and falls back to a shuffle join when the group count
    makes a broadcast driver-hostile — a forced hint here would ship
    a group-count-proportional table through the driver at scale.
    Parity: period means via decimal-exact sums of the 6-dp cycle;
    the index is floor-quantized before the centering sum so the
    cross-period fold is order-free; outputs leave through the
    floor-quantize chain.
    """
    if period not in ("month", "quarter"):
        raise ValueError(f"period must be month|quarter, got {period}")
    if model not in ("additive", "multiplicative"):
        raise ValueError(
            f"model must be additive|multiplicative, got {model}"
        )
    if min_cycles < 1:
        raise ValueError(f"min_cycles must be >= 1, got {min_cycles}")
    t = hp_filter(
        df, value_col, order_col, group_col, lam=lam, max_len=max_len
    ).localCheckpoint(eager=True)
    perf = F.month if period == "month" else F.quarter

    def _r6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    # comp: the detrended component the index averages — the cycle
    # itself (additive) or the 6-dp ratio to a strictly positive
    # trend (multiplicative; non-positive trend -> NULL, a ratio to
    # a non-positive trend is not a seasonal factor).
    if model == "additive":
        comp = F.col("cycle")
    else:
        comp = F.when(
            F.col("trend") > 0,
            _r6(F.try_divide(F.col("value"), F.col("trend"))),
        )
    base = t.select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        "value",
        "trend",
        perf(F.col(order_col)).alias("per"),
        comp.alias("comp"),
    )
    # Per-period exact mean + the PERIOD-COVERAGE gate: labels seen
    # fewer than min_cycles times emit a NULL index, and both the
    # centering and the final join then propagate the NULL.
    sidx = base.groupBy("g", "per").agg(
        F.try_divide(
            F.sum(F.col("comp").cast("decimal(28,6)")).cast("double"),
            F.count(F.col("comp")).cast("double"),
        ).alias("s_raw"),
        F.count(F.col("comp")).alias("s_n"),
    )
    sq = sidx.select(
        "g",
        "per",
        F.when(
            F.col("s_n") >= F.lit(int(min_cycles)),
            _r6(F.col("s_raw")),
        ).alias("s_q"),
    )
    ctr = sq.groupBy("g").agg(
        F.try_divide(
            F.sum(F.col("s_q").cast("decimal(18,6)")).cast("double"),
            F.count(F.col("s_q")).cast("double"),
        ).alias("c")
    )
    # Small-side first: |groups x periods| rows joined to |groups|
    # rows — the fact relation then meets ONE pre-assembled seasonal
    # index, not two separate joins. No broadcast hints: AQE picks
    # broadcast from actual sizes (safe at millions of groups).
    if model == "additive":
        seasonal_expr = _r6(F.col("s_q") - F.col("c"))
    else:
        seasonal_expr = F.when(
            F.col("c") > 0,
            _r6(F.try_divide(F.col("s_q"), F.col("c"))),
        )
    seas = sq.join(ctr, "g").select(
        "g", "per", seasonal_expr.alias("seasonal")
    )
    if model == "additive":
        remainder_expr = _r6(F.col("comp") - F.col("seasonal"))
    else:
        remainder_expr = _r6(
            F.try_divide(F.col("comp"), F.col("seasonal"))
        )
    out = base.join(seas, ["g", "per"]).select(
        F.col("g").alias(group_col),
        F.col("o").alias(order_col),
        "value",
        "trend",
        "seasonal",
        remainder_expr.alias("remainder"),
    )
    return out
