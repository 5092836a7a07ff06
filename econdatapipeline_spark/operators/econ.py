"""Economic composition analytics: bilateral price indices,
shift-share decomposition, RFM segmentation.

The reference stores price/volume economic series and its
documentation promises an analysis layer over the merged indicator
table (documentation/economic_indicators.md:71,122-126); these are
the composition questions an economist asks next — "how much of the
change is price vs mix vs local performance, and who are the
customers behind it".

Scale posture: every operator is joins + hash aggregates with
decimal-exact sums; nothing is ever |facts|-sized on the driver.
Quantile thresholds ride the certified percentile channel instead of
a global ntile window (a single-partition sort at warehouse scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _q6(c):
    """Floor-based half-up quantize to 1e-6 (a pure double chain both
    engines execute identically), then the exact decimal cast."""
    return (F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast(
        "decimal(18,6)"
    )


def price_index(
    df: DataFrame,
    item_col: str,
    period_col: str,
    price_col: str,
    qty_col: str,
    base_period,
) -> DataFrame:
    """Bilateral price indices vs a base period -> one row per period
    (period, n_matched, laspeyres, paasche, fisher, tornqvist).

    The four standard index-number formulas over the matched-item
    set (items present in BOTH the base and the comparison period —
    the bilateral-matched-model convention; entering/exiting items
    are excluded and visible through n_matched):

        L = sum(p_t q_0) / sum(p_0 q_0)     (base-weighted)
        P = sum(p_t q_t) / sum(p_0 q_t)     (current-weighted)
        F = sqrt(L * P)                      (Fisher ideal)
        ln T = sum 0.5*(w_0 + w_t) ln(p_t/p_0)   (Tornqvist)

    with w the expenditure shares WITHIN the matched set. Input
    contract: ONE row per (item, period) — pre-aggregate duplicates
    upstream (a duplicated item would silently multiply through the
    matched join). L and P are ratios of decimal-exact sums; the Tornqvist log terms are
    quantized decimal(28,12) before the sum (the entropy/ln channel —
    ORACLE_PARITY "genuinely irrational terms"). Inputs are
    floor-quantized decimal(18,6). NULL indices where a denominator
    is 0 or any matched price is non-positive (ln undefined);
    tornqvist NULLs independently so L/P/F survive a zero-price item.

    Shape: ONE base-period relation keyed by item re-enters a single
    equi-join against the comparison periods (AQE broadcasts it when
    small), then ONE aggregate per period. The base relation is as
    wide as the item vocabulary — never forced into a broadcast.
    """
    pq = df.select(
        F.col(item_col).alias("i"),
        F.col(period_col).alias("t"),
        _q6(F.col(price_col).cast("double")).alias("p"),
        _q6(F.col(qty_col).cast("double")).alias("q"),
    ).filter(
        F.col("i").isNotNull()
        & F.col("t").isNotNull()
        & F.col("p").isNotNull()
        & F.col("q").isNotNull()
    ).localCheckpoint(eager=True)  # pinned: base + current + torn
    base = pq.filter(F.col("t") == F.lit(base_period)).select(
        F.col("i"),
        F.col("p").alias("p0"),
        F.col("q").alias("q0"),
    )
    cur = pq.filter(F.col("t") != F.lit(base_period))
    j = cur.join(base, "i")
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    dv = F.try_divide
    pd_ = F.col("p").cast("double")
    p0d = F.col("p0").cast("double")
    # expenditure totals within the matched set, per period
    sums = j.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum(dec(F.col("p") * F.col("q0"))).alias("ptq0"),
        F.sum(dec(F.col("p0") * F.col("q0"))).alias("p0q0"),
        F.sum(dec(F.col("p") * F.col("q"))).alias("ptqt"),
        F.sum(dec(F.col("p0") * F.col("q"))).alias("p0qt"),
        F.max(
            F.when((F.col("p") <= 0) | (F.col("p0") <= 0), 1).otherwise(0)
        ).alias("bad_price"),
    )
    # Tornqvist needs per-item shares -> second pass re-entering the
    # two expenditure totals as a periods-sized broadcast relation
    tot = sums.select(
        "t",
        d("p0q0").alias("e0"),
        d("ptqt").alias("et"),
    )
    lnterm = (
        F.lit(0.5)
        * (
            dv((p0d * F.col("q0").cast("double")), F.col("e0"))
            + dv((pd_ * F.col("q").cast("double")), F.col("et"))
        )
        * F.log(dv(pd_, p0d))
    )
    torn = (
        j.join(F.broadcast(tot), "t")
        .groupBy("t")
        .agg(
            F.sum(lnterm.cast("decimal(28,12)"))
            .cast("double")
            .alias("lnt")
        )
    )
    lasp = dv(d("ptq0"), d("p0q0"))
    paas = dv(d("ptqt"), d("p0qt"))
    ok_lp = F.col("n_matched") > 0
    ok_t = ok_lp & (F.col("bad_price") == 0)
    return (
        sums.join(torn, "t")
        .select(
            F.col("t").alias(period_col),
            "n_matched",
            F.when(ok_lp, F.round(lasp, 6)).alias("laspeyres"),
            F.when(ok_lp, F.round(paas, 6)).alias("paasche"),
            F.when(ok_lp, F.round(F.sqrt(lasp * paas), 6)).alias(
                "fisher"
            ),
            F.when(ok_t, F.round(F.exp(F.col("lnt")), 6)).alias(
                "tornqvist"
            ),
        )
    )


def shift_share(
    df: DataFrame,
    region_col: str,
    industry_col: str,
    value_base_col: str,
    value_end_col: str,
) -> DataFrame:
    """Shift-share decomposition -> one row per (region, industry):
    (region, industry, v_base, v_end, national_effect, mix_effect,
    competitive_effect).

    The classical regional-economics identity: each cell's growth
    v_end - v_base splits EXACTLY into
        national  = v_base * g_N                (everyone's tide)
        mix       = v_base * (g_I - g_N)        (being in a growing industry)
        competitive = v_base * (g_ri - g_I)     (beating your industry)
    where g_N is total growth, g_I the industry's national growth and
    g_ri the cell's own growth. The three effects sum to the cell's
    absolute change by construction — an invariant the tests assert.

    Shape: one cell aggregate, one industry margin, one 1-row national
    margin, re-entering as broadcast relations; decimal-exact sums,
    fixed-order double ratios. NULL effects where a base is 0.
    """
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    dv = F.try_divide
    cell = (
        df.filter(
            F.col(region_col).isNotNull()
            & F.col(industry_col).isNotNull()
        )
        .groupBy(
            F.col(region_col).alias("r"),
            F.col(industry_col).alias("ind"),
        )
        .agg(
            F.sum(dec(_q6(F.col(value_base_col).cast("double"))))
            .cast("double")
            .alias("vb"),
            F.sum(dec(_q6(F.col(value_end_col).cast("double"))))
            .cast("double")
            .alias("ve"),
        )
        # pinned cells relation: industry margin, national margin and
        # the final join each re-derived the fact pipeline (20
        # exchanges at plan audit)
        .localCheckpoint(eager=True)
    )
    ind = cell.groupBy("ind").agg(
        F.sum(F.col("vb").cast("decimal(28,6)"))
        .cast("double")
        .alias("ib"),
        F.sum(F.col("ve").cast("decimal(28,6)"))
        .cast("double")
        .alias("ie"),
    )
    nat = cell.agg(
        F.sum(F.col("vb").cast("decimal(28,6)"))
        .cast("double")
        .alias("nb"),
        F.sum(F.col("ve").cast("decimal(28,6)"))
        .cast("double")
        .alias("ne"),
    )
    g_n = dv(F.col("ne") - F.col("nb"), F.col("nb"))
    g_i = dv(F.col("ie") - F.col("ib"), F.col("ib"))
    g_ri = dv(F.col("ve") - F.col("vb"), F.col("vb"))
    return (
        cell.join(F.broadcast(ind), "ind")
        .crossJoin(F.broadcast(nat))
        .select(
            F.col("r").alias(region_col),
            F.col("ind").alias(industry_col),
            F.round(F.col("vb"), 6).alias("v_base"),
            F.round(F.col("ve"), 6).alias("v_end"),
            F.round(F.col("vb") * g_n, 6).alias("national_effect"),
            F.round(F.col("vb") * (g_i - g_n), 6).alias("mix_effect"),
            F.round(F.col("vb") * (g_ri - g_i), 6).alias(
                "competitive_effect"
            ),
        )
    )


def rfm_segments(
    df: DataFrame,
    customer_col: str,
    date_col: str,
    value_col: str,
    reference_date,
    n_bins: int = 5,
) -> DataFrame:
    """RFM segmentation -> one row per (r_score, f_score, m_score):
    (r_score, f_score, m_score, n_customers, avg_monetary).

    The marketing classic: per customer, Recency (days from last
    activity to the reference date), Frequency (event count) and
    Monetary (value sum) are each scored 1..n_bins against GLOBAL
    quantile thresholds, and the grid is the segment census ("555" =
    recent, frequent, big spenders). Scoring uses the certified
    percentile channel (exact interpolated quantiles + broadcast
    threshold comparison) rather than a global ntile window — ntile
    sorts the whole customer relation in ONE partition at scale.
    Threshold semantics at ties: score = 1 + #(thresholds < x) for
    monetary/frequency (higher = better), reversed for recency
    (lower days = better). r_score uses strict '<' and f/m use '<='
    so every boundary value lands deterministically in both engines.

    NULL monetary contract (ADVICE r9): per-value NULLs are ignored
    by the sum as usual, and a customer whose values are ALL NULL
    gets mon = 0.0 explicitly — they score against the thresholds as
    genuine zero spenders (and the zeros participate in the monetary
    quantiles), instead of NULL comparisons silently dumping them
    into m_score = 1 while excluding them from the thresholds.
    """
    if n_bins < 2 or n_bins > 10:
        raise ValueError(f"n_bins must be in 2..10, got {n_bins}")
    per_c = (
        df.filter(
            F.col(customer_col).isNotNull()
            & F.col(date_col).isNotNull()
        )
        .groupBy(F.col(customer_col).alias("c"))
        .agg(
            F.datediff(
                F.lit(reference_date).cast("date"),
                F.max(F.col(date_col).cast("date")),
            )
            .cast("double")
            .alias("rec"),
            F.count(F.lit(1)).cast("double").alias("freq"),
            F.coalesce(
                F.sum(
                    _q6(F.col(value_col).cast("double"))
                ).cast("double"),
                F.lit(0.0),
            ).alias("mon"),
        )
    )
    probs = [k / float(n_bins) for k in range(1, n_bins)]
    th = per_c.agg(
        *[
            F.percentile(F.col(m), p).alias(f"{m}_{k}")
            for m in ("rec", "freq", "mon")
            for k, p in enumerate(probs)
        ]
    )
    scored = per_c.crossJoin(F.broadcast(th))
    # recency: MORE days = WORSE -> score counts thresholds the value
    # is strictly below; freq/mon: score counts thresholds strictly
    # above (ties stay in the lower bin — deterministic both engines)
    r_sc = F.lit(1)
    f_sc = F.lit(1)
    m_sc = F.lit(1)
    for k in range(len(probs)):
        r_sc = r_sc + F.when(
            F.col("rec") < F.col(f"rec_{k}"), 1
        ).otherwise(0)
        f_sc = f_sc + F.when(
            F.col("freq") > F.col(f"freq_{k}"), 1
        ).otherwise(0)
        m_sc = m_sc + F.when(
            F.col("mon") > F.col(f"mon_{k}"), 1
        ).otherwise(0)
    return (
        scored.select(
            r_sc.alias("r_score"),
            f_sc.alias("f_score"),
            m_sc.alias("m_score"),
            F.col("mon"),
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(
                F.try_divide(
                    F.sum(F.col("mon").cast("decimal(28,6)")).cast(
                        "double"
                    ),
                    F.count(F.lit(1)).cast("double"),
                ),
                6,
            ).alias("avg_monetary"),
        )
    )


def adstock_transform(
    df: DataFrame,
    value_col: str,
    order_col: str = "date",
    group_col: str = "dataset",
    decay: float = 0.5,
    max_lag: int = 6,
) -> DataFrame:
    """Geometric-decay carryover (adstock) feature -> (group, order,
    value, adstock).

    The standard media-mix-model preprocessing: this period's
    effective pressure is adstock_t = sum_{k=0..L} decay^k * x_{t-k}
    — spend keeps working after the period it lands in. The
    infinite-memory recursion is truncated at ``max_lag`` (decay^L of
    the weight; at 0.5^6 that is 1.6% — the bounded form every lag
    window can compute with NO sequential fold). Feed the transformed
    column to trend_fit / within_estimator to estimate saturation-
    free carryover response.

    Parity: the decay^k weights are Python-float literals injected
    into both engines verbatim (keep ``decay`` binary-exact — 0.5,
    0.25, 0.75 — for hash-certified use); inputs floor-quantized
    decimal(18,6); the weighted sum folds in fixed k order as plain
    doubles (k+1 terms, left-associated). Missing leading lags
    contribute zero (the cold-start convention). One partitioned lag
    window — the same single shuffle as every series operator.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0,1), got {decay}")
    if max_lag < 1 or max_lag > 24:
        raise ValueError(f"max_lag must be in 1..24, got {max_lag}")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        _q6(F.col(value_col).cast("double")).alias("v"),
    )
    w = Window.partitionBy("g").orderBy("o")
    weights = [float(decay) ** k for k in range(max_lag + 1)]
    acc = F.col("v").cast("double") * F.lit(weights[0])
    for k in range(1, max_lag + 1):
        acc = acc + F.coalesce(
            F.lag(F.col("v").cast("double"), k).over(w), F.lit(0.0)
        ) * F.lit(weights[k])
    return base.select(
        F.col("g").alias(group_col),
        F.col("o").alias(order_col),
        F.col("v").cast("double").alias("value"),
        F.round(acc, 6).alias("adstock"),
    )
