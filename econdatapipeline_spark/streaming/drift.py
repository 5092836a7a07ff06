"""Streaming distribution-drift monitoring (windowed PSI vs a baseline).

The production-monitoring twin of operators/stats.psi_drift: score every
event-time window of a metric stream against a frozen baseline
distribution and emit an alert row per window. The stream side is ONE
windowed aggregation — per-window bin counts build as a one-hot array
sum inside the same groupBy (no second streaming aggregation, which
append mode forbids) — and the PSI itself is a pure column expression
over that array against baseline literals folded into the plan. State
is therefore exactly the open windows' bin arrays; the baseline ships
with the plan, not through a join.

PSI convention (matches stats.psi_drift's scale thresholds): < 0.1
stable, 0.1-0.2 drifting, > 0.2 alert. Bins outside [lo, hi) clamp into
the edge bins so probability mass is conserved; empty bins smooth by
Laplace 0.5 on BOTH sides, keeping every log finite without biasing a
well-populated comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi_monitor(
    events: DataFrame,
    baseline_counts: list[float],
    value_col: str = "value",
    ts_col: str = "ts",
    window: str = "1 hour",
    lo: float = 0.0,
    hi: float = 1.0,
    threshold: float = 0.2,
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed PSI of ``value_col`` vs a frozen baseline histogram.

    ``baseline_counts``: per-bin counts (or fractions) of the baseline
    distribution; its length fixes the bin count. Works on batch and
    streaming frames alike (the streaming path needs the watermark for
    append-mode window closure). Output: (window_start, window_end, n,
    psi, drifted).
    """
    bins = len(baseline_counts)
    if bins < 2:
        raise ValueError(f"need >= 2 baseline bins, got {bins}")
    if hi <= lo:
        raise ValueError(f"hi must be > lo, got lo={lo}, hi={hi}")
    width = (hi - lo) / bins
    c = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(F.floor((c - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    )
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    counts = src.withColumn("__b", b).groupBy(
        F.window(F.col(ts_col), window).alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.array(
            *[
                F.sum(F.when(F.col("__b") == i, 1).otherwise(0))
                for i in range(bins)
            ]
        ).alias("cnts"),
    )
    base_total = float(sum(baseline_counts)) + 0.5 * bins
    q = [
        F.lit((float(bc) + 0.5) / base_total) for bc in baseline_counts
    ]
    smoothed_n = F.col("n").cast("double") + F.lit(0.5 * bins)
    terms = [
        (
            (F.col("cnts")[i] + F.lit(0.5)) / smoothed_n - q[i]
        )
        * F.log(((F.col("cnts")[i] + F.lit(0.5)) / smoothed_n) / q[i])
        for i in range(bins)
    ]
    psi = sum(terms[1:], terms[0])
    return counts.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("n").cast("long").alias("n"),
        F.round(psi, 6).alias("psi"),
        (psi > threshold).alias("drifted"),
    )
