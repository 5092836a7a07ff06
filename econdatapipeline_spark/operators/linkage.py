"""Probabilistic record linkage: Fellegi-Sunter with EM estimation.

The Splink/Dedupe shape (Fellegi & Sunter 1969; Winkler's EM
estimation) on the Spark relational stack: candidate pairs carry a
binary agreement vector over K comparison fields; the latent-class
model

    P(pair is a match) = p
    P(field k agrees | match)     = m_k
    P(field k agrees | non-match) = u_k

is fit by EM, where every iteration is ONE aggregate over the pairs:

    E: r_i = p * prod_k m-term / (p * prod_k m-term + (1-p) * prod u)
    M: p = mean(r);  m_k = sum(r * g_k) / sum(r);
       u_k = sum((1-r) * g_k) / sum(1-r)

Candidate generation is the caller's blocking scheme (fuzzy_name_pairs'
symmetric deletes, a key equi-join, dedup's LSH buckets) — this module
starts from pairs, which is what keeps it scale-safe: EM cost is
O(pairs) per iteration with map-side combine, and the parameter state
is K-sized scalars, never data-sized.

Determinism discipline: per-pair responsibilities are quantized to
decimal(18,9) before the sufficient-statistic sums (exact,
summation-order-free); M-step divisions are then plain IEEE doubles of
exact components, so the parameter trajectory — and therefore every
match decision — reproduces bit-for-bit on any engine or layout. The
driver-sized `.first()` per iteration moves 2K+2 scalars (the bpe.py
1-row argmax precedent).

No reference analog (the reference joins on exact dates only); this is
the public F-S/EM formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _posterior(agree_cols, p, m, u):
    num = F.lit(p)
    den = F.lit(1.0 - p)
    for k, c in enumerate(agree_cols):
        num = num * F.when(F.col(c), F.lit(m[k])).otherwise(F.lit(1.0 - m[k]))
        den = den * F.when(F.col(c), F.lit(u[k])).otherwise(F.lit(1.0 - u[k]))
    return num / (num + den)


def fs_em(
    pairs: DataFrame,
    agree_cols: list[str],
    iters: int = 3,
    init_p: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> tuple[float, list[float], list[float]]:
    """Fit (p, m[], u[]) by ``iters`` EM sweeps over the pair table.

    ``agree_cols`` are boolean columns (the comparison vector). Returns
    plain floats so callers can fold them into scoring plans as
    literals. Degenerate sweeps (all-match or all-non-match posteriors)
    keep the previous parameter rather than dividing by zero.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not agree_cols:
        raise ValueError("need at least one agreement column")
    p = float(init_p)
    m = [float(init_m)] * len(agree_cols)
    u = [float(init_u)] * len(agree_cols)
    for _ in range(iters):
        r = _posterior(agree_cols, p, m, u).cast("decimal(18,9)")
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(r).alias("sr"),
        ]
        for k, c in enumerate(agree_cols):
            g = F.when(F.col(c), 1).otherwise(0)
            aggs.append(F.sum(r * g).alias(f"srg{k}"))
            aggs.append(F.sum(g).cast("long").alias(f"cg{k}"))
        row = pairs.agg(*aggs).first()
        n, sr = row["n"], row["sr"]  # sr is an exact Decimal
        if n == 0:
            break
        nm = n - sr  # exact Decimal: sum of (1 - r)
        # M-step params quantize to 9 decimals (the sampling-family
        # floor(x*1e9+0.5) idiom) so the parameter trajectory — hence
        # every downstream match decision — survives the one place a
        # stray double ulp could creep in (decimal->double conversion
        # of huge sums) and stays bit-identical to the SQL oracle.
        p = _q9(float(sr) / n)
        for k in range(len(agree_cols)):
            srg = row[f"srg{k}"]
            if float(sr) > 0.0:
                m[k] = _q9(float(srg) / float(sr))
            if float(nm) > 0.0:
                u[k] = _q9(float(row[f"cg{k}"] - srg) / float(nm))
    return p, m, u


def _q9(x: float) -> float:
    import math

    return math.floor(x * 1e9 + 0.5) / 1e9


def fs_score(
    pairs: DataFrame,
    agree_cols: list[str],
    p: float,
    m: list[float],
    u: list[float],
    threshold: float = 0.5,
) -> DataFrame:
    """Score pairs under fixed parameters -> pairs + (posterior,
    match_weight, is_match). match_weight is the classic sum of
    log2(m/u) evidence terms; posterior is the calibrated probability
    the threshold applies to."""
    # The threshold compares the decimal(18,9)-quantized posterior, not
    # the raw double — the same value the EM sums saw, so the match set
    # is exactly reproducible by the SQL oracle.
    post = _posterior(agree_cols, p, m, u).cast("decimal(18,9)")
    weight = F.lit(0.0)
    for k, c in enumerate(agree_cols):
        weight = weight + F.when(
            F.col(c), F.lit(float(_log2(m[k] / u[k])))
        ).otherwise(F.lit(float(_log2((1.0 - m[k]) / (1.0 - u[k])))))
    return pairs.select(
        "*",
        F.round(post.cast("double"), 6).alias("posterior"),
        F.round(weight, 6).alias("match_weight"),
        (post >= F.lit(threshold)).alias("is_match"),
    )


def _log2(x: float) -> float:
    import math

    return math.log2(x)


def fs_linkage_summary(
    pairs: DataFrame,
    agree_cols: list[str],
    iters: int = 3,
    init_p: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
    threshold: float = 0.5,
) -> DataFrame:
    """EM fit + one summary row: (n_pairs, n_match, p, m_<k>..., u_<k>...).

    The linkage-run report card: how many candidate pairs, how many
    resolved as matches under the learned model, and the learned
    per-field reliability (m high + u low = a discriminative field;
    m ~ u = a field EM learned to ignore)."""
    p, m, u = fs_em(pairs, agree_cols, iters, init_p, init_m, init_u)
    scored = fs_score(pairs, agree_cols, p, m, u, threshold)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("is_match"), 1).otherwise(0))
        .cast("long")
        .alias("n_match"),
        F.round(F.lit(p), 6).alias("p"),
    ]
    for k, c in enumerate(agree_cols):
        aggs.append(F.round(F.lit(m[k]), 6).alias(f"m_{c}"))
        aggs.append(F.round(F.lit(u[k]), 6).alias(f"u_{c}"))
    return scored.agg(*aggs)
