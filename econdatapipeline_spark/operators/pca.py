"""Top principal component by matrix-free power iteration.

The embedding-quality workhorse ("is there one dominant direction?
how anisotropic is this space?") without ever materializing the d x d
covariance: each power-iteration step needs only

    s = X_c^T (X_c v)     (X_c = mean-centered data)

— per row ONE dot product against the broadcast-literal v, then d
quantized column sums. That is a single hash aggregate per round over
the pinned input; v itself stays on the driver (d doubles), so the
loop is the mmr_select/bpe_train pattern: driver-bounded by the
literal round count, per-round work fully distributed, nothing driver
-side ever grows with rows.

Determinism (the replay contract): per-row terms are
decimal(28,12)-quantized before every sum; the driver's normalization
uses LEFT-ASSOCIATIVE float accumulation and floor(x*1e9 + 0.5)/1e9
half-up quantization — exactly the expression tree the SQL oracle
generates — so every round's v is byte-identical on both engines.
Power iteration's sign/limit depends only on the deterministic init
(uniform 1/sqrt(d)), and the output is DEFINED as the state after
``rounds`` steps, not as a converged limit.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _q9(x: float) -> float:
    return math.floor(x * 1e9 + 0.5) / 1e9


def pca_power(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int = 64,
    rounds: int = 8,
) -> DataFrame:
    """Top principal component -> one row per dimension:
    (dim, loading, eigenvalue, explained).

    ``eigenvalue`` is the Rayleigh estimate ||X_c^T X_c v|| / n after
    the final round; ``explained`` divides it by the total variance
    (sum of per-dimension variances).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if dims < 1:
        raise ValueError(f"dims must be >= 1, got {dims}")
    spark = df.sparkSession
    x = df.select(F.col(vec_col).alias("v")).localCheckpoint(eager=True)

    def e(k: int):  # 1-based element as double
        return F.element_at(F.col("v"), k).cast("double")

    stats = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(e(k).cast("decimal(28,12)")).alias(f"s{k}")
            for k in range(1, dims + 1)
        ],
        *[
            F.sum((e(k) * e(k)).cast("decimal(38,12)")).alias(f"q{k}")
            for k in range(1, dims + 1)
        ],
    ).collect()[0]
    n = stats["n"]
    if n == 0:
        return spark.createDataFrame(
            [], "dim int, loading double, eigenvalue double, explained double"
        )
    mu = [float(stats[f"s{k}"]) / n for k in range(1, dims + 1)]
    tv = 0.0
    for k in range(1, dims + 1):
        tv += float(stats[f"q{k}"]) / n - mu[k - 1] * mu[k - 1]

    def centered(k: int):
        return e(k) - F.lit(mu[k - 1])

    v = [_q9(1.0 / math.sqrt(dims))] * dims
    norm = 0.0
    for _ in range(rounds):
        # w = x_c . v as the same left-assoc chain the oracle writes
        w = F.lit(0.0)
        for k in range(1, dims + 1):
            w = w + centered(k) * F.lit(v[k - 1])
        sums = x.select(w.alias("w"), "v").agg(
            *[
                F.sum(
                    (F.col("w") * centered(k)).cast("decimal(28,12)")
                ).alias(f"s{k}")
                for k in range(1, dims + 1)
            ]
        ).collect()[0]
        s = [float(sums[f"s{k}"] or 0) for k in range(1, dims + 1)]
        acc = 0.0
        for sk in s:
            acc += sk * sk
        norm = math.sqrt(acc)
        if norm > 0:
            v = [_q9(sk / norm) for sk in s]
    lam = norm / n if n else 0.0
    explained = lam / tv if tv > 0 else 0.0
    lam_q = math.floor(lam * 1e6 + 0.5) / 1e6
    exp_q = math.floor(explained * 1e6 + 0.5) / 1e6
    return spark.createDataFrame(
        [(k, v[k - 1], lam_q, exp_q) for k in range(1, dims + 1)],
        "dim int, loading double, eigenvalue double, explained double",
    )
