"""Alternating least squares matrix factorization on DataFrames.

The classic distributed-recommender / embedding-training workload
(Koren et al.; Spark MLlib's flagship algorithm), rebuilt on the
relational stack so THIS engine owns the whole loop:

    minimize sum_(u,i) (r_ui - x_u . y_i)^2 + lam (|X|^2 + |Y|^2)

Each half-step solves ridge normal equations per entity. The insight
that keeps it relational: the K x K Gram matrix A_u = sum_i y_i y_i^T
and the K-vector b_u = sum_i r_ui y_i are SUMS over the entity's
ratings — so one join (ratings x factors) plus one hash aggregate
with map-side combine produces every entity's normal equations as
K*(K+1)/2 + K columns. Only the tiny dense solve (K x K, K ~ 8-64)
drops to Python — an Arrow-batched mapInPandas over the aggregated
rows (one row per entity, thousands of floats — the 10-100x cheaper
side of the UDF boundary), never over the ratings.

Scale shape per sweep: shuffle ratings by the entity being solved
(twice per iteration, the irreducible ALS exchange), broadcast-join
the opposite factor table when it fits / sort-merge when it doesn't,
and localCheckpoint factor tables between sweeps (the iterative
discipline shared with graph.py). Factor state is (entities x K)
doubles — millions of rows, never driver-side.

Determinism: init factors derive from md5(entity ':' k) (the
sampling-family rule, no rand()), aggregation sums are plain doubles
inside one combine tree — np.linalg.solve and float summation order
make cross-ENGINE bit-equality unattainable (driver contract is
rows-only by design), but the pytest contract pins convergence: RMSE
decreases monotonically and lands under the mean-predictor baseline.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _init_factors(df: DataFrame, id_col: str, k: int) -> DataFrame:
    """Deterministic small init: f_ik = (md5(id:k) % 1000)/1000 - 0.5,
    scaled by 0.1 — the no-rand() rule."""
    comps = [
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col(id_col), F.lit(str(j)))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 1000
            ).cast("double")
            / 1000.0
            - 0.5
        )
        * 0.1
        for j in range(k)
    ]
    return df.select(F.col(id_col), F.array(*comps).alias("vec"))


def _solve_side(
    ratings: DataFrame,
    fixed: DataFrame,
    solve_col: str,
    fixed_col: str,
    k: int,
    lam: float,
) -> DataFrame:
    """One ALS half-step: ridge-solve every ``solve_col`` entity
    against the ``fixed`` factor table -> (solve_col, vec)."""
    joined = ratings.join(
        fixed.select(F.col(fixed_col), F.col("vec").alias("fv")), fixed_col
    )
    aggs = []
    for a in range(k):
        for b in range(a, k):
            aggs.append(
                F.sum(F.col("fv")[a] * F.col("fv")[b]).alias(f"a_{a}_{b}")
            )
    for a in range(k):
        aggs.append(
            F.sum(F.col("r") * F.col("fv")[a]).alias(f"b_{a}")
        )
    eqs = joined.groupBy(solve_col).agg(*aggs)

    def solve(batches):
        import numpy as np  # noqa: PLC0415

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # batched LAPACK: assemble all n Gram matrices as one
            # (n, k, k) tensor and solve them in a single
            # np.linalg.solve call — same gesv routine per slice as the
            # scalar form, ~10x less Python-loop overhead per batch
            A = np.zeros((n, k, k))
            for a in range(k):
                for b in range(a, k):
                    col = pdf[f"a_{a}_{b}"].to_numpy(dtype=float)
                    A[:, a, b] = col
                    A[:, b, a] = col
            A += lam * np.eye(k)
            bv = np.stack(
                [pdf[f"b_{a}"].to_numpy(dtype=float) for a in range(k)],
                axis=1,
            )
            yield pd.DataFrame(
                {solve_col: pdf[solve_col], "vec": np.linalg.solve(A, bv).tolist()}
            )

    out_schema = f"{solve_col} long, vec array<double>"
    return eqs.mapInPandas(solve, out_schema)


def als_normal_eq_exact(
    ratings: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "r",
    k: int = 4,
    top_n: int = 25,
) -> DataFrame:
    """Integer-exact structural twin of one ALS half-step's
    normal-equation build -> per heaviest user: (u, n_items, tr_gram,
    upper_gram, b_sum), all exact int64.

    als_factorize is rows-only by design (np.linalg float order is not
    engine-portable); this twin certifies the mechanism the solve
    consumes — the ratings x factor join and the per-entity hash
    aggregate of Gram/RHS sums — with md5-derived INTEGER factors
    (y_jk = md5(item:k) % 1000, the deterministic init family without
    the float scaling), so every sum is order-free integer arithmetic
    a SQL oracle hash-matches (the ann_ivf_exact pattern).

    Sufficient statistics per user, summed over rated items:
    tr_gram = sum of y.y (the Gram trace), upper_gram = sum over items
    of ((sum y)^2 + y.y)/2 (the upper-triangle total, exact because
    (sum y)^2 and y.y share parity), b_sum = sum of r * (sum y)
    (the RHS total). Same join + aggregate shape as _solve_side, which
    certifies exactly the distributed part; the K x K solve stays in
    the rows-only query. Output bounded to the ``top_n`` heaviest
    users (n_items DESC, u ASC) — a TakeOrdered plan, not a global
    sort.
    """
    r = ratings.select(
        F.col(user_col).cast("long").alias("u"),
        F.col(item_col).cast("long").alias("i"),
        F.col(rating_col).cast("long").alias("r"),
    )
    comps = [
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("i"), F.lit(str(j)))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1000
        for j in range(k)
    ]
    iv = r.select("i").distinct().select(
        "i", F.array(*comps).alias("y")
    )
    zero = F.lit(0).cast("long")
    ysum = F.aggregate("y", zero, lambda a, x: a + x)
    ydot = F.aggregate("y", zero, lambda a, x: a + x * x)
    joined = r.join(iv, "i").select(
        "u", "r", ysum.alias("s"), ydot.alias("q")
    )
    per_user = joined.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("q").cast("long").alias("tr_gram"),
        # (s^2 + q) is even (s^2 and q share parity), so the halving is
        # exact integer arithmetic — shiftright avoids float division.
        F.sum(F.shiftright(F.col("s") * F.col("s") + F.col("q"), 1))
        .cast("long")
        .alias("upper_gram"),
        F.sum(F.col("r") * F.col("s")).cast("long").alias("b_sum"),
    )
    return per_user.orderBy(F.desc("n_items"), F.asc("u")).limit(top_n)


def als_factorize(
    ratings: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "r",
    k: int = 4,
    iters: int = 3,
    lam: float = 0.1,
    track_rmse: str = "each",
) -> tuple[DataFrame, DataFrame, list[float]]:
    """Fit -> (user_factors, item_factors, rmse_list).

    ``track_rmse``: "each" evaluates training RMSE after every sweep
    (iters entries — the convergence-curve evidence, at one extra
    aggregate action per sweep); "final" evaluates once after the last
    sweep (1 entry — the cheap production mode); "none" skips it
    (empty list).
    """
    if track_rmse not in ("each", "final", "none"):
        raise ValueError(f"bad track_rmse: {track_rmse!r}")
    if k < 1 or iters < 1:
        raise ValueError(f"need k >= 1 and iters >= 1, got k={k}, iters={iters}")
    r = ratings.select(
        F.col(user_col).cast("long").alias("u"),
        F.col(item_col).cast("long").alias("i"),
        F.col(rating_col).cast("double").alias("r"),
    ).localCheckpoint(eager=True)
    users = r.select("u").distinct()
    items = r.select("i").distinct()
    # both inits stay LAZY: the initial user factors are never
    # evaluated at all (sweep 1's first half-step replaces them before
    # any consumer runs), and the item init is consumed exactly once —
    # an eager checkpoint of either is a pure extra materialization
    # (measured ~1s of an 8s sf0.1 fit). The iterative checkpoint
    # discipline starts at the first SOLVED factor table below.
    uf = _init_factors(users, "u", k)
    vf = _init_factors(items, "i", k)
    rmse = []

    def eval_rmse():
        pred = (
            r.join(uf.select(F.col("u"), F.col("vec").alias("xu")), "u")
            .join(vf.select(F.col("i"), F.col("vec").alias("yi")), "i")
            .select(
                (
                    F.col("r")
                    - F.aggregate(
                        F.zip_with("xu", "yi", lambda a, b: a * b),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                ).alias("e")
            )
        )
        row = pred.agg(
            F.sqrt(F.avg(F.col("e") * F.col("e"))).alias("rmse")
        ).first()
        rmse.append(float(row["rmse"]))

    for it in range(iters):
        uf_new = _solve_side(r, vf, "u", "i", k, lam).localCheckpoint(
            eager=True
        )
        uf.unpersist()
        uf = uf_new
        vf_new = _solve_side(
            r.select(F.col("i"), F.col("u"), F.col("r")), uf, "i", "u", k, lam
        ).localCheckpoint(eager=True)
        vf.unpersist()
        vf = vf_new
        if track_rmse == "each" or (
            track_rmse == "final" and it == iters - 1
        ):
            eval_rmse()
    return uf, vf, rmse
