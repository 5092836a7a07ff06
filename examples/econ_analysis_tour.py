"""Econometrics + survival tour: the round-7 analysis surface on the
benchmark star schema.

Run from the repo root:  python examples/econ_analysis_tour.py

The analyst's afternoon the reference engine could not serve: build a
monthly indicator panel from raw orders, test it (unit roots, Granger
lead/lag, HAC-honest trend errors, rolling co-movement), then switch
to the customer domain for retention survival (Kaplan-Meier curve,
Cox hazard ratio between segments) — every statistic from the same
deterministic, oracle-certified operators the driver contract runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from econdatapipeline_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(
        app_name="econ_analysis_tour", master="local[4]",
        shuffle_partitions=4,
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")

    # 1. the indicator panel: monthly revenue + order count per priority
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("dataset"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("date"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
    )

    # 2. is the revenue series stationary enough to regress?
    from econdatapipeline_spark.operators.timeseries import (
        adf_test,
        granger_causality,
        newey_west,
        rolling_corr,
    )

    adf = adf_test(
        monthly.select("dataset", "date", F.col("revenue").alias("value"))
    )
    print("ADF unit-root stats (strongly negative = stationary):")
    adf.orderBy("dataset").show(truncate=False)

    # 3. does order count LEAD revenue?
    gc = granger_causality(monthly, "revenue", "n_orders")
    print("Granger: lagged order count -> revenue (F-stat):")
    gc.orderBy("dataset").show(truncate=False)

    # 4. trend slope with HAC-honest errors
    series = monthly.select(
        "dataset",
        "date",
        F.datediff("date", F.lit("1992-01-01").cast("date"))
        .cast("double")
        .alias("x"),
        F.col("revenue").alias("value"),
    )
    nw = newey_west(series, "value", "x", "date", "dataset", lags=4)
    print("trend slope, OLS vs Newey-West se (autocorrelation-honest):")
    nw.orderBy("dataset").show(truncate=False)

    # 5. co-movement drift between the two indicators
    rc = rolling_corr(monthly, "n_orders", "revenue", "date", "dataset")
    print("latest 12-month rolling correlation per priority:")
    w = Window.partitionBy("dataset").orderBy(F.col("date").desc())
    rc.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    ).select("dataset", "date", "n_w", "corr").orderBy("dataset").show(
        truncate=False
    )

    # 6. customer retention: time to second order, BUILDING vs rest
    from econdatapipeline_spark.operators.survival import (
        cox_ph,
        kaplan_meier,
        median_survival,
    )

    wcust = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc()
    )
    horizon = orders.agg(F.max("o_orderdate").alias("h"))
    first = (
        orders.select(
            "o_custkey",
            "o_orderdate",
            F.row_number().over(wcust).alias("rk"),
            F.lead("o_orderdate").over(wcust).alias("nxt"),
        )
        .filter(F.col("rk") == 1)
        .crossJoin(F.broadcast(horizon))
        .join(
            F.broadcast(
                customer.select(
                    "c_custkey",
                    (F.col("c_mktsegment") == "BUILDING")
                    .cast("int")
                    .alias("x"),
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.when(
                F.col("nxt").isNotNull(),
                F.datediff("nxt", "o_orderdate"),
            )
            .otherwise(F.datediff("h", "o_orderdate"))
            .cast("long")
            .alias("duration"),
            F.col("nxt").isNotNull().cast("int").alias("event"),
            "x",
        )
    )
    km = kaplan_meier(first)
    med = median_survival(km).first()["median_t"]
    print(f"median days to repeat purchase: {med}")
    cox = cox_ph(first, "duration", "event", "x").first()
    print(
        "Cox BUILDING-vs-rest hazard ratio: "
        f"hr={cox['hr']} beta={cox['beta']} z={cox['z']} "
        f"(n={cox['n']}, events={cox['n_events']})"
    )
    # --- round-9 additions: trend tails, volatility, structure ---
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("dataset"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("date"),
    ).agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast(
                "double"
            )
            / 1e6
        ).alias("value")
    )

    from econdatapipeline_spark.operators.timeseries import (
        arch_test,
        ar_fit,
        binseg_changepoints,
        periodogram,
        quantile_regression,
    )

    series = monthly.select(
        "dataset",
        "date",
        (
            F.datediff(F.col("date"), F.lit("1992-01-01").cast("date"))
            .cast("double")
            / 1000.0
        ).alias("x"),
        F.col("value").alias("y"),
    )
    q90 = quantile_regression(
        series, "y", "x", tau=0.9, group_col="dataset"
    ).orderBy("dataset").first()
    print(
        f"90th-percentile revenue trend ({q90['dataset']}): "
        f"slope={q90['slope']} pinball={q90['pinball_loss']}"
    )
    arch = arch_test(monthly, "value", "date", "dataset").orderBy(
        "dataset"
    ).first()
    print(
        f"ARCH LM ({arch['dataset']}): lm={arch['lm_stat']} "
        f"volatility clustering rejected at 5%: {arch['reject_5pct']}"
    )
    ar2 = ar_fit(monthly, "value", "date", "dataset", order=2).orderBy(
        "dataset"
    ).first()
    print(
        f"AR(2) fit ({ar2['dataset']}): phi1={ar2['phi_1']} "
        f"phi2={ar2['phi_2']} r2={ar2['r2']}"
    )
    pk = (
        periodogram(monthly, "value", "date", "dataset", max_k=12)
        .orderBy(F.col("power").desc_nulls_last())
        .first()
    )
    print(
        f"dominant cycle ({pk['dataset']}): period={pk['period']} "
        f"months (k={pk['k']}, power={pk['power']})"
    )
    breaks = binseg_changepoints(
        monthly, "dataset", "date", "value", depth=2, min_gain=1.0
    ).collect()
    print(f"level shifts found across priorities: {len(breaks)}")

    # --- round-10 additions: decomposition and the system view ---
    from econdatapipeline_spark.operators.timeseries import (
        cochrane_orcutt,
        hp_filter,
        seasonal_decompose,
        var_fit,
    )

    # Hodrick-Prescott trend-cycle: the canonical econ filter, exact
    # banded solve per series (quarterly revenue, lam=1600).
    quarterly = (
        orders
        .groupBy(
            F.col("o_orderpriority").alias("dataset"),
            F.date_trunc("quarter", "o_orderdate").cast("date").alias("date"),
        )
        .agg((F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double") / 1e6).alias("rev_m"))
    )
    hp = hp_filter(quarterly, "rev_m", lam=1600.0).orderBy("dataset", "date")
    last = hp.filter(F.col("dataset") == "1-URGENT").orderBy(F.col("date").desc()).first()
    print(
        f"HP(1600) {last['dataset']} {last['date']}: value={last['value']:.2f}M "
        f"trend={last['trend']:.2f}M cycle={last['cycle']:+.2f}M"
    )

    # Classical additive decomposition (trend + seasonal + remainder).
    sd = seasonal_decompose(monthly, "value", lam=129600.0)
    amp = (
        sd.groupBy("dataset")
        .agg((F.max("seasonal") - F.min("seasonal")).alias("seasonal_amplitude"))
        .orderBy(F.col("seasonal_amplitude").desc())
        .first()
    )
    print(
        f"largest seasonal amplitude: {amp['dataset']} "
        f"({amp['seasonal_amplitude']:.2f} k$ peak-to-trough)"
    )

    # AR(1)-corrected regression: rho and the GLS slope vs plain OLS.
    xy = orders.groupBy(
        F.col("o_orderpriority").alias("dataset"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("date"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double") / 1e3).alias("y"),
        F.count(F.lit(1)).cast("double").alias("x"),
    )
    co = cochrane_orcutt(xy, "y", "x").orderBy("dataset").first()
    print(
        f"Cochrane-Orcutt ({co['dataset']}): rho={co['rho']} "
        f"beta OLS={co['beta_ols']} -> GLS={co['beta_gls']}"
    )

    # VAR(2) over three co-moving monthly series, per priority.
    m3 = (
        orders
        .groupBy(
            F.col("o_orderpriority").alias("dataset"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("date"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double") / 1e3).alias("rev"),
            F.count(F.lit(1)).cast("double").alias("cnt"),
            (F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double") / 1e3
             / F.count(F.lit(1))).alias("avgp"),
        )
    )
    vf = var_fit(m3, ["rev", "cnt", "avgp"], lags=2).filter(
        (F.col("dataset") == "1-URGENT") & (F.col("equation") == "rev")
    ).first()
    print(
        f"VAR(2) rev equation ({vf['dataset']}): "
        f"rev_l1={vf['rev_l1']} cnt_l1={vf['cnt_l1']} sigma2={vf['sigma2']}"
    )

    # --- round-11 additions: the causal readout + the cycle band ---
    from econdatapipeline_spark.operators.timeseries import (
        bk_filter,
        var_irf_orth,
    )

    # Which shock drives revenue? Cholesky ordering rev->cnt->avgp,
    # cumulative FEVD shares at horizon 2.
    fevd = (
        var_irf_orth(m3, ["rev", "cnt", "avgp"], lags=2, horizons=2)
        .filter(
            (F.col("dataset") == "1-URGENT")
            & (F.col("response") == "rev")
            & (F.col("h") == 2)
        )
        .orderBy("shock")
        .collect()
    )
    shares = ", ".join(
        f"{r['shock']}={r['fevd_share']}" for r in fevd
    )
    print(f"FEVD of rev at h=2 (1-URGENT): {shares}")

    # Band-pass business-cycle component (6..32-month band, K=12):
    # the BK cross-check on the HP cycle.
    bk = bk_filter(monthly, "value")
    swing = (
        bk.filter(F.col("cycle").isNotNull())
        .groupBy("dataset")
        .agg((F.max("cycle") - F.min("cycle")).alias("band_swing"))
        .orderBy(F.col("band_swing").desc())
        .first()
    )
    print(
        f"largest 6-32mo band-pass swing: {swing['dataset']} "
        f"({swing['band_swing']:.2f} k$ peak-to-trough)"
    )

    # Multiplicative decomposition: the seasonal FACTOR view (mean-1
    # index) of the same monthly revenue.
    sdm = seasonal_decompose(monthly, "value", model="multiplicative")
    fac = (
        sdm.filter(F.col("seasonal").isNotNull())
        .groupBy("dataset")
        .agg(
            F.max("seasonal").alias("peak_factor"),
            F.min("seasonal").alias("trough_factor"),
        )
        .orderBy(F.col("peak_factor").desc())
        .first()
    )
    print(
        f"multiplicative seasonal factors ({fac['dataset']}): "
        f"peak x{fac['peak_factor']} trough x{fac['trough_factor']}"
    )

    print("econ analysis tour done")


if __name__ == "__main__":
    main()
