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

    print("econ analysis tour done")


if __name__ == "__main__":
    main()
