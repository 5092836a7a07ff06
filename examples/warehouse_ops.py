"""Warehouse operations tour: layout, maintenance, compliance.

Run from the repo root:  python examples/warehouse_ops.py

The storage-side operations a 100 TB deployment leans on, end-to-end
on a temp warehouse:

  1. range-clustered write        (file pruning for range filters)
  2. bucketed write + join        (co-located equality joins, 0 shuffle)
  3. incremental rollup           (absorb a delta, never rescan facts)
  4. hard delete                  (right-to-be-forgotten rewrite)
  5. schema-evolution read        (append-only tables growing columns)
  6. compaction                   (small-file repair after appends)
  7. z-order write                (data skipping on TWO filter columns)
  8. custom Python DataSource     (blob cache as queryable + streaming
                                   source with pushdown)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from econdatapipeline_spark import get_spark
from econdatapipeline_spark.operators.increment import maintain_rollup, partial_agg
from econdatapipeline_spark.sources.warehouse import Warehouse


def main() -> None:
    spark = get_spark(
        app_name="warehouse_ops", master="local[4]", shuffle_partitions=4
    )
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_ops_"))

    # 1. Range clustering: each file gets a disjoint [min, max] on the
    #    filter key, so a day-slice query opens ~1 file out of many.
    events = spark.range(0, 100_000).select(
        (F.col("id") % 365).alias("day"),
        (F.col("id") % 97).alias("user_id"),
        (F.col("id") * 1.7).alias("value"),
    )
    wh.write_clustered(events, "events", ["day"], num_files=16)
    one_day = wh.read("events").filter(F.col("day") == 42)
    print(f"1. clustered: day-slice reads {one_day.count()} rows "
          "(file pruning via footer stats)")

    # 2. Bucketed join: both sides pre-hashed on the key -> zero exchange.
    users = spark.range(0, 97).select(
        F.col("id").alias("user_id"), F.concat(F.lit("u"), F.col("id")).alias("name")
    )
    wh.write_bucketed(events, "events_b", ["user_id"], num_buckets=8)
    wh.write_bucketed(users, "users_b", ["user_id"], num_buckets=8)
    joined = spark.table("events_b").join(spark.table("users_b"), "user_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    print(f"2. bucketed join: {joined.count()} rows, "
          f"exchange-free: {'Exchange hashpartitioning' not in plan}")

    # 3. Incremental rollup: day 0-299 materialized, days 300+ arrive as
    #    a delta; the rollup absorbs the delta without rescanning facts.
    hist = partial_agg(
        wh.read("events").filter(F.col("day") < 300), ["user_id"], ["value"], "n"
    )
    delta = partial_agg(
        wh.read("events").filter(F.col("day") >= 300), ["user_id"], ["value"], "n"
    )
    rolled = maintain_rollup(hist, delta, ["user_id"], ["value"], "n")
    full = partial_agg(wh.read("events"), ["user_id"], ["value"], "n")
    same = {
        (r["user_id"], float(r["value"]), r["n"]) for r in rolled.collect()
    } == {(r["user_id"], float(r["value"]), r["n"]) for r in full.collect()}
    print(f"3. incremental rollup == from-scratch aggregate: {same}")

    # 4. Right to be forgotten: physically remove one user's rows.
    removed = wh.delete_rows("events", F.col("user_id") == 13)
    print(f"4. hard delete: {removed} rows removed, "
          f"{wh.read('events').filter(F.col('user_id') == 13).count()} remain")

    # 5. Schema evolution: a later append carries a new column.
    wh.append(
        spark.createDataFrame(
            [(400, 7, 1.0, "backfill")], "day long, user_id long, value double, src string"
        ),
        "events",
    )
    evolved = wh.read("events", merge_schema=True)
    print(f"5. schema evolution: columns now {evolved.columns}")

    # 6. Compaction: repair the small-file tail the append left.
    n_files = wh.compact("events")
    print(f"6. compacted to {n_files} file(s)")

    # 7. Z-order: one layout that prunes on BOTH day and user_id.
    wh.write_zordered(
        wh.read("events", merge_schema=True).select("day", "user_id", "value"),
        "events_z", "day", "user_id", num_files=8, bits=8,
    )
    print(f"7. z-ordered: {wh.read('events_z').count()} rows laid out on "
          "the (day, user_id) Morton curve")

    # 8. The FRED blob cache as a REAL source: equality filters prune
    #    whole files; readStream emits only new observations.
    import json

    from econdatapipeline_spark.sources.fred_source import FredReplayDataSource

    cache = tempfile.mkdtemp(prefix="fred_cache_")
    for sid, vals in {"GDP": ["1.1", "1.2"], "UNRATE": ["3.5", "3.6"]}.items():
        obs = [{"date": f"2023-0{i+1}-01", "value": v} for i, v in enumerate(vals)]
        with open(os.path.join(cache, f"{sid}.json"), "w") as fh:
            json.dump({"observations": obs}, fh)
    spark.dataSource.register(FredReplayDataSource)
    src = spark.read.format("fred_replay").option("path", cache).load()
    gdp = src.filter(F.col("series_id") == "GDP")
    print(f"8. datasource: {src.count()} cached observations; "
          f"series filter reads {gdp.count()} (partition-pruned)")

    spark.stop()
    print("warehouse ops tour done")


if __name__ == "__main__":
    main()
