"""Python DataSource API: FRED replay source with partition pruning."""

from __future__ import annotations

import json
import os

import pytest


@pytest.fixture()
def cache_dir(tmp_path):
    d = tmp_path / "fred-cache"
    d.mkdir()
    for sid, obs in {
        "GDP": [("2023-01-01", "1204.6"), ("2023-04-01", "1210.1")],
        "UNRATE": [("2023-01-01", "3.5"), ("2023-04-01", "."), ("2023-07-01", "3.8")],
        "CPI": [("2023-01-01", "299.2")],
    }.items():
        payload = {"observations": [{"date": d_, "value": v} for d_, v in obs]}
        (d / f"{sid}.json").write_text(json.dumps(payload))
    (d / "notes.txt").write_text("ignored")  # non-json files skipped
    return str(d)


def test_fred_replay_reads_all_series(spark, cache_dir):
    from econdatapipeline_spark.sources.fred_source import FredReplayDataSource

    spark.dataSource.register(FredReplayDataSource)
    df = spark.read.format("fred_replay").option("path", cache_dir).load()
    rows = df.collect()
    assert len(rows) == 6
    assert {r["series_id"] for r in rows} == {"GDP", "UNRATE", "CPI"}
    # the '.' missing sentinel arrives raw; typing is the normalizer's job
    assert ("UNRATE", "2023-04-01", ".") in {
        (r["series_id"], r["obs_date"], r["value_raw"]) for r in rows
    }


def test_fred_replay_equality_filter_prunes_partitions(spark, cache_dir):
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from econdatapipeline_spark.sources.fred_source import (
        FredReplayDataSource,
        FredReplayReader,
    )

    # unit contract: EqualTo/In on series_id prune the partition list
    # BEFORE any file is opened; other filters are handed back to Spark
    r = FredReplayReader({"path": cache_dir})
    leftover = list(r.pushFilters([EqualTo(("series_id",), "GDP"),
                                   GreaterThan(("obs_date",), "2023-01-01")]))
    assert [type(f).__name__ for f in leftover] == ["GreaterThan"]
    parts = r.partitions()
    assert [p.series_id for p in parts] == ["GDP"]

    r2 = FredReplayReader({"path": cache_dir})
    assert list(r2.pushFilters([In(("series_id",), ("GDP", "CPI"))])) == []
    assert sorted(p.series_id for p in r2.partitions()) == ["CPI", "GDP"]

    # e2e through the engine: the filtered read returns only GDP rows
    spark.dataSource.register(FredReplayDataSource)
    df = spark.read.format("fred_replay").option("path", cache_dir).load()
    got = df.filter(df.series_id == "GDP").collect()
    assert {r["series_id"] for r in got} == {"GDP"} and len(got) == 2


def test_fred_replay_feeds_the_normalizer(spark, cache_dir):
    """The source's raw rows flow into the existing FRED normalizer
    unchanged — cache directory as queryable, typed table."""
    from pyspark.sql import functions as F

    from econdatapipeline_spark.sources.fred_source import FredReplayDataSource

    spark.dataSource.register(FredReplayDataSource)
    df = (
        spark.read.format("fred_replay").option("path", cache_dir).load()
        .filter(F.col("series_id") == "UNRATE")
    )
    typed = df.select(
        F.col("obs_date").cast("date").alias("date"),
        F.expr("try_cast(nullif(value_raw, '.') AS double)").alias("value"),
    ).orderBy("date")
    rows = typed.collect()
    assert [r["value"] for r in rows] == [3.5, None, 3.8]


def test_fred_replay_streams_only_new_observations(spark, cache_dir, tmp_path):
    """readStream over the cache: batch 1 sees everything, appending a
    new observation + re-running the same checkpoint emits ONLY the
    new row (per-series observation-count offsets)."""
    import json as _json

    from econdatapipeline_spark.sources.fred_source import FredReplayDataSource

    spark.dataSource.register(FredReplayDataSource)
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        got: list = []

        def sink(batch_df, _bid):
            got.extend(batch_df.collect())

        q = (
            spark.readStream.format("fred_replay").option("path", cache_dir).load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    first = run_once()
    assert len(first) == 6  # all observations on the initial batch

    # append one new GDP observation (FRED payloads only grow)
    p = os.path.join(cache_dir, "GDP.json")
    payload = _json.load(open(p))
    payload["observations"].append({"date": "2023-07-01", "value": "1222.9"})
    open(p, "w").write(_json.dumps(payload))

    second = run_once()
    assert [(r["series_id"], r["obs_date"], r["value_raw"]) for r in second] == [
        ("GDP", "2023-07-01", "1222.9")
    ]


def test_fred_replay_conjunctive_filters_intersect(spark, cache_dir):
    """Regression: two pushed series_id predicates must INTERSECT —
    applying only the last (and consuming both) returned rows the
    query excluded."""
    from pyspark.sql import functions as F

    from econdatapipeline_spark.sources.fred_source import FredReplayDataSource

    spark.dataSource.register(FredReplayDataSource)
    df = spark.read.format("fred_replay").option("path", cache_dir).load()
    contradictory = df.filter(F.col("series_id") == "GDP").filter(
        F.col("series_id").isin("CPI", "UNRATE")
    )
    assert contradictory.count() == 0
    overlapping = df.filter(F.col("series_id").isin("GDP", "CPI")).filter(
        F.col("series_id").isin("GDP", "UNRATE")
    )
    assert {r["series_id"] for r in overlapping.collect()} == {"GDP"}
