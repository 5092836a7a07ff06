"""Streaming FRED source -> MERGE pipeline: live ingestion end-to-end."""

from __future__ import annotations

import json
import os

from econdatapipeline_spark.registry import FRED_SPECS
from econdatapipeline_spark.sources.warehouse import Warehouse
from econdatapipeline_spark.streaming.live_ingest import start_fred_live_ingest


def _write_payload(cache, sid, obs):
    payload = {"observations": [{"date": d, "value": v} for d, v in obs]}
    with open(os.path.join(cache, f"{sid}.json"), "w") as fh:
        json.dump(payload, fh)


def test_live_ingest_merges_increments_with_audit(spark, tmp_path):
    spec = next(s for s in FRED_SPECS if s.frequency == "m")
    cache = str(tmp_path / "cache")
    os.makedirs(cache)
    _write_payload(cache, spec.fred_series_id, [("2023-01-01", "100.5"), ("2023-02-01", ".")])

    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    q = start_fred_live_ingest(spark, cache, wh, [spec], ckpt)
    q.awaitTermination(120)
    t1 = wh.read(spec.name).collect()
    # '.' sentinel dropped by the normalizer; one real row landed
    assert [(str(r["date"]), float(r[spec.value_column])) for r in t1] == [
        ("2023-01-01", 100.5)
    ]

    # a NEW observation appends to the payload -> next run merges ONLY it
    _write_payload(
        cache,
        spec.fred_series_id,
        [("2023-01-01", "100.5"), ("2023-02-01", "."), ("2023-03-01", "101.25")],
    )
    q = start_fred_live_ingest(spark, cache, wh, [spec], ckpt)
    q.awaitTermination(120)
    t2 = sorted(
        (str(r["date"]), float(r[spec.value_column])) for r in wh.read(spec.name).collect()
    )
    assert t2 == [("2023-01-01", 100.5), ("2023-03-01", 101.25)]

    # inserts carry no revision rows (the reference's contract: the
    # audit log records CHANGED values only)
    assert wh.revisions().filter(f"dataset = '{spec.name}'").count() == 0

    # an APPENDED restatement (same date, new value) arrives on the
    # stream like any appended observation; the MERGE detects the
    # value change and logs the revision
    _write_payload(
        cache,
        spec.fred_series_id,
        [("2023-01-01", "100.5"), ("2023-02-01", "."),
         ("2023-03-01", "101.25"), ("2023-01-01", "100.9")],
    )
    q = start_fred_live_ingest(spark, cache, wh, [spec], ckpt)
    q.awaitTermination(120)
    revs = wh.revisions().filter(f"dataset = '{spec.name}'").collect()
    assert [(r["data_date"], r["old_value"], r["new_value"]) for r in revs] == [
        ("2023-01-01", 100.5, 100.9)
    ]
    t3 = dict(
        (str(r["date"]), float(r[spec.value_column])) for r in wh.read(spec.name).collect()
    )
    assert t3["2023-01-01"] == 100.9

    # replaying with the same checkpoint and no new data is a no-op
    q = start_fred_live_ingest(spark, cache, wh, [spec], ckpt)
    q.awaitTermination(120)
    assert wh.revisions().filter(f"dataset = '{spec.name}'").count() == 1
