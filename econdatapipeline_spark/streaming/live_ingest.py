"""Live FRED ingestion: streaming source -> MERGE pipeline, end-to-end.

Closes the loop between the two halves of the engine: the
``fred_replay`` STREAMING source (sources/fred_source.py — per-series
observation-count offsets over the blob cache) feeds each micro-batch
through the SAME normalize -> smart_update -> revision-audit path the
batch pipeline runs (pipeline.run_dataset), via foreachBatch. New
observations land in the dataset tables within one trigger, and every
value change is captured in the append-only revision log exactly as a
batch run would have.

Scope note (honest contract): count-based offsets capture APPENDED
observations — the overwhelmingly common FRED delta. Restatements of
already-consumed periods do not re-emit on the stream; the scheduled
batch pipeline re-reads whole payloads and remains the revision-
capture path for those (same division of labor as a CDC tail vs a
periodic reconciliation scan).

Scale: state is the per-series count map (KB at 10^5 series); each
micro-batch does per-series MERGEs against dataset tables partitioned
per dataset — the merge cost is delta-sized, table-swap atomic.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from econdatapipeline_spark.operators.merge import smart_update
from econdatapipeline_spark.registry import DatasetSpec
from econdatapipeline_spark.sources.fred import normalize_fred_rows
from econdatapipeline_spark.sources.fred_source import FredReplayDataSource
from econdatapipeline_spark.sources.warehouse import Warehouse


def start_fred_live_ingest(
    spark: SparkSession,
    cache_dir: str,
    wh: Warehouse,
    specs: list[DatasetSpec],
    checkpoint: str,
):
    """Start (availableNow) a streaming run draining new observations
    into the warehouse; returns the StreamingQuery. Call repeatedly
    with the same checkpoint to consume increments."""
    spark.dataSource.register(FredReplayDataSource)
    by_series = {s.fred_series_id: s for s in specs if s.fred_series_id}
    stream = (
        spark.readStream.format("fred_replay").option("path", cache_dir).load()
    )

    def sink(batch_df, _batch_id):
        # ONE pinned timestamp per micro-batch, shared by every spec's
        # merge (smart_update requires run_ts; see merge.py docstring).
        from datetime import datetime, timezone  # noqa: PLC0415

        batch_ts = datetime.now(timezone.utc).replace(tzinfo=None)
        batch_df = batch_df.localCheckpoint(eager=True)  # scanned once per spec
        for sid, spec in by_series.items():
            part = batch_df.filter(F.col("series_id") == sid)
            incoming = normalize_fred_rows(part, spec)
            if incoming.limit(1).count() == 0:
                continue
            existing = wh.read_or_empty(spec.name, spec.spark_schema())
            merge = smart_update(
                existing,
                incoming,
                key_cols=["date"],
                value_cols=list(spec.value_columns),
                dataset=spec.name,
                run_ts=batch_ts,
            )
            wh.apply_merge(merge, spec.name)
            wh.update_last_run(spec.name)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
