"""FRED replay as a first-class Spark data source (Python DataSource API).

The reference's FRED ingestion is driver-side request code
(`core_local/azure_fred_scraper.py:72-104`: fetch JSON, loop
observations). Spark 4's Python DataSource API lets the same cached
payloads enter the engine as a REAL source instead: schema known at
plan time, one input partition per series file (parallel ingest), and
filter pushdown that prunes whole files before a byte is parsed.

    spark.dataSource.register(FredReplayDataSource)
    df = (spark.read.format("fred_replay")
               .option("path", "<landing>/fred-cache").load())
    df.filter(df.series_id == "GDP")   # reads ONE file, not the dir

Layout contract: ``<path>/<series_id>.json``, each file a FRED
observations payload (``{"observations": [{"date", "value"}, ...]}``)
— exactly what ``CachedHttpFetcher`` persists in the blob cache, so
the cache directory doubles as a queryable table.

Scale notes: partition discovery is one driver-side listing (at 10^5
series this is the same listing any file source performs); each
partition parses one KB-scale payload in a Python worker — the Python
boundary is per-file, not per-row, and downstream normalization
(`sources/fred.py`) is pure column expressions. Supported pushdowns:
``series_id = 'X'`` and ``series_id IN (...)`` prune partitions;
everything else is returned to Spark to evaluate post-scan (the API's
contract for partial pushdown).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

FRED_REPLAY_SCHEMA = "series_id string, obs_date string, value_raw string"


@dataclass(frozen=True)
class _SeriesFile(InputPartition):
    path: str
    series_id: str


class FredReplayReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fred_replay requires .option('path', <dir>)")
        self._keep: set[str] | None = None  # None = no series pruning

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("series_id",):
                keep = {str(f.value)}
            elif isinstance(f, In) and f.attribute == ("series_id",):
                keep = {str(v) for v in f.value}
            else:
                # not handled here -> Spark evaluates it after the scan
                yield f
                continue
            # conjunctive filters INTERSECT: consuming two series_id
            # predicates and applying only the last would return rows
            # the query excluded
            self._keep = keep if self._keep is None else self._keep & keep

    def partitions(self):
        parts = []
        for name in sorted(os.listdir(self.path)):
            if not name.endswith(".json"):
                continue
            sid = name[: -len(".json")]
            if self._keep is not None and sid not in self._keep:
                continue  # pruned: this file is never opened
            parts.append(_SeriesFile(os.path.join(self.path, name), sid))
        return parts

    def read(self, partition: _SeriesFile):
        if partition is None:
            # an empty partitions() (everything pruned, e.g. two
            # contradictory pushed filters) still gets one read() call
            # with no partition — the correct result is no rows
            return
        with open(partition.path, "rb") as fh:
            payload = json.load(fh)
        for obs in payload.get("observations", []):
            yield (partition.series_id, obs.get("date"), obs.get("value"))


class FredReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fred_replay"

    def schema(self) -> str | StructType:
        return FRED_REPLAY_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return FredReplayReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return FredReplayStreamReader(self.options)


class FredReplayStreamReader(SimpleDataSourceStreamReader):
    """Incremental polling of the FRED cache as a STREAMING source.

    FRED observation lists only ever grow (new periods append; the
    reference re-downloads the whole payload each run,
    azure_fred_scraper.py:72-104). That monotonicity is exactly a
    streaming offset: per series, the count of observations already
    consumed. Each micro-batch emits only observations past the
    offset, so downstream windows/MERGE see one row per NEW period —
    the streaming twin of the batch gate-and-merge pipeline.

    Offsets are plain dicts (checkpoint-serializable);
    ``readBetweenOffsets`` replays any [start, end) slice
    deterministically from the files for exactly-once recovery.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fred_replay requires .option('path', <dir>)")

    def _payloads(self):
        out = {}
        for name in sorted(os.listdir(self.path)):
            if name.endswith(".json"):
                with open(os.path.join(self.path, name), "rb") as fh:
                    out[name[: -len(".json")]] = json.load(fh).get(
                        "observations", []
                    )
        return out

    def initialOffset(self) -> dict:
        return {"counts": {}}

    def read(self, start: dict):
        counts = dict(start.get("counts", {}))
        rows = []
        for sid, obs in self._payloads().items():
            seen = counts.get(sid, 0)
            for o in obs[seen:]:
                rows.append((sid, o.get("date"), o.get("value")))
            counts[sid] = max(seen, len(obs))
        return iter(rows), {"counts": counts}

    def readBetweenOffsets(self, start: dict, end: dict):
        s, e = start.get("counts", {}), end.get("counts", {})
        for sid, obs in self._payloads().items():
            for o in obs[s.get(sid, 0) : e.get(sid, 0)]:
                yield (sid, o.get("date"), o.get("value"))
