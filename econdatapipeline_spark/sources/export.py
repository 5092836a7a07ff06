"""Exactly-once JSONL export sink (Python DataSource write API).

The reference's export layer is driver-side file writes (CSV/JSON via
pandas, `documentation/economic_indicators.md:71`). As a Spark sink it
must survive task retries and speculative duplicates, so this writer
implements the standard two-phase commit every serious sink uses:

1. each task writes its rows to a UNIQUE temp file (uuid-named — two
   attempts of the same task never collide) and returns the temp path
   in its commit message;
2. the driver's ``commit`` renames exactly the files named by the
   WINNING attempts into place and stamps ``_SUCCESS``; ``abort``
   deletes the temps. A reader that requires ``_SUCCESS`` therefore
   never sees a partial or duplicated export.

    spark.dataSource.register(JsonlExportDataSource)
    df.write.format("jsonl_export").option("path", out)
      .mode("append").save()

Scale: one file per task, rename-only commit on the driver (metadata
ops, no data movement) — the same O(files) commit cost as Spark's own
file sinks. JSON encoding happens in the Python worker; for hot paths
prefer the warehouse's parquet sinks — this sink exists for the
reference's human-facing JSONL export contract, where the row volume
is export-sized.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class _Part(WriterCommitMessage):
    tmp_path: str
    rows: int


class JsonlExportWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_export requires .option('path', <dir>)")
        self.fields = schema.fieldNames()
        self.overwrite = overwrite
        # One uuid per WRITE JOB, minted on the driver and shipped to
        # every task in the pickled writer: commit-time debris cleanup
        # matches on it, so two concurrent exports into the same
        # directory (e.g. two vacuum_revisions archives) can never
        # delete each other's in-flight temps.
        self.job_id = uuid.uuid4().hex

    def write(self, iterator) -> _Part:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f".tmp-{self.job_id}-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.fields, row)), default=str))
                fh.write("\n")
                n += 1
        return _Part(tmp_path=tmp, rows=n)

    def commit(self, messages) -> None:
        if self.overwrite:
            # only the previously COMMITTED files — the new attempt's
            # .tmp-* files live in the same dir and must survive until
            # their os.replace below
            for name in os.listdir(self.path):
                if (name.startswith("part-") and name.endswith(".jsonl")) or (
                    name == "_SUCCESS"
                ):
                    os.remove(os.path.join(self.path, name))
        total = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            # final name carries the attempt uuid: append commits to the
            # same directory accumulate instead of clobbering an earlier
            # export's part-<i> (the retention archive depends on this)
            uid = os.path.basename(m.tmp_path)[len(".tmp-"):]
            final = os.path.join(self.path, f"part-{i:05d}-{uid}")
            os.replace(m.tmp_path, final)
            total += m.rows
        # losing task attempts (retries, speculation) left .tmp files no
        # commit message names; after the winners are renamed, anything
        # still .tmp-<this job's id>-* is debris by definition. Temps
        # from OTHER in-flight jobs sharing the directory are theirs to
        # clean (or rename) at their own commit.
        prefix = f".tmp-{self.job_id}-"
        for name in os.listdir(self.path):
            if name.startswith(prefix):
                os.remove(os.path.join(self.path, name))
        # _SUCCESS carries the directory's ACCUMULATED row count: append
        # commits add to the prior stamp (overwrite mode deleted it
        # above, so the count restarts with this job's rows).
        success = os.path.join(self.path, "_SUCCESS")
        prior = 0
        if os.path.exists(success):
            try:
                with open(success) as fh:
                    prior = int(fh.read().strip() or 0)
            except (OSError, ValueError):
                prior = 0
        with open(success, "w") as fh:
            fh.write(str(prior + total))

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class JsonlExportDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_export"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return JsonlExportWriter(self.options, schema, overwrite)
