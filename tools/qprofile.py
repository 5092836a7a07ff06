"""Decompose one query's wall time into Spark jobs vs driver gaps.

    python tools/qprofile.py <query> [<query> ...]

Runs each named __spark_entry__ query once through the noop sink with
the Spark event log enabled, then replays the log: per-job wall time
(with the job's callsite / description), per-job executor task time,
and the DRIVER GAPS between consecutive jobs — Catalyst analysis,
Python driver work, collect decode — which job metrics never show.
The gap series is the signature of an iterative operator paying fixed
per-round overhead.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from econdatapipeline_spark.session import get_spark


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    evdir = tempfile.mkdtemp(prefix="qprofile_events_")
    spark = get_spark(
        app_name="qprofile",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    # bench.py warmup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(cpus * 2, numPartitions=cpus).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        try:
            entry.load_table(spark, sf_dir, t).count()
        except Exception:  # noqa: BLE001
            pass

    qs = entry.queries()
    marks = {}
    for name in names:
        fn = qs[name]
        # one untimed warm run so scans/codegen are hot, then the timed run
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"PROFILE:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t1 = time.time()
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        marks[name] = (t0 * 1000, t1 * 1000, t1 - t0)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        cands = [os.path.join(evdir, f) for f in os.listdir(evdir)]
        path = max(cands, key=os.path.getmtime)
    if os.path.isdir(path):
        # Spark 4 rolling event log: a directory of events_* part files.
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        parts = [path]

    def _lines():
        for p in parts:
            with open(p) as fh:
                yield from fh

    jobs = {}
    stage_info = {}
    if True:
        for line in _lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stage_info[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "tasks": si.get("Number of Tasks", 0),
                    "ms": (comp - sub) if (sub and comp) else None,
                }

    for name, (m0, m1, wall) in marks.items():
        sel = sorted(
            (j for j in jobs.values()
             if j.get("desc") == f"PROFILE:{name}" and j["start"] >= m0 - 50
             and j.get("end", 0) <= m1 + 50),
            key=lambda j: j["start"],
        )
        print(f"\n=== {name}  wall {wall:.3f}s  jobs {len(sel)} ===")
        prev_end = m0
        job_total = 0.0
        gap_total = 0.0
        for j in sel:
            gap = (j["start"] - prev_end) / 1000.0
            dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
            job_total += dur
            gap_total += max(gap, 0.0)
            stages = [
                f"{stage_info[s]['name'].split(':')[0]}"
                f"[{stage_info[s]['tasks']}t,{stage_info[s]['ms']}ms]"
                for s in j["stages"] if s in stage_info
            ]
            print(f"  gap {gap:7.3f}s | job {dur:7.3f}s | {' '.join(stages)[:150]}")
            prev_end = j.get("end", j["start"])
        tail = (m1 - prev_end) / 1000.0
        print(f"  tail gap {tail:.3f}s")
        print(f"  TOTAL: jobs {job_total:.3f}s  gaps {gap_total + max(tail, 0):.3f}s"
              f"  of wall {wall:.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
