"""Per-query micro-bench + plan capture for the optimization rounds.

    python tools/qbench.py [--plans DIR] [--suffix TAG] [--runs N] q1 q2 ...

Times each named __spark_entry__ query through the noop sink
(bench.py's methodology: median of N runs, cache cleared between
runs) at $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS, and with --plans
writes `.explain("formatted")` to DIR/<query>_<suffix>.txt so the
before/after plan evidence the round requires is captured at the
same moment as the timing.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from econdatapipeline_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="qbench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    # Same warmup as bench.py so first timed run is the query.
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
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        reps = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.monotonic() - t0)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "median": round(statistics.median(reps), 3),
            "min": round(min(reps), 3),
            "max": round(max(reps), 3),
        }
        print(f"{name:30s} median {out[name]['median']:7.3f}  "
              f"min {out[name]['min']:7.3f}  max {out[name]['max']:7.3f}",
              flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
