"""Benchmark harness: runs the headline queries and prints ONE JSON line.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 8)

Each query is executed to completion through the `noop` sink, which
materializes every output column and discards the rows — unlike
count(), which lets Catalyst prune projection-only work (a regex-scrub
query would otherwise be timed as a bare scan). The JSON line reports
per-query seconds and the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

import __spark_entry__ as entry
from econdatapipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )

    # Untimed warmup: JVM/codegen init, Python/Arrow worker spin-up, and
    # parquet footer reads, so the first timed query measures the query,
    # not session startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as pd  # noqa: PLC0415

    spark.range(cpus * 2, numPartitions=cpus).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        try:
            entry.load_table(spark, sf_dir, t).count()
        except Exception:  # noqa: BLE001
            pass

    timings: dict[str, float] = {}
    for name, fn in entry.queries().items():
        start = time.monotonic()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.monotonic() - start, 4)
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            timings[name] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)
        # Iterative queries persist working sets; dropping them between
        # queries keeps every measurement independent of which queries
        # ran before (storage-memory eviction under accumulation was
        # measurable as multi-second noise on the tail of the run).
        # localCheckpoint blocks (connected_components loop state, the
        # triangle edge list, TF-IDF posting tables) are NOT covered —
        # those are freed by the ContextCleaner when the per-query
        # DataFrames are garbage collected.
        spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "bench_total_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
