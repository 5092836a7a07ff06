"""Capture the PER-ROUND physical plan of a driver-loop query.

Driver-loop queries (cox_ph_multi & co.) return a LocalTableScan of
driver-computed rows, so the declared-query explain says nothing about
the per-round work. This tool intercepts DataFrame.first() while the
query runs and records the formatted plan of every intercepted round
action; the LAST one is written (they are structurally identical
across rounds — only beta literals differ).

Usage: python tools/capture_round_plans.py <query> <out.txt> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    query, out = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    import pyspark.sql.classic.dataframe as cdf

    import __spark_entry__ as entry
    from econdatapipeline_spark.session import get_spark

    spark = get_spark(app_name="capture_round_plans", master="local[8]",
                      shuffle_partitions=16)
    captured: list[str] = []
    orig_first = cdf.DataFrame.first

    def first_and_capture(self):
        captured.append(
            self._jdf.queryExecution().explainString(
                self._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        )
        return orig_first(self)

    cdf.DataFrame.first = first_and_capture
    try:
        entry.queries()[query](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    finally:
        cdf.DataFrame.first = orig_first
    if not captured:
        print("no first() calls intercepted", file=sys.stderr)
        return 1
    with open(out, "w") as f:
        f.write(
            f"Per-round plan for {query} (last of {len(captured)}"
            f" intercepted round actions; rounds differ only in beta"
            f" literals)\n\n"
        )
        f.write(captured[-1])
    print(f"wrote {out}: {len(captured)} round actions intercepted")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
