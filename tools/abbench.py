"""Interleaved same-session A/B for optimization claims on a noisy box.

    python tools/abbench.py --base <git-ref> [--runs N] q1 q2 ...

Checks out ``--base`` into a temp git worktree (side A), keeps the
current working tree as side B, and times each named __spark_entry__
query through the noop sink ALTERNATING A,B,A,B,... inside one Spark
session, so machine drift hits both sides equally. Python modules are
swapped per side by dropping econdatapipeline_spark*/__spark_entry__
from sys.modules and re-importing with the side's checkout first on
sys.path (pure-Python package — the JVM stays warm and shared).

Reports per-query median(A), median(B), and B/A ratio.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _swap_modules(root: str):
    for m in [k for k in sys.modules if k.split(".")[0] in ("econdatapipeline_spark", "__spark_entry__")]:
        del sys.modules[m]
    while REPO in sys.path:
        sys.path.remove(REPO)
    for p in [p for p in sys.path if "/ab_worktree" in p]:
        sys.path.remove(p)
    sys.path.insert(0, root)
    import __spark_entry__ as entry  # noqa: PLC0415

    assert entry.__file__.startswith(root), entry.__file__
    return entry


def main() -> int:
    args = sys.argv[1:]
    base = None
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--base":
            base = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not base or not names:
        print(__doc__)
        return 2

    wt = "/tmp/ab_worktree"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt, base],
            check=True,
        )
    else:
        subprocess.run(["git", "-C", wt, "checkout", "--detach", base], check=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, REPO)
    from econdatapipeline_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark(app_name="abbench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(cpus * 2, numPartitions=cpus).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    out: dict[str, dict] = {}
    for name in names:
        ta: list[float] = []
        tb: list[float] = []
        for _ in range(runs):
            for side, root, acc in (("A", wt, ta), ("B", REPO, tb)):
                entry = _swap_modules(root)
                fn = entry.queries()[name]
                spark.sparkContext.setJobDescription(f"ab:{name}:{side}")
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                acc.append(time.monotonic() - t0)
                spark.catalog.clearCache()
        ma, mb = statistics.median(ta), statistics.median(tb)
        out[name] = {
            "A_median": round(ma, 3), "B_median": round(mb, 3),
            "ratio": round(mb / ma, 3),
            "A": [round(t, 3) for t in ta], "B": [round(t, 3) for t in tb],
        }
        print(f"{name:28s} A {ma:7.3f}  B {mb:7.3f}  B/A {mb/ma:5.3f}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
