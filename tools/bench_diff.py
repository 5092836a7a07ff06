"""Compare two bench artifacts query-by-query.

    python tools/bench_diff.py BENCH_r02.json BENCH_r03.json [threshold]

Prints shared-query aggregate ratio plus every query whose ratio
exceeds the threshold (default 1.5x) in either direction — the triage
list the bench-noise discipline in SCALE.md calls for: a real
regression shows up here AND in `git log` for that operator; a loaded
machine shows up here with no code diff and a median>>min spread.
Exits 1 when any slowdown exceeds the threshold (CI-gateable).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    def load_queries(path: str) -> dict[str, float]:
        data = json.load(open(path))
        if "queries" in data:
            return data["queries"]
        # the driver's BENCH_r*.json wraps (and may truncate) the bench
        # line in a "tail" string — salvage every complete pair
        import re

        tail = data.get("tail", "")
        return {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'\\?"(\w+)\\?": ([0-9.]+)[,}]', tail)
            if not m.group(1) in {"value", "sf", "cpus", "n_queries", "total_min", "runs_per_query"}
        }

    a, b = load_queries(sys.argv[1]), load_queries(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qa, qb = a, b
    shared = sorted(set(qa) & set(qb))
    sa, sb = sum(qa[q] for q in shared), sum(qb[q] for q in shared)
    if not shared or sa == 0:
        print("artifacts share no comparable queries — nothing to diff")
        return 2
    print(f"shared {len(shared)} queries: {sa:.1f}s -> {sb:.1f}s "
          f"(aggregate {sb / sa:.3f}x)")
    for tag, names in (("only in A", set(qa) - set(qb)),
                       ("only in B", set(qb) - set(qa))):
        if names:
            print(f"{tag}: {', '.join(sorted(names))}")
    flagged = []
    for q in shared:
        ratio = qb[q] / qa[q] if qa[q] > 0 else float("inf")
        if ratio >= thr or ratio <= 1 / thr:
            flagged.append((ratio, q))
    for ratio, q in sorted(flagged, reverse=True):
        arrow = "SLOWER" if ratio > 1 else "faster"
        print(f"  {q}: {qa[q]:.2f}s -> {qb[q]:.2f}s ({ratio:.2f}x {arrow})")
    if not flagged:
        print(f"no query moved beyond {thr}x")
    return 1 if any(r >= thr for r, _ in flagged) else 0


if __name__ == "__main__":
    raise SystemExit(main())
