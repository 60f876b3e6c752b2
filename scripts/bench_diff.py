#!/usr/bin/env python3
"""Diff two per-query bench records and flag regressions.

Usage:
    python3 scripts/bench_diff.py bench_queries_r08.json bench_queries_r09.json [threshold]

Each input is the flat JSON map Bench writes to target/bench_queries.json
({"q_name": seconds, ...}; -1 = failed in both passes). A query is flagged
when new >= threshold * old (default 1.5) AND the absolute growth exceeds
0.2 s (sub-second queries bounce with host noise; a 0.1->0.2 s flip is not
a regression worth a page). Exit code 1 iff anything is flagged, so the
script can gate CI.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__.strip())
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    min_abs_growth = 0.2

    flagged = []
    for name in sorted(set(old) | set(new)):
        a, b = old.get(name), new.get(name)
        if a is None:
            print(f"  NEW      {name}: {b:.3f}s")
            continue
        if b is None:
            print(f"  REMOVED  {name} (was {a:.3f}s)")
            continue
        if a < 0 or b < 0:
            if b < 0:
                flagged.append((name, a, b, float("inf")))
                print(f"  FAILED   {name} (was {a:.3f}s)")
            continue
        ratio = b / a if a > 0 else float("inf")
        if ratio >= threshold and b - a >= min_abs_growth:
            flagged.append((name, a, b, ratio))

    tot_old = sum(v for v in old.values() if v is not None and v >= 0)
    tot_new = sum(v for v in new.values() if v is not None and v >= 0)
    print(f"total: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({len(old)} -> {len(new)} queries)")
    if not flagged:
        print(f"no per-query regressions >= {threshold}x")
        return 0
    print(f"REGRESSIONS (>= {threshold}x and >= {min_abs_growth}s growth):")
    for name, a, b, ratio in sorted(flagged, key=lambda f: -f[3]):
        print(f"  {name}: {a:.3f}s -> {b:.3f}s ({ratio:.2f}x)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
