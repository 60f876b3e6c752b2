#!/usr/bin/env python3
"""Diff two per-query bench records and flag regressions — with
SELF-ADJUDICATION of noise flags (round-11): sub-second lanes bounce
0.5-1.0s between identical-code runs on a shared host, and a human
dismissing those flags in PERF.md prose does not scale. With
--rerun-sf, every flagged lane is re-run 3x (SPARK_GRAFT_BENCH_ONLY
subset through graft.Bench, each run itself min-of-2 passes) and the
MEDIAN decides: still past threshold -> CONFIRMED regression; back
under -> NOISE, adjudicated by measurement. The full adjudication
record lands in --out as JSON, so the evidence is committed data, not
narrative.

Usage:
    python3 scripts/bench_diff.py OLD.json NEW.json [threshold]
        [--rerun-sf /root/testdata/sf0.1] [--out bench_diff_rN.json]

Each input is the flat JSON map Bench writes to target/bench_queries.json
({"q_name": seconds, ...}; -1 = failed in both passes). A query is flagged
when new >= threshold * old (default 1.5) AND the absolute growth exceeds
0.2 s. Exit code 1 iff a CONFIRMED regression (or a failed lane) remains.
NOTE: reruns overwrite target/bench_queries.json — pass committed copies
as OLD/NEW, never the live target file.
"""
import argparse
import json
import os
import statistics
import subprocess
import sys


def rerun_flagged(names, sf_dir, runs=3):
    """Re-run `names` through graft.Bench `runs` times; per-lane medians."""
    samples = {n: [] for n in names}
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               SPARK_GRAFT_BENCH_ONLY=",".join(sorted(names)))
    for i in range(runs):
        print(f"  [adjudicate] rerun {i + 1}/{runs} of {len(names)} flagged lane(s)...",
              flush=True)
        subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            env=env, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        got = json.load(open("target/bench_queries.json"))
        for n in names:
            if n in got and got[n] is not None and got[n] >= 0:
                samples[n].append(got[n])
    return {n: (statistics.median(v) if v else float("inf"))
            for n, v in samples.items()}


def main() -> int:
    ap = argparse.ArgumentParser(
        description="Diff two per-query bench records; see module docstring.",
        add_help=True)
    ap.add_argument("old_file")
    ap.add_argument("new_file")
    ap.add_argument("threshold", nargs="?", type=float, default=1.5)
    ap.add_argument("--rerun-sf", dest="rerun_sf", default=None,
                    help="SF dir for median-of-3 self-adjudication reruns")
    ap.add_argument("--out", dest="out_file", default=None,
                    help="write the adjudication record JSON here")
    try:
        ns = ap.parse_args()
    except SystemExit:
        print(__doc__.strip())
        return 2
    rerun_sf, out_file = ns.rerun_sf, ns.out_file
    args = [ns.old_file, ns.new_file]
    old = json.load(open(ns.old_file))
    new = json.load(open(ns.new_file))
    threshold = ns.threshold
    min_abs_growth = 0.2

    flagged = []
    failed = []
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
                failed.append(name)
                print(f"  FAILED   {name} (was {a:.3f}s)")
            continue
        ratio = b / a if a > 0 else float("inf")
        if ratio >= threshold and b - a >= min_abs_growth:
            flagged.append((name, a, b, ratio))

    tot_old = sum(v for v in old.values() if v is not None and v >= 0)
    tot_new = sum(v for v in new.values() if v is not None and v >= 0)
    print(f"total: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({len(old)} -> {len(new)} queries)")

    record = {
        "old": args[0], "new": args[1], "threshold": threshold,
        "total_old_s": round(tot_old, 1), "total_new_s": round(tot_new, 1),
        "failed": failed, "flags": [], "confirmed": [], "noise": [],
    }
    confirmed = list(flagged)
    if flagged and rerun_sf:
        medians = rerun_flagged([f[0] for f in flagged], rerun_sf)
        confirmed = []
        for name, a, b, ratio in flagged:
            m = medians[name]
            entry = {"query": name, "old_s": a, "flagged_s": b,
                     "flagged_ratio": round(ratio, 2),
                     "median_of_3_s": round(m, 3),
                     "median_ratio": round(m / a, 2) if a > 0 else None}
            if m >= threshold * a and m - a >= min_abs_growth:
                entry["verdict"] = "confirmed"
                record["confirmed"].append(entry)
                confirmed.append((name, a, m, m / a if a > 0 else float("inf")))
            else:
                entry["verdict"] = "noise"
                record["noise"].append(entry)
                print(f"  NOISE    {name}: flagged {a:.3f}s -> {b:.3f}s, "
                      f"median-of-3 {m:.3f}s — self-adjudicated")
            record["flags"].append(entry)
    elif flagged:
        record["flags"] = [
            {"query": n, "old_s": a, "flagged_s": b,
             "flagged_ratio": round(r, 2), "verdict": "unadjudicated"}
            for n, a, b, r in flagged]

    if out_file:
        json.dump(record, open(out_file, "w"), indent=1)
        print(f"adjudication record -> {out_file}")

    if not confirmed and not failed:
        print(f"no per-query regressions >= {threshold}x"
              + (" (after adjudication)" if flagged else ""))
        return 0
    if confirmed:
        print(f"REGRESSIONS (>= {threshold}x and >= {min_abs_growth}s growth"
              + (", median-of-3 confirmed" if rerun_sf else "") + "):")
        for name, a, b, ratio in sorted(confirmed, key=lambda f: -f[3]):
            print(f"  {name}: {a:.3f}s -> {b:.3f}s ({ratio:.2f}x)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
