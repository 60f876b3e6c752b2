#!/usr/bin/env python3
"""Full-suite A/B of two git HEADs, interleaved in ONE window (round-15
verdict #5: the +43%% committed-record drift between the r13 and r14
records was adjudicated from a 2-of-153-lane sample; this runs EVERY lane
at both HEADs back-to-back so host drift cancels).

Usage:
    python3 scripts/ab_heads.py OLD_REF [--runs 3] [--sf /root/testdata/sf0.1]
        [--out ab_heads.json]

Method: `git worktree add` OLD_REF beside the repo, then alternate full
graft.Bench invocations OLD,NEW,OLD,NEW,... (each itself min-of-2 passes),
collect per-lane MEDIANS per HEAD, and emit a JSON record:
{lane: {"old": s, "new": s, "ratio": new/old}} plus the flagged list
(ratio >= 1.5 and growth > 0.2 s on lanes both HEADs ran).
"""
import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(workdir, sf_dir):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # stale-artifact guard: bench_queries.json persists from earlier runs,
    # so a failed/aborted bench would silently feed stale per-lane times
    # into the A/B medians. Delete first, then require BOTH a zero exit
    # and a fresh file.
    qf = os.path.join(workdir, "target", "bench_queries.json")
    if os.path.exists(qf):
        os.remove(qf)
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=workdir, env=env, capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(qf):
        print(f"[ab] bench FAILED in {workdir} (exit {r.returncode}); "
              f"skipping this run's samples. Last stderr lines:\n"
              + "\n".join(r.stderr.splitlines()[-5:]), flush=True)
        return None, None
    with open(qf) as f:
        queries = json.load(f)
    line = [l for l in r.stdout.splitlines() if l.startswith('{"metric"')]
    sentinel = json.loads(line[-1])["sentinel"] if line else None
    return queries, sentinel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old_ref")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="ab_heads.json")
    args = ap.parse_args()

    # slugify the ref (refs like origin/main contain '/') and, when the
    # worktree already exists, verify it is actually checked out at
    # old_ref — a stale worktree from a previous adjudication would
    # silently measure the wrong HEAD
    slug = "".join(c if c.isalnum() or c in "._-" else "_"
                   for c in args.old_ref)
    wt = f"/tmp/graft-ab-{slug}"
    want = subprocess.run(["git", "rev-parse", args.old_ref + "^{commit}"],
                          cwd=REPO, check=True, capture_output=True,
                          text=True).stdout.strip()
    if os.path.isdir(wt):
        have = subprocess.run(["git", "rev-parse", "HEAD"], cwd=wt,
                              capture_output=True, text=True).stdout.strip()
        if have != want:
            print(f"[ab] stale worktree {wt} at {have[:12]}, want "
                  f"{want[:12]} — re-detaching", flush=True)
            subprocess.run(["git", "checkout", "--detach", want],
                           cwd=wt, check=True)
    else:
        subprocess.run(["git", "worktree", "add", "--detach", wt, want],
                       cwd=REPO, check=True)

    samples = {"old": {}, "new": {}}
    sentinels = {"old": [], "new": []}
    for i in range(args.runs):
        for side, wd in (("old", wt), ("new", REPO)):
            print(f"[ab] run {i + 1}/{args.runs} {side} ({wd})", flush=True)
            qs, sent = run_bench(wd, args.sf)
            if qs is None:
                continue
            sentinels[side].append(sent)
            for k, v in qs.items():
                if v >= 0:
                    samples[side].setdefault(k, []).append(v)

    med = {s: {k: statistics.median(v) for k, v in samples[s].items()}
           for s in samples}
    common = sorted(set(med["old"]) & set(med["new"]))
    table = {k: {"old": med["old"][k], "new": med["new"][k],
                 "ratio": round(med["new"][k] / med["old"][k], 3)
                 if med["old"][k] > 0 else None}
             for k in common}
    flagged = sorted(k for k, v in table.items()
                     if v["ratio"] and v["ratio"] >= 1.5
                     and v["new"] - v["old"] > 0.2)
    record = {"old_ref": args.old_ref, "runs": args.runs, "sf": args.sf,
              "sentinels": sentinels,
              "total_common": {s: round(sum(med[s][k] for k in common), 3)
                               for s in samples},
              "flagged": flagged, "lanes": table}
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(f"[ab] {len(common)} common lanes; totals "
          f"old={record['total_common']['old']}s "
          f"new={record['total_common']['new']}s; flagged={flagged}")
    print(f"[ab] record -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
