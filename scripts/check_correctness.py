#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against views over the same
parquet tables, and compares: column names (sorted), row count, and values
(rows sorted by all columns, exact equality; tz-aware timestamps normalized
to naive UTC).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(v):
    if v is None:
        return None
    # tz-aware datetime -> naive UTC
    if hasattr(v, "tzinfo") and v.tzinfo is not None:
        import datetime
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(normalize(x) for x in v)
    return v


def sortable(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def dump_rows(path, cols, rows):
    """One row per line, typed repr per cell — two such files diff cleanly."""
    with open(path, "w") as f:
        f.write("\t".join(sorted(cols)) + "\n")
        for r in rows:
            f.write("\t".join(f"{v!r}:{type(v).__name__}" for v in r) + "\n")


def first_cell_diff(cols, s_norm, o_norm):
    names = sorted(cols)
    for i, (a, b) in enumerate(zip(s_norm, o_norm)):
        for j, (x, y) in enumerate(zip(a, b)):
            if x != y:
                return (f"row {i} col {names[j]}: "
                        f"spark={x!r}:{type(x).__name__} "
                        f"oracle={y!r}:{type(y).__name__}")
    return None


def main(sf_dir, out_dir, diff_lanes=frozenset(), only=None):
    out = Path(out_dir)
    # env stamp: cross-environment gate disagreements (round 14) are
    # unadjudicable without knowing WHICH comparator build judged
    print(f"ENV  duckdb={duckdb.__version__} "
          f"python={sys.version.split()[0]}")
    oracle = json.loads((out / "oracle_sql.json").read_text())
    # a typo'd --only/--diff lane must fail loudly, not judge zero lanes
    # and exit 0 (verify_diff.sh would report success for a lane that was
    # never checked)
    unknown = (set(only or ()) | set(diff_lanes)) - set(oracle)
    if unknown:
        print(f"ERROR: --only/--diff lanes not in oracle_sql.json: "
              f"{sorted(unknown)}")
        return 2
    if only is not None:  # verify_diff.sh: judge only the re-dumped lanes
        oracle = {k: v for k, v in oracle.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    green = set()
    for name in sorted(oracle):
        qdir = out / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output at {qdir}")
            failures += 1
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            ora_rel = con.execute(oracle[name])
            ora_cols = [d[0] for d in ora_rel.description]
            ora_rows = ora_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: execution error: {e}")
            failures += 1
            continue
        if sorted(spark_cols) != sorted(ora_cols):
            print(f"FAIL {name}: columns {sorted(spark_cols)} != {sorted(ora_cols)}")
            failures += 1
            continue
        if len(spark_rows) != len(ora_rows):
            print(f"FAIL {name}: rowcount {len(spark_rows)} != {len(ora_rows)}")
            failures += 1
            continue
        # align column order by sorted name, normalize, sort rows
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        o_idx = [ora_cols.index(c) for c in sorted(ora_cols)]
        s_norm = sorted((tuple(normalize(r[i]) for i in s_idx) for r in spark_rows), key=sortable)
        o_norm = sorted((tuple(normalize(r[i]) for i in o_idx) for r in ora_rows), key=sortable)
        if name in diff_lanes:
            ddir = out / "_diff"
            ddir.mkdir(exist_ok=True)
            dump_rows(ddir / f"{name}.spark.txt", spark_cols, s_norm)
            dump_rows(ddir / f"{name}.oracle.txt", ora_cols, o_norm)
            print(f"DIFF {name}: both engines' sorted typed rows -> {ddir}")
        bad = [(a, b) for a, b in zip(s_norm, o_norm) if a != b]
        if bad:
            detail = first_cell_diff(spark_cols, s_norm, o_norm)
            print(f"FAIL {name}: {len(bad)}/{len(s_norm)} rows differ; {detail}")
            failures += 1
        else:
            print(f"OK   {name}: {len(s_norm)} rows")
            green.add(name)
    # resolve twin certification (round 16, r15 verdict #4): the permanent
    # no-oracle lanes (nondeterministic-hash lanes DuckDB cannot replay)
    # are certified by their oracle-checked _portable twins. Reading
    # lane_notes.json here turns their rows from unexplained red ink into
    # an explicit CERT state — VERIFIED against the twin's result in this
    # very run, not just claimed.
    certified = 0
    notes_path = out / "lane_notes.json"
    if only is None and notes_path.exists():
        notes = json.loads(notes_path.read_text())
        for lane in sorted(notes):
            note = notes[lane]
            if not (isinstance(note, dict)
                    and note.get("status") == "certified_by_twin"):
                continue
            twin = note.get("twin")
            # the certified lane's OWN dump must exist and load with rows:
            # Verify catches a lane's exception and only prints to stderr,
            # so a crashed lane would otherwise still read "CERT ... twin
            # green in this run" on the strength of its healthy twin
            lane_dir = out / lane
            lane_rows = -1
            if lane_dir.exists():
                try:
                    lane_rows = con.execute(
                        f"SELECT count(*) FROM read_parquet("
                        f"'{lane_dir}/*.parquet')").fetchone()[0]
                except Exception:
                    lane_rows = -1
            if lane_rows <= 0:
                print(f"FAIL {lane}: certified_by_twin({twin}) but the"
                      f" lane's own dump is missing/empty/unreadable"
                      f" ({lane_dir}, rows={lane_rows})")
                failures += 1
            elif twin in green:
                print(f"CERT {lane}: certified_by_twin({twin}) — twin green"
                      f" and lane dump loads ({lane_rows} rows) in this run")
                certified += 1
            else:
                print(f"FAIL {lane}: certified_by_twin({twin}) but the twin"
                      f" is NOT green in this run")
                failures += 1
    cert_note = f" (+{certified} certified by twin)" if certified else ""
    print(f"\n{len(green)}/{len(oracle)} queries match{cert_note}")
    return 1 if failures else 0


if __name__ == "__main__":
    lanes = frozenset()
    only = None
    argv = list(sys.argv[1:])
    if "--diff" in argv:
        i = argv.index("--diff")
        lanes = frozenset(argv[i + 1].split(","))
        del argv[i:i + 2]
    if "--only" in argv:
        i = argv.index("--only")
        only = frozenset(argv[i + 1].split(","))
        del argv[i:i + 2]
    sys.exit(main(argv[0], argv[1], lanes, only))
