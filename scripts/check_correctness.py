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


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
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
        bad = [(a, b) for a, b in zip(s_norm, o_norm) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(s_norm)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(s_norm)} rows")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
