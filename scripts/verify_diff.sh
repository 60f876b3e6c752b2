#!/usr/bin/env bash
# One-command adjudication of a driver-red correctness row:
#
#   scripts/verify_diff.sh q_calibration[,q_more] [sfDir]
#
# Re-runs the named lanes through graft.Verify (fresh Spark dump), then the
# bundled checker in --diff mode, which writes BOTH engines' sorted typed
# rows to <outDir>/_diff/<lane>.{spark,oracle}.txt, prints the first
# differing cell (value AND Python type), and stamps the comparator's
# DuckDB/Python versions (ENV line) beside the dump's own JVM/Spark stamp
# (lane_notes.json `_env`). A mismatch reproduces as a one-look diff; a
# match refutes the driver row on this environment.
set -euo pipefail
cd "$(dirname "$0")/.."

LANES="${1:?usage: verify_diff.sh q_lane[,q_lane...] [sfDir]}"
SF="${2:-/root/testdata/sf0.01}"
OUT="/tmp/verify_diff_$(echo "$LANES" | tr ',' '_' | cut -c1-80)"

rm -rf "$OUT"
GRAFT_VERIFY_DIFF="$LANES" sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 \
  | grep "\[verify\]" || true
python3 scripts/check_correctness.py "$SF" "$OUT" --diff "$LANES" --only "$LANES"
echo "rows: $OUT/_diff/"
