#!/usr/bin/env bash
# Full local gate: tests + both-SF oracle verification + bench.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== sbt test =="
sbt -batch test 2>&1 | grep -E "Tests:|TEST FAILED"

echo "== verify sf0.01 =="
rm -rf /tmp/gate_v001
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_v001" 2>&1 | grep "\[verify\]" || true
python3 scripts/check_correctness.py /root/testdata/sf0.01 /tmp/gate_v001 | tail -1

echo "== verify sf0.1 =="
rm -rf /tmp/gate_v01
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/gate_v01" 2>&1 | grep "\[verify\]" || true
python3 scripts/check_correctness.py /root/testdata/sf0.1 /tmp/gate_v01 | tail -1

echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'

# Optional stress lane: STRESS=1 ./scripts/gate.sh regenerates the 10x
# derivation (graft.StressGen, splittable single-file layout) and runs
# the bench against it — the PERF.md stress numbers reproduce from here.
# SALT=0.9 (any fraction in (0,1]) switches to the salted derivation:
# that fraction of each replicated copy's documents gets a unique suffix,
# reproducing the dup-free regime where dedup-first degenerates.
# FACTOR (default 10 → "sf1") picks the replication: FACTOR=100 STRESS=1
# reproduces the PERF.md sf10 rows.
if [ "${STRESS:-0}" = "1" ]; then
  SALT="${SALT:-0}"
  FACTOR="${FACTOR:-10}"
  if [ "$SALT" != "0" ]; then
    echo "== stress ${FACTOR}x salted (salt=$SALT) =="
    sbt -batch "runMain graft.StressGen /root/testdata/sf0.1 /tmp/sfstress/f${FACTOR}salt $FACTOR $SALT" 2>&1 | grep stressgen
    SPARK_GRAFT_SF_DIR=/tmp/sfstress/f${FACTOR}salt SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
  else
    echo "== stress ${FACTOR}x =="
    sbt -batch "runMain graft.StressGen /root/testdata/sf0.1 /tmp/sfstress/f${FACTOR} $FACTOR" 2>&1 | grep stressgen
    SPARK_GRAFT_SF_DIR=/tmp/sfstress/f${FACTOR} SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
  fi
fi
