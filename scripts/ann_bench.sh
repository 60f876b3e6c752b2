#!/usr/bin/env bash
# Regenerates the PERF.md production-width ANN table in one command:
# widen the 64-dim source embeddings to 64×BLOCKS dims (jittered blocks,
# EmbGenWide), replicate K×, then run AnnBench over the generated corpus
# (cold build + warm probe min-of-2 + recall@5 vs brute force for the
# three persisted lanes). Defaults reproduce the 768-dim / 200k-vector
# measurement; recall@5 = 1.0 on this construction is additionally
# asserted as a spec (WideDimAnnSpec) so a wide-dim regression fails CI,
# not just a manually-rerun table.
#
#   scripts/ann_bench.sh [srcDir] [outDir] [K] [blocks]
#
# Heap: one local[32] JVM hosts all 32 "executors", so its -Xmx must
# cover 32 concurrent tasks' working sets. At 768 dims a columnar batch
# of 4k vectors is ~25 MB/task before shuffle buffers; 8g (the suite
# default, sized for the 64-dim gate corpora) OOMs in the composed
# IVFADC warm pass. 24g ≈ 0.75g/thread — the per-executor headroom a
# real cluster would give this width.
set -euo pipefail
SRC=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/annbench/emb768}
K=${3:-100}
BLOCKS=${4:-12}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g}
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.EmbGenWide $SRC $OUT $K $BLOCKS" 2>&1 | grep '\[embgen\]'
sbt -batch "runMain graft.AnnBench $OUT" 2>&1 | grep '\[annbench\]'
