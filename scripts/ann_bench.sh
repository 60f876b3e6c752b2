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
set -euo pipefail
SRC=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/annbench/emb768}
K=${3:-100}
BLOCKS=${4:-12}
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.EmbGenWide $SRC $OUT $K $BLOCKS" 2>&1 | grep '\[embgen\]'
sbt -batch "runMain graft.AnnBench $OUT" 2>&1 | grep '\[annbench\]'
