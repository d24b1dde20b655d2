#!/bin/bash
# Round-5 sixth chain: single-body dynamic-slot kernels (half the scoped
# VMEM), default-precision one-hot downsample, walk-clip steps; blur
# R=64 arm (single-body fits where the 2-body R=64 OOM'd).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results/hw_r5f}
mkdir -p "$OUT"

step() {
  local name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
}

step stagebench_3456 python scripts/stagebench.py 3456x2304 4
VKSIFT_BLUR_R=64 step stagebench_3456_r64 \
  python scripts/stagebench.py 3456x2304 4
step stagebench_1536 python scripts/stagebench.py 1536x1024 10
BENCH_ITERS=10 step bench python bench.py

echo "== chain done $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
