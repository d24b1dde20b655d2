#!/bin/bash
# Round-5 fourth chain: consolidation at post-revert defaults (stacked
# pyramid, 27 element-gathers, DB frontend) + the blur-kernel combo at
# 3456 (R=48 fits scoped VMEM now), then fresh BENCH numbers.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results/hw_r5d}
mkdir -p "$OUT"

step() {
  local name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
}

step stagebench_3456_default python scripts/stagebench.py 3456x2304 4
VKSIFT_BLUR_KERNEL=1 step stagebench_3456_blurk \
  python scripts/stagebench.py 3456x2304 4
VKSIFT_BLUR_KERNEL=1 VKSIFT_BLUR_DB=0 step stagebench_3456_blurk_serial \
  python scripts/stagebench.py 3456x2304 4
step stagebench_1536_default python scripts/stagebench.py 1536x1024 10

# Fresh bench numbers at the current defaults
BENCH_ITERS=10 step bench python bench.py

echo "== chain done $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
