#!/bin/bash
# Round-5 closing chain: row-concat global-refine retest at 1536, final
# defaults stagebenches, final bench record.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results/hw_r5h}
mkdir -p "$OUT"

step() {
  local name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
}

VKSIFT_GLOBAL_REFINE_MAX_CELLS=60000000 step stagebench_1536_globalref2 \
  python scripts/stagebench.py 1536x1024 10
step stagebench_1536 python scripts/stagebench.py 1536x1024 10
step stagebench_3456 python scripts/stagebench.py 3456x2304 4
BENCH_ITERS=10 step bench python bench.py

echo "== chain done $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
