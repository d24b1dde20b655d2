#!/bin/bash
# Round-5 fifth chain: measure the atlas-direct pyramid + size-gated
# double-buffered blur kernel defaults.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results/hw_r5e}
mkdir -p "$OUT"

step() {
  local name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
}

step stagebench_3456 python scripts/stagebench.py 3456x2304 4
step stagebench_1536 python scripts/stagebench.py 1536x1024 10
BENCH_ITERS=10 step bench python bench.py
step tracebench_3456 python scripts/tracebench.py 3456x2304

echo "== chain done $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
