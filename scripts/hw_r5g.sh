#!/bin/bash
# Round-5 final validation chain: re-record the 4-mode recall parity on
# the FINAL kernels (walk-classify + atlas-direct + blur-kernel default
# shifted feature counts ~1-4%), plus a final 3456 trace.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results/hw_r5g}
mkdir -p "$OUT"

step() {
  local name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
}

step parity python -m vulkansift_tpu.perf.parity \
  --out-dir results --budget 4800 \
  --modes ubc_f32,ubc_fp16,ubc_f32_noremap,ubc_fp16_noremap

step tracebench_3456 python scripts/tracebench.py 3456x2304

echo "== chain done $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
