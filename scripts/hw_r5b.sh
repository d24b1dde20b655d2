#!/bin/bash
# Round-5 second hardware chain: fresh stagebenches at HEAD (incl. the
# MXU V-blur A/B for the pyramid regression seen in the aborted
# stagebench_3456_new), then THE critical artifact — a fresh
# recall-parity record covering f32/fp16 x remap on/off (VERDICT r4 #2).
# Serial TPU jobs, no external timeouts (see .claude/skills/verify).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results/hw_r5b}
mkdir -p "$OUT"

step() {
  local name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
}

step stagebench_1536 python scripts/stagebench.py 1536x1024 10
step stagebench_3456 python scripts/stagebench.py 3456x2304 4
VKSIFT_VBLUR_MATMUL=0 step stagebench_3456_novblur \
  python scripts/stagebench.py 3456x2304 4

# Parity record: budget-aware, flushes per pair; 80 min wall budget.
step parity python -m vulkansift_tpu.perf.parity \
  --out-dir results --budget 4800 \
  --modes ubc_f32,ubc_fp16,ubc_f32_noremap,ubc_fp16_noremap

echo "== chain done $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
