#!/bin/bash
# Round-5 third hardware chain: single-variable bisects after the r5b
# confounds — pyramid formulation (in-place vs stack, fused blur kernel),
# frontend DMA pipelining (static-slot double-buffer vs serial), folded
# 27-gather, and the post-barrier-fix global-refine retest at 1536.
# Serial TPU jobs, no external timeouts.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results/hw_r5c}
mkdir -p "$OUT"

step() {
  local name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
}

# 3456: pyramid + frontend bisect (defaults = VPU blur, in-place stacks,
# double-buffered frontend, folded 27-gather refine)
step stagebench_3456_default python scripts/stagebench.py 3456x2304 4
VKSIFT_BLUR_KERNEL=1 step stagebench_3456_blurk \
  python scripts/stagebench.py 3456x2304 4
VKSIFT_PYR_INPLACE=0 step stagebench_3456_noinplace \
  python scripts/stagebench.py 3456x2304 4

# 1536: fresh default + post-barrier-fix global-refine arm + ori-split A/B
step stagebench_1536_default python scripts/stagebench.py 1536x1024 10
VKSIFT_GLOBAL_REFINE_MAX_CELLS=100000000 step stagebench_1536_globalref \
  python scripts/stagebench.py 1536x1024 10
VKSIFT_ORI_SPLIT=0 step stagebench_1536_nosplit \
  python scripts/stagebench.py 1536x1024 10
VKSIFT_BLUR_KERNEL=1 step stagebench_1536_blurk \
  python scripts/stagebench.py 1536x1024 10

# Frontend kernel isolated: double-buffer vs serial (same static-slot
# body) and 32-row blocks
step frontbench_db1 python scripts/frontbench.py 6912x4608 4
VKSIFT_FRONTEND_DB=0 step frontbench_db0 \
  python scripts/frontbench.py 6912x4608 4
VKSIFT_FRONTEND_BR=32 step frontbench_br32 \
  python scripts/frontbench.py 6912x4608 4

# Gather formulation verification (one27 arms vs flat9/view27)
step gatherbench2 python scripts/gatherbench2.py 32768 8

# Fresh per-op traces at HEAD for the next iteration
step tracebench_1536 python scripts/tracebench.py 1536x1024
step tracebench_3456 python scripts/tracebench.py 3456x2304

echo "== chain done $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
