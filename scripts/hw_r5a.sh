#!/bin/bash
# Round-5 first hardware chain: perf triage for the VERDICT r4 targets.
# Serial TPU jobs, no external timeouts (killing mid-RPC wedges the
# tunnel — see .claude/skills/verify/SKILL.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results/hw_r5a}
mkdir -p "$OUT"

step() {
  local name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
}

# 1. Packed histogram kernel A/B at the headline resolution (the round-3
#    in-program measurement was taken under transient TPU INTERNAL errors
#    and predates the round-4 roll-based window machinery).
VKSIFT_PACKED_HIST=1 step stagebench_1536_packedhist \
  python scripts/stagebench.py 1536x1024 10

# 2. Refine final-gather shapes: 9x(k,3) flat vs 3x(k,1,3,3) planes vs
#    1x(k,3,3,3) cube (extract._gather_neighborhood candidates).
step gatherbench python scripts/gatherbench.py

# 3. Frontend kernel ablation at Hannover-large octave 0 (6912x4608):
#    full vs extremum-only vs DMA-only attributes the +32.3 ms frontend.
VKSIFT_FRONTEND_ABLATE= step frontbench_full \
  python scripts/frontbench.py 6912x4608 4
VKSIFT_FRONTEND_ABLATE=nonewton step frontbench_nonewton \
  python scripts/frontbench.py 6912x4608 4
VKSIFT_FRONTEND_ABLATE=dmaonly step frontbench_dmaonly \
  python scripts/frontbench.py 6912x4608 4

echo "== chain done $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
