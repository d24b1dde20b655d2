#!/bin/bash
# Round-4 second hardware chain: sigma-scaled sampling A/B + the
# 3456x2304 attack (pyramid blur A/B, resample cost, trace attribution)
# + quality artifact regeneration (fp16 recall parity, protocol files).
# Serial TPU jobs, no external timeouts (killing mid-RPC wedges the
# tunnel — see .claude/skills/verify/SKILL.md).
#
# Run from a snapshot checkout (PYTHONPATH pinned) so later steps are not
# contaminated by concurrent edits in the main tree.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results/hw_r4c}
mkdir -p "$OUT"

step() {
  local name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
}

# 1. sigma-scaled sampling effect at the headline resolution
step stagebench_1536 python scripts/stagebench.py 1536x1024 10

# 2. quality gate for the remap + the fp16 storage fix: recall parity on
#    hardware (4 real photos x 8 warps; fp16 target >= 0.95)
step parity python -m vulkansift_tpu.perf.parity --out-dir results

# 3. pyramid-only blur A/B + resample matmul cost at Hannover-large
step pyrbench_3456 python scripts/pyrbench.py 3456x2304 6

# 4. remap effect at Hannover-large
step stagebench_3456 python scripts/stagebench.py 3456x2304 6

# 5. name the 3456 frontend/pyramid costs
step tracebench_3456 python scripts/tracebench.py 3456x2304 4 60

# 6. headline bench with the remap
step bench python bench.py

echo "== chain done $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
