#!/bin/bash
# Round-4 first hardware measurement chain (serial TPU jobs, no external
# timeouts — see .claude/skills/verify/SKILL.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results/hw_r4a}
mkdir -p "$OUT"

step() {
  local name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
}

# 1. per-stage attribution with the round-4 changes (frontend tail,
#    K1 6x6 histogram, descriptor op cuts + in-kernel normalize,
#    refine segment constants + code0 shortcut)
step stagebench_1536 python scripts/stagebench.py 1536x1024 10

# 2. A/B: ONE global refinement walk for all octaves vs the hybrid split
step stagebench_1536_globalrefine env VKSIFT_GLOBAL_REFINE_MAX_CELLS=999999999 \
  python scripts/stagebench.py 1536x1024 10

# 3. matcher packed-key top-2
step matchbench python scripts/matchbench.py 16384 32768

# 4. isolated kernel costs (desc op cuts + 6x6 histogram effect)
step kernelbench python scripts/kernelbench.py

# 5. headline bench
step bench python bench.py

echo "== chain done $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
