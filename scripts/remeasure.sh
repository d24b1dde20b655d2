#!/bin/bash
# One-shot re-measurement chain, run serially the moment the TPU tunnel
# recovers. Every step logs to results/remeasure/<step>.log. No external
# timeouts on TPU work (killing a process mid-RPC wedges the tunnel);
# bench.py carries its own in-process watchdog.
#
# Usage: bash scripts/remeasure.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results/remeasure}
mkdir -p "$OUT"

step() {
  local name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
}

# 0. backend identity — resolves the default_backend() name question
step backend python -c "
import jax, time
t0 = time.time()
print('default_backend:', jax.default_backend())
print('devices:', jax.devices())
import jax.numpy as jnp
print('sum:', int(jnp.sum(jnp.arange(8.0))), f'{time.time()-t0:.1f}s')
"

# 1. isolated kernels FIRST: every round-3 kernel change (packed pairs,
#    in-kernel rolls, no-copy atlas) was written while the chip was down
#    and has never been compiled by Mosaic on hardware — validate the
#    lowering in isolation before it can hide inside a bench fallback.
step kernelbench python scripts/kernelbench.py

# 2. per-stage attribution at the headline resolution
step stagebench_1536 python scripts/stagebench.py 1536x1024 10

# 3. headline bench (1536x1024 + 640x480 north star), records the JSON lines
step bench python bench.py

# 4. trace: name the sub-0.3ms fusion tail (VERDICT round-3 ask 1a)
step tracebench_1536 python scripts/tracebench.py 1536x1024 8 60

# 4b. blur-kernel A/B: same bench with the opt-in fused blur kernel ON
#     (XLA blur is the default after the v5e A/B; this arm exercises the
#     Pallas fused blur+DoG kernel against it)
step bench_blur env VKSIFT_BLUR_KERNEL=1 BENCH_SKIP_NORTHSTAR=1 python bench.py

# 5. Hannover big-image resolution
step stagebench_3456 python scripts/stagebench.py 3456x2304 4

# 6. re-record the quality artifacts on hardware (includes the new
#    real-photograph family)
step parity python -m vulkansift_tpu.perf.parity --out-dir results

echo "== chain done $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
