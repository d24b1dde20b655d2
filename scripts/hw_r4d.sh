#!/bin/bash
# Round-4 continuation hardware chain. Serial: one process owns the chip.
cd /root/repo
OUT=results/hw_r4d
mkdir -p "$OUT"
step() {
  name=$1; shift
  echo "== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  timeout 1800 "$@" > "$OUT/$name.log" 2>&1
  echo "== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
}
# wait for the in-flight bench to release the chip
while ! grep -q "bench exit=" "$OUT/bench.log" 2>/dev/null; do sleep 10; done

# 1. blur-kernel A/B at the resolution it was designed for
step stagebench_3456_blurkernel env VKSIFT_BLUR_KERNEL=1 python scripts/stagebench.py 3456x2304 4
# 2. fresh 1536 stage breakdown on current code
step stagebench_1536 python scripts/stagebench.py 1536x1024 10
# 3. fp16-fix verification: regenerate the parity artifact (VERDICT #4)
step parity python -m vulkansift_tpu.perf.parity --out-dir results
echo "== chain done $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
