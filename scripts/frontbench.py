"""Frontend-kernel triage: time frontend_tpu alone on an octave-0 DoG
stack, under each VKSIFT_FRONTEND_ABLATE arm (set by the caller), plus
the rank-select compaction share.

The stage deltas put the frontend at +32 ms of the 3456x2304 detect
(results/hw_r4d) — far off both the VPU (~1 ms of compares) and HBM
(~1 ms of DoG reads) rooflines. Arms: "" (full), "nonewton" (extremum
test only), "dmaonly" (stream + threshold only). Deltas attribute the
time to the Newton solve / extremum compares / raw streaming.

Usage: VKSIFT_FRONTEND_ABLATE=... python scripts/frontbench.py [WxH] [k]
(WxH is the OCTAVE size, e.g. 6912x4608 for Hannover-large octave 0.)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "6912x4608"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    w, h = map(int, wh.split("x"))
    ns, cap = 5, 16384

    from vulkansift_tpu.ops import pallas_frontend

    # DoG-like values: small, zero-centered, sparse extrema. Generated ON
    # DEVICE — the axon tunnel uploads at ~50 MB/s, so a host-generated
    # 6912x4608 stack costs ~13 minutes of pure transfer.
    d = (jax.random.normal(jax.random.PRNGKey(0), (ns, h, w), jnp.float32)
         * 0.02)
    d = jax.block_until_ready(d)

    @jax.jit
    def run(d):
        cand, code = pallas_frontend.frontend_tpu(
            d, dog_threshold=0.04, capacity=cap)
        return cand.count, code[0, 0, 0]

    @jax.jit
    def run_kernel_only(d):
        # Bypass compaction: sum the code field so only the pallas_call
        # (and tail) execute.
        _, code = pallas_frontend.frontend_tpu(
            d, dog_threshold=0.04, capacity=cap)
        return code[:, ::37, ::53].astype(jnp.int32).sum()

    for name, fn in (("kernel-only", run_kernel_only),
                     ("kernel+compact", run)):
        out = fn(d)
        _ = int(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])

        def t(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn(d)
            _ = int(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
            return time.perf_counter() - t0

        t(2)
        ms = (t(2 * k) - t(k)) / k * 1e3
        print(f"ablate={os.environ.get('VKSIFT_FRONTEND_ABLATE', ''):>9s} "
              f"{name:>15s} {wh}: {ms:8.2f} ms")


if __name__ == "__main__":
    main()
