"""H-pass blur via lane-tiled banded MXU matmul (follow-up to pyrbench2).

matmulV (V-pass on MXU) measured 4.55 vs 7.38 ms (results/hw_r5a/
pyrbench2r.log); the remaining ~3.3 ms is the VPU H-pass. Candidate:
tile the lane axis into 128-aligned (H, T+256) slices (halo 128 >= k on
each side) and contract with a shared banded selector (T+256, T).

Arms: vpu (both passes VPU), matmulV (H vpu + V mxu, the shipped path),
matmulHV (both passes MXU).

Usage: python scripts/pyrbench3.py [WxH] [iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "6912x4608"
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    w, h = map(int, wh.split("x"))
    k = 9
    sig = 2.2
    taps = np.exp(-0.5 * np.arange(k + 1) ** 2 / sig ** 2)
    taps /= taps[0] + 2 * taps[1:].sum()
    full = np.concatenate([taps[:0:-1], taps]).astype(np.float32)

    import os
    os.environ["VKSIFT_ASSUME_TPU"] = "1"
    from vulkansift_tpu.ops.scale_space import (_conv1d_symmetric,
                                                _vconv_matmul)

    x = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (h, w), jnp.float32))

    def hconv_matmul(x):
        t_cols = 512
        nt = -(-w // t_cols)
        xp = jnp.pad(x, ((0, 0), (128, nt * t_cols + 128 - w)),
                     mode="symmetric")
        tiles = jnp.stack([
            lax.dynamic_slice_in_dim(xp, t * t_cols, t_cols + 256, 1)
            for t in range(nt)])                     # (nt, H, T+256)
        b = np.zeros((t_cols + 256, t_cols), np.float32)
        for o in range(t_cols):
            b[o + 128 - k:o + 128 + k + 1, o] = full
        out = lax.dot_general(
            tiles, jnp.asarray(b), (((2,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST)         # (nt, H, T)
        return out.transpose(1, 0, 2).reshape(h, nt * t_cols)[:, :w]

    def vpu(x):
        y = _conv1d_symmetric(x, taps, axis=1)
        return _conv1d_symmetric(y, taps, axis=0)

    def matmulV(x):
        y = _conv1d_symmetric(x, taps, axis=1)
        return _vconv_matmul(y, taps)

    def matmulHV(x):
        return _vconv_matmul(hconv_matmul(x), taps)

    fns = {n: jax.jit(f) for n, f in (
        ("vpu", vpu), ("matmulV", matmulV), ("matmulHV", matmulHV))}

    ref = np.asarray(fns["vpu"](x))
    for name in ("matmulV", "matmulHV"):
        got = np.asarray(fns[name](x))
        print(f"{name}: max abs diff vs vpu = {np.abs(got - ref).max():.3g}",
              flush=True)

    for name, fn in fns.items():
        _ = float(np.asarray(fn(x))[0, 0])

        def t(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn(x)
            float(o[0, 0])
            return time.perf_counter() - t0

        t(2)
        t1 = t(it)
        t2 = t(2 * it)
        print(f"{name:>9s} {w}x{h}: {((t2 - t1) / it) * 1e3:7.3f} ms "
              f"per H+V blur", flush=True)


if __name__ == "__main__":
    main()
