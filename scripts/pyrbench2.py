"""Blur-pass formulations on hardware: VPU shift-MAC vs conv vs matmul.

The round-5 trace puts ScaleSpace at 53.75 ms/frame at 3456x2304 —
~20 ms of it the separable blur's shift-multiply-accumulate chains,
which are VPU-bound (~456 ops/elem across 6 layers x 2 passes) while the
MXU sits idle. Candidates per 1-D pass:

  vpu     : current blur_separable pass (shifted slices + MACs)
  conv    : lax.conv_general_dilated, f32 (XLA-TPU native conv path)
  convd   : same with preferred_element_type/default precision
  matmulV : vertical pass as one shared-selector dot_general over
            overlapping row tiles (B (256+2k,256) static banded matrix)

Each is validated against vpu (max abs diff printed). Times are for ONE
H+V blur of one (H, W) f32 layer with a 19-tap kernel.

Usage: python scripts/pyrbench2.py [WxH] [iters]
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
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    w, h = map(int, wh.split("x"))
    k = 9  # 19-tap kernel (the largest per-layer increment)
    sig = 2.2
    taps = np.exp(-0.5 * np.arange(k + 1) ** 2 / sig ** 2)
    taps /= taps[0] + 2 * taps[1:].sum()
    full = np.concatenate([taps[:0:-1], taps]).astype(np.float32)

    x = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (h, w), jnp.float32))

    def vpu(x):
        from vulkansift_tpu.ops.scale_space import blur_separable
        return blur_separable(x, taps)

    def conv_pass(x, axis, precision):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (k, k)
        xp = jnp.pad(x, pad, mode="symmetric")
        lhs = xp[None, None]
        if axis == 1:
            rhs = jnp.asarray(full).reshape(1, 1, 1, 2 * k + 1)
            win = (1, 2 * k + 1)
        else:
            rhs = jnp.asarray(full).reshape(1, 1, 2 * k + 1, 1)
            win = (2 * k + 1, 1)
        out = lax.conv_general_dilated(
            lhs, rhs, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=precision)
        return out[0, 0]

    def conv(x):
        p = jax.lax.Precision.HIGHEST
        return conv_pass(conv_pass(x, 1, p), 0, p)

    def convd(x):
        return conv_pass(conv_pass(x, 1, None), 0, None)

    T = 256

    def matmulV(x):
        # H-pass on VPU (lane shifts are cheap), V-pass as one batched
        # matmul with a shared banded selector.
        from vulkansift_tpu.ops.scale_space import _conv1d_symmetric
        y = _conv1d_symmetric(x, taps, axis=1)
        hp = y.shape[0]
        nt = -(-hp // T)
        yp = jnp.pad(y, ((k, nt * T + k - hp), (0, 0)), mode="symmetric")
        # tiles: (nt, T+2k, W) overlapping row slices
        tiles = jnp.stack([lax.dynamic_slice_in_dim(yp, t * T, T + 2 * k, 0)
                           for t in range(nt)])
        b = np.zeros((T, T + 2 * k), np.float32)
        for o in range(T):
            b[o, o:o + 2 * k + 1] = full
        out = lax.dot_general(
            jnp.asarray(b), tiles,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)  # (T, nt, W)
        return out.transpose(1, 0, 2).reshape(nt * T, -1)[:hp]

    # conv arms removed: XLA-TPU lowers the V conv at this shape to a
    # f32[4608,8,867,1] layout padded 128x -> 15.2 GB OOM
    # (results/hw_r5a/pyrbench2.log first run).
    fns = {n: jax.jit(f) for n, f in (
        ("vpu", vpu), ("matmulV", matmulV))}

    ref = np.asarray(fns["vpu"](x))
    for name in ("matmulV",):
        got = np.asarray(fns[name](x))
        print(f"{name}: max abs diff vs vpu = {np.abs(got - ref).max():.3g}",
              flush=True)

    for name, fn in fns.items():
        _ = np.asarray(fn(x)).ravel()[0]

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
        print(f"{name:>8s} {w}x{h}: {((t2 - t1) / it) * 1e3:7.3f} ms "
              f"per H+V blur", flush=True)


if __name__ == "__main__":
    main()
