"""Per-candidate 27-neighborhood fetch strategies, timed on hardware.

refine's final Newton fetches a (3,3,3) DoG neighborhood per candidate.
Today: 9 vmapped flat 3-element dynamic_slices (one per (layer,row)
plane) = 9 gather ops, each latency-bound. Candidates:

  bytegather : one (k,) 1-D element gather (the walk's per-step cost —
               the latency floor for ANY per-candidate fetch)
  flat9      : current scheme (9 ops)
  plane3     : 3 vmapped (3,3) 2-D dynamic_slices on the (h,w) layer
  cube1      : 1 vmapped (3,3,3) 3-D dynamic_slice on the (ns,h,w) stack

All return the same 27 values (asserted once); the two-point method
cancels the tunnel sync. Usage: python scripts/gatherbench.py [k] [iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    ns, h, w = 5, 1024, 1536

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal((ns, h, w)).astype(np.float32))
    rs = jnp.asarray(rng.integers(1, ns - 1, k).astype(np.int32))
    ry = jnp.asarray(rng.integers(1, h - 1, k).astype(np.int32))
    rx = jnp.asarray(rng.integers(1, w - 1, k).astype(np.int32))

    def bytegather(d, rs, ry, rx):
        flat = d.reshape(-1)
        idx = (rs * h + ry) * w + rx
        return flat[idx].sum()

    def flat9(d, rs, ry, rx):
        flat = d.reshape(-1)
        n = flat.shape[0]
        acc = 0.0
        for a in (0, 1, 2):
            for b in (0, 1, 2):
                st = ((rs + a - 1) * h + (ry + b - 1)) * w + rx - 1
                st = jnp.clip(st, 0, n - 3)
                row3 = jax.vmap(lambda s: jax.lax.dynamic_slice(
                    flat, (s,), (3,)))(st)
                acc += row3.sum()
        return acc

    def plane3(d, rs, ry, rx):
        acc = 0.0
        for a in (0, 1, 2):
            lay = d  # index layer dynamically inside the slice
            pl = jax.vmap(lambda s, y, x: jax.lax.dynamic_slice(
                lay, (s, y, x), (1, 3, 3)))(rs + a - 1, ry - 1, rx - 1)
            acc += pl.sum()
        return acc

    def cube1(d, rs, ry, rx):
        cu = jax.vmap(lambda s, y, x: jax.lax.dynamic_slice(
            d, (s, y, x), (3, 3, 3)))(rs - 1, ry - 1, rx - 1)
        return cu.sum()

    fns = {n: jax.jit(f) for n, f in (
        ("bytegather", bytegather), ("flat9", flat9),
        ("plane3", plane3), ("cube1", cube1))}

    ref = float(fns["flat9"](d, rs, ry, rx))
    for name in ("plane3", "cube1"):
        got = float(fns[name](d, rs, ry, rx))
        assert abs(got - ref) < abs(ref) * 1e-5 + 1e-3, (name, got, ref)

    for name, fn in fns.items():
        _ = float(fn(d, rs, ry, rx))

        def t(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn(d, rs, ry, rx)
            float(o)
            return time.perf_counter() - t0

        t(4)
        ms = (t(2 * it) - t(it)) / it * 1e3
        print(f"{name:>10s} k={k}: {ms:7.3f} ms")


if __name__ == "__main__":
    main()
