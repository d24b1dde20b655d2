"""27-neighborhood fetch, round 2: element-gather formulations.

gatherbench round 1 (results/hw_r5a/gatherbench.log) showed one (k,)
element gather costs 0.017 ms while one vmapped (k,3) slice-gather costs
~0.35 ms — the current flat9 scheme (9 slice-gathers) pays ~3.1 ms where
27 element gathers would pay ~0.5. This round times the element-gather
variants at a realistic large-octave size, including the flatten cost in
context:

  flat27  : 27 element gathers from d.reshape(-1)
  view27  : 27 element gathers from the (ns*h, w) 2-D view, flat index
            computed per gather on the minor dim (d2[r, c] indexing)
  row27   : 27 element gathers d2[r * w + c] on d2.reshape(-1) of the
            2-D view (same as flat27 but via the 2-D intermediate)
  flat9   : current scheme (baseline)

Usage: python scripts/gatherbench2.py [k] [iters] [ns,h,w]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    shape = sys.argv[3] if len(sys.argv) > 3 else "5,4608,6912"
    ns, h, w = map(int, shape.split(","))

    # Device-generated (the tunnel uploads at ~50 MB/s).
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    d = jax.block_until_ready(
        jax.random.normal(ks[0], (ns, h, w), jnp.float32))
    rng = np.random.default_rng(0)
    rs = jnp.asarray(rng.integers(1, ns - 1, k).astype(np.int32))
    ry = jnp.asarray(rng.integers(1, h - 1, k).astype(np.int32))
    rx = jnp.asarray(rng.integers(1, w - 1, k).astype(np.int32))

    def offsets():
        for a in (-1, 0, 1):
            for b in (-1, 0, 1):
                for c in (-1, 0, 1):
                    yield a, b, c

    def flat27(d, rs, ry, rx):
        flat = d.reshape(-1)
        acc = 0.0
        for a, b, c in offsets():
            idx = ((rs + a) * h + ry + b) * w + rx + c
            acc += flat[idx]
        return acc.sum()

    def view27(d, rs, ry, rx):
        d2 = d.reshape(ns * h, w)
        acc = 0.0
        for a, b, c in offsets():
            acc += d2[(rs + a) * h + ry + b, rx + c]
        return acc.sum()

    def flat9(d, rs, ry, rx):
        flat = d.reshape(-1)
        n = flat.shape[0]
        acc = 0.0
        for a in (0, 1, 2):
            for b in (0, 1, 2):
                st = ((rs + a - 1) * h + ry + b - 1) * w + rx - 1
                st = jnp.clip(st, 0, n - 3)
                row3 = jax.vmap(lambda s: jax.lax.dynamic_slice(
                    flat, (s,), (3,)))(st)
                acc += row3.sum(-1)
        return acc.sum()

    def one27flat(d, rs, ry, rx):
        # ALL 27 offsets in ONE gather op (the hypothesis: each gather op
        # pays a source-size-scaled streaming cost, so fold the pass).
        flat = d.reshape(-1)
        idx = jnp.stack([((rs + a) * h + ry + b) * w + rx + c
                         for a in (-1, 0, 1) for b in (-1, 0, 1)
                         for c in (-1, 0, 1)])
        return flat[idx].sum()

    def one27view(d, rs, ry, rx):
        d2 = d.reshape(ns * h, w)
        rows = jnp.stack([(rs + a) * h + ry + b
                          for a in (-1, 0, 1) for b in (-1, 0, 1)
                          for c in (-1, 0, 1)])
        cols = jnp.stack([rx + c
                          for a in (-1, 0, 1) for b in (-1, 0, 1)
                          for c in (-1, 0, 1)])
        return d2[rows, cols].sum()

    fns = {n: jax.jit(f) for n, f in (
        ("flat27", flat27), ("view27", view27), ("flat9", flat9),
        ("one27flat", one27flat), ("one27view", one27view))}

    ref = float(fns["flat9"](d, rs, ry, rx))
    for name in ("flat27", "view27", "one27flat", "one27view"):
        got = float(fns[name](d, rs, ry, rx))
        assert abs(got - ref) < abs(ref) * 1e-4 + 1e-2, (name, got, ref)

    for name, fn in fns.items():
        _ = float(fn(d, rs, ry, rx))

        def t(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn(d, rs, ry, rx)
            float(o)
            return time.perf_counter() - t0

        t(2)
        t1 = t(it)
        t2 = t(2 * it)
        print(f"{name:>8s} k={k}: {((t2 - t1) / it) * 1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
