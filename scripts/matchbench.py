"""2-NN matcher microbenchmark on the real TPU (two-point timing).

Usage: python scripts/matchbench.py [sizes...]   e.g. 16384 32768
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, k=8):
    out = fn(*args)
    _ = int(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _ = int(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return time.perf_counter() - t0

    run(2)
    t1 = run(k)
    t2 = run(2 * k)
    return (t2 - t1) / k * 1e3


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [16384, 32768]
    from vulkansift_tpu.ops import match

    rng = np.random.default_rng(0)
    for n in sizes:
        da = jnp.asarray(rng.integers(0, 256, (n, 128), dtype=np.uint8))
        db = jnp.asarray(rng.integers(0, 256, (n, 128), dtype=np.uint8))
        ca = jnp.int32(n)
        cb = jnp.int32(n)

        fn = jax.jit(lambda a, b: match.match_2nn(a, ca, b, cb))
        ms = timed(fn, (da, db))
        print(f"match_2nn      {n}x{n}: {ms:7.2f} ms "
              f"({2 * n * n * 128 / ms / 1e9:.1f} GFLOP/ms-ish)")

        fn2 = jax.jit(lambda a, b: match.match_2nn_auto(a, ca, b, cb))
        ms2 = timed(fn2, (da, db))
        print(f"match_2nn_auto {n}x{n}: {ms2:7.2f} ms")

        fn3 = jax.jit(lambda a, b: match.match_2nn_fused(a, ca, b, cb))
        ms3 = timed(fn3, (da, db))
        print(f"match_2nn_fused{n}x{n}: {ms3:7.2f} ms "
              f"({2 * n * n * 128 / ms3 / 1e9:.1f} GFLOP/ms-ish)")

        from vulkansift_tpu.ops import pallas_match as pm
        fn4 = jax.jit(lambda a, b: pm._match_2nn_tiles_rowmajor(
            a, ca, b, cb))
        ms4 = timed(fn4, (da, db))
        print(f"fused rowmajor {n}x{n}: {ms4:7.2f} ms")


if __name__ == "__main__":
    main()
