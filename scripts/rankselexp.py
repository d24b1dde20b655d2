"""A/B: rank_select formulations on TPU (cumsum+searchsorted vs
cumsum+scatter). Run AFTER other TPU jobs finish (chip serializes).
Usage: python scripts/rankselexp.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

K = 24


def scan_timed(piece, carry0, name):
    def make(k):
        def body(c, _):
            o = piece(c)
            s = jnp.sum(jax.tree.leaves(o)[0]).astype(jnp.float32)
            return c.at[(0,) * c.ndim].add(s * 1e-30), None

        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(body, c, None, length=k)
            return jnp.sum(c[(0,) * c.ndim])

        return run

    f1, f2 = make(K), make(2 * K)

    def t(f):
        _ = float(f(carry0))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f(carry0))
            best = min(best, time.perf_counter() - t0)
        return best

    ms = (t(f2) - t(f1)) / K * 1e3
    print(f"{name:34s}: {ms:8.3f} ms", flush=True)


def rs_searchsorted(maskf, capacity):
    mask = maskf < 0.2
    cs = jnp.cumsum(mask.astype(jnp.int32))
    count = jnp.minimum(cs[-1], capacity)
    ranks = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(cs, ranks, side="left")
    idx = jnp.clip(idx, 0, mask.shape[0] - 1).astype(jnp.int32)
    idx = jnp.where(ranks <= count, idx, 0)
    return idx.astype(jnp.float32)


def rs_scatter(maskf, capacity):
    mask = maskf < 0.2
    n = mask.shape[0]
    cs = jnp.cumsum(mask.astype(jnp.int32))
    rank = jnp.where(mask, cs - 1, capacity)  # invalid -> dropped
    idx = jnp.zeros((capacity,), jnp.int32).at[rank].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return idx.astype(jnp.float32)


def main():
    key = jax.random.key(0)
    for n in (32768, 131072, 1_500_000, 31_000_000):
        m = jax.random.uniform(key, (n,), jnp.float32)
        _ = float(m[0])
        cap = 32768 if n <= 131072 else 8192
        scan_timed(functools.partial(rs_searchsorted, capacity=cap), m,
                   f"searchsorted n={n} cap={cap}")
        scan_timed(functools.partial(rs_scatter, capacity=cap), m,
                   f"scatter      n={n} cap={cap}")
    # correctness
    m = jax.random.uniform(key, (100000,), jnp.float32)
    a = rs_searchsorted(m, 4096)
    b = rs_scatter(m, 4096)
    print("equal:", bool(jnp.all(a == b)))


if __name__ == "__main__":
    main()
