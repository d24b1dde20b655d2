"""Time the XLA glue pieces of the detect back-half on the TPU.

The axon tunnel adds ~ms-scale per-dispatch overhead and ~26 ms per sync,
drowning sub-ms ops under dispatch-level timing. So each piece is repeated
K times INSIDE one jitted program via lax.scan with a scalar feedback
(sum of the output folded into one input element, keeping iterations
serially dependent and DCE-proof); per-iteration time is
(T(2K) - T(K)) / K, where each T is one dispatch + one sync.

The scalar feedback adds one full reduction of the piece's output per
iteration — the reported numbers are slight over-estimates for pieces
with large outputs (the `sum only` row calibrates that overhead).

All data is generated on device (host uploads run at ~MB/s here).
Usage: python scripts/gluebench.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

K = 24


def scan_timed(piece, carry0, feed, name):
    """piece: carry -> out; feed: (carry, scalar) -> carry."""

    def make(k):
        def body(c, _):
            o = piece(c)
            s = jnp.sum(jax.tree.leaves(o)[0]).astype(jnp.float32)
            return feed(c, s * 1e-30), None

        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(body, c, None, length=k)
            return jnp.sum(jax.tree.leaves(c)[0][..., :1])

        return run

    f1, f2 = make(K), make(2 * K)

    def t(f):
        _ = float(f(carry0))  # compile + sync
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f(carry0))
            best = min(best, time.perf_counter() - t0)
        return best

    ms = (t(f2) - t(f1)) / K * 1e3
    print(f"{name:24s}: {ms:8.3f} ms", flush=True)
    return ms


def main():
    from vulkansift_tpu.ops import pallas_backhalf as pb
    from vulkansift_tpu.ops.orientation import peaks_from_histograms
    from vulkansift_tpu.ops.descriptor import normalize_descriptor
    from vulkansift_tpu.ops.extract import rank_select

    cap = 32768
    key = jax.random.key(0)

    oct_shapes = [(2048, 3072), (1024, 1536), (512, 768), (256, 384),
                  (128, 192), (64, 96)]
    L = 5

    gaussians = jax.jit(lambda k: [
        jax.random.uniform(k, (L + 1, h, w), jnp.float32)
        for (h, w) in oct_shapes])(key)
    _ = float(gaussians[0][0, 0, 0])

    def feed0(c, s):
        if isinstance(c, (list, tuple)):
            return [c[0].at[(0,) * c[0].ndim].add(s)] + list(c[1:])
        return c.at[(0,) * c.ndim].add(s)

    # calibration: sum of a big array alone
    atlas_shape_rows = sum(((h + 7) // 8) * 8 for h, _ in oct_shapes)
    big = jax.jit(lambda k: jax.random.uniform(
        k, (L, atlas_shape_rows, 3072), jnp.float32))(key)
    _ = float(big[0, 0, 0])
    scan_timed(lambda c: c, big, feed0, "sum only (atlas-size)")

    def atlas_build(gs):
        bands = []
        for g in gs:
            l, h, w = g.shape
            bands.append(jnp.pad(g[:L], ((0, 0), (0, (-h) % 8),
                                         (0, 3072 - w))))
        return jnp.concatenate(bands, axis=1)

    scan_timed(atlas_build, gaussians, feed0, "atlas pad+concat")

    hist = jax.random.uniform(key, (cap, 36), jnp.float32)
    scan_timed(lambda h: peaks_from_histograms(h, 4).angles, hist, feed0,
               "peaks (32768x36)")

    raw = jax.random.uniform(key, (cap, 128), jnp.float32)
    scan_timed(normalize_descriptor, raw, feed0, "normalize (32768x128)")

    parent = jax.random.randint(key, (cap,), 0, cap)

    def pack(c):
        m = jnp.arange(cap) < 6000
        outs = [jnp.where(m, c[parent] + i, 0) for i in range(9)]
        outs.append(jnp.where(m[:, None], raw[parent], 0))
        return outs[-1] + outs[0][:, None]

    scan_timed(pack, raw[:, 0], feed0, "pack 9+desc gathers")

    validf = jax.random.uniform(key, (cap,))
    scan_timed(lambda v: rank_select(v < 0.2, cap)[0].astype(jnp.float32),
               validf, feed0, "rank_select (32768)")
    validf4 = jax.random.uniform(key, (cap * 4,))
    scan_timed(lambda v: rank_select(v < 0.05, cap)[0].astype(jnp.float32),
               validf4, feed0, "rank_select (131072)")

    code = (jax.random.randint(key, (31_000_000,), 0, 108, jnp.int32)
            .astype(jnp.int8))
    idxf = jax.random.randint(key, (cap,), 0, 30_000_000
                              ).astype(jnp.float32)

    def walk5(pf):
        p = pf.astype(jnp.int32)
        for _ in range(5):
            c = code[jnp.clip(p, 0, code.shape[0] - 1)].astype(jnp.int32)
            p = p + jax.lax.rem(c, 3) - 1
        return p.astype(jnp.float32)

    scan_timed(walk5, idxf, feed0, "walk 5 gathers (31M)")

    dog = jax.random.uniform(key, (42_000_000,), jnp.float32)

    def nb9(pf):
        idx = pf.astype(jnp.int32)
        outs = []
        for a in (0, 1, 2):
            for b in (0, 1, 2):
                st = jnp.clip(idx + a * 1000 + b * 100, 0,
                              dog.shape[0] - 3)
                outs.append(jax.vmap(
                    lambda s: jax.lax.dynamic_slice(dog, (s,), (3,)))(st))
        return sum(o[:, 0] for o in outs)

    scan_timed(nb9, idxf, feed0, "final 9x3 gathers (42M)")

    def nb27(pf):
        idx = pf.astype(jnp.int32)
        acc = 0.0
        for a in (0, 1, 2):
            for b in (0, 1, 2):
                for c in (0, 1, 2):
                    st = jnp.clip(idx + a * 1000 + b * 100 + c, 0,
                                  dog.shape[0] - 1)
                    acc = acc + dog[st]
        return acc

    scan_timed(nb27, idxf, feed0, "final 27x1 gathers")

    # Upsample lane-interleave A/B: native stack+reshape vs MXU matmul
    # (scale_space.upsample2x_linear picks the matmul on TPU; this pair
    # verifies that choice stays right).
    src = jax.random.uniform(key, (1024, 1536), jnp.float32)

    def up_stack(x):
        xp = jnp.pad(x, ((0, 0), (1, 1)), mode="edge")
        even = 0.25 * xp[:, :-2] + 0.75 * xp[:, 1:-1]
        odd = 0.75 * xp[:, 1:-1] + 0.25 * xp[:, 2:]
        return jnp.stack([even, odd], axis=2).reshape(x.shape[0], -1)

    def up_matmul(x):
        n = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (1, 1)), mode="edge")
        even = 0.25 * xp[:, :-2] + 0.75 * xp[:, 1:-1]
        odd = 0.75 * xp[:, 1:-1] + 0.25 * xp[:, 2:]
        eo = jnp.concatenate([even, odd], axis=1)
        sel = jnp.zeros((2 * n, 2 * n), jnp.float32)
        sel = sel.at[jnp.arange(n), jnp.arange(0, 2 * n, 2)].set(1)
        sel = sel.at[n + jnp.arange(n), jnp.arange(1, 2 * n, 2)].set(1)
        return jax.lax.dot_general(
            eo, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    scan_timed(up_stack, src, feed0, "up-lane stack+reshape")
    scan_timed(up_matmul, src, feed0, "up-lane MXU interleave")

    # top_k(36 -> 4) vs iterative max+mask peak selection.
    def peaks_topk(h):
        vals, idx = jax.lax.top_k(h, 4)
        return vals + idx.astype(jnp.float32)

    def peaks_iter(h):
        outs = []
        cur = h
        lanes = jnp.arange(36, dtype=jnp.float32)[None, :]
        for _ in range(4):
            m = jnp.max(cur, axis=1, keepdims=True)
            hit = cur == m
            first = (jnp.cumsum(hit.astype(jnp.int32), axis=1)
                     == 1) & hit
            idx = jnp.sum(jnp.where(first, lanes, 0.0), axis=1)
            outs.append(m[:, 0] + idx)
            cur = jnp.where(first, -jnp.inf, cur)
        return jnp.stack(outs, axis=1)

    scan_timed(peaks_topk, hist, feed0, "top_k 4-of-36 (32k)")
    scan_timed(peaks_iter, hist, feed0, "iter-max 4-of-36 (32k)")

    # Matcher per-tile top-2: two argmin passes (current) vs ONE variadic
    # reduce with a lexicographic top-2 combiner (fuses into the matmul
    # epilogue if XLA lowers tuple reduces well on TPU).
    from vulkansift_tpu.ops.match import _top2_of_tile

    tile = jax.random.uniform(key, (16384, 2048), jnp.float32)

    def top2_argmin(t):
        d1, i1, d2, i2 = _top2_of_tile(t, jnp.int32(0))
        return d1 + d2 + i1.astype(jnp.float32) + i2.astype(jnp.float32)

    def top2_vreduce(t):
        n, m = t.shape
        cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        inf = jnp.float32(jnp.inf)

        def comb(a, b):
            ad1, ai1, ad2, ai2 = a
            bd1, bi1, bd2, bi2 = b
            t1 = (bd1 < ad1) | ((bd1 == ad1) & (bi1 < ai1))
            nd1 = jnp.where(t1, bd1, ad1)
            ni1 = jnp.where(t1, bi1, ai1)
            ld = jnp.where(t1, ad1, bd1)
            li = jnp.where(t1, ai1, bi1)
            wd = jnp.where(t1, bd2, ad2)
            wi = jnp.where(t1, bi2, ai2)
            t2 = (ld < wd) | ((ld == wd) & (li < wi))
            return (nd1, ni1, jnp.where(t2, ld, wd),
                    jnp.where(t2, li, wi))

        d1, i1, d2, i2 = jax.lax.reduce(
            (t, cols, jnp.full(t.shape, inf), jnp.zeros(t.shape, jnp.int32)),
            (inf, jnp.int32(0), inf, jnp.int32(0)),
            comb, (1,))
        return d1 + d2 + i1.astype(jnp.float32) + i2.astype(jnp.float32)

    scan_timed(top2_argmin, tile, feed0, "top2 2-argmin (16kx2k)")
    scan_timed(top2_vreduce, tile, feed0, "top2 vreduce (16kx2k)")


if __name__ == "__main__":
    main()
