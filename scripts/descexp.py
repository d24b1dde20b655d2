"""A/B experiments for the descriptor kernel redesign (TPU only).

Variants of the K2 body, measured at the large-sigma geometry (wr=96,
wc=256) where the current kernel collapses (5.7 us/kp vs 0.62 at
wr=64/wc=128 — VMEM spills from the 36-plane unrolled body), and at the
small geometry for regression checks.

v0: current _make_desc_kernel (36 flattened planes, (4,N)@(32,N)^T)
v1: 16/8 plane split: U=(u_y*wx_x) 16 planes, V=(wo_o*wm) 8 planes
v2: v1 without flattening — dot_general with 2 contracting dims
v3: v2 with _N_BUF=4 (halve DMA scratch)

Usage: python scripts/descexp.py [n_kp]
"""

import functools
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vulkansift_tpu import SiftConfig
from vulkansift_tpu.config import (LAMBDA_DESCRIPTOR, NB_HIST, NB_ORI)
from vulkansift_tpu.ops import pallas_backhalf as pb

_TWO_PI = 2.0 * math.pi


def make_desc_kernel_v(geom, capp, n_buf, variant):
    wr, wc = geom.wr, geom.wc
    n = wr * 128
    half_cells = NB_HIST / 2.0

    def kernel(count_ref, addr_ref, meta_ref, gauss_ref, desc_ref,
               wscr, sems):
        step = pl.program_id(0)

        def start_dma(i):
            @pl.when(i < count_ref[0])
            def _():
                idx = jnp.minimum(i, capp - 1)
                a = addr_ref[idx]
                cidx = jax.lax.rem(a, 4)
                layer = jax.lax.rem(a >> pb._ADDR_LAYER_SHIFT, 8)
                ys = jax.lax.rem(a >> pb._ADDR_YS_SHIFT, 2048) * 8
                ax = (a >> pb._ADDR_AX_SHIFT) * 128
                slot = jax.lax.rem(i, n_buf)
                pltpu.make_async_copy(
                    gauss_ref.at[cidx, layer,
                                 pl.ds(pl.multiple_of(ys, 8), wr),
                                 pl.ds(pl.multiple_of(ax, 128), wc)],
                    wscr.at[slot], sems.at[slot]).start()

        @pl.when(step == 0)
        def _():
            for p in range(n_buf - 1):
                start_dma(jnp.int32(p))

        start_dma(step + n_buf - 1)
        slot = jax.lax.rem(step, n_buf)
        pltpu.make_async_copy(
            gauss_ref.at[0, 0, pl.ds(0, wr), pl.ds(0, wc)],
            wscr.at[slot], sems.at[slot]).wait()
        win = wscr[slot]

        meta = meta_ref[jax.lax.rem(step, 8)]
        f = pb._window_fields(win, step, addr_ref, meta, geom)
        ang = meta[0:1, 8:9]

        sig = f["sig"]
        dlam = LAMBDA_DESCRIPTOR * sig
        drad = jnp.floor(math.sqrt(2.0) * dlam * (NB_HIST + 1) * 0.5 + 0.5)
        dxi = f["px"] - f["cx"]
        dyi = f["py"] - f["cy"]
        sdx = f["px"] - f["sx"]
        sdy = f["py"] - f["sy"]
        dmask = (f["mask0"] & (jnp.abs(dxi) <= drad)
                 & (jnp.abs(dyi) <= drad))
        dexp = -1.0 / (2.0 * half_cells * half_cells)
        inv_lam = 1.0 / dlam

        kc = jnp.cos(ang) * inv_lam
        ks = jnp.sin(ang) * inv_lam
        ox = kc * sdx + ks * sdy
        oy = kc * sdy - ks * sdx
        wm = jnp.where(
            dmask, jnp.exp(dexp * (ox * ox + oy * oy)) * f["mag"], 0.0)
        rel = jnp.mod(f["theta"] - ang, _TWO_PI)
        fb = jnp.mod(-rel, _TWO_PI) * (NB_ORI / _TWO_PI)
        ty = oy + half_cells - 0.5
        tx = ox + half_cells - 0.5

        wo = []
        for o in range(NB_ORI):
            od = jnp.abs(fb - o)
            wo.append(jnp.maximum(0.0, 1.0 - jnp.minimum(od, NB_ORI - od)))

        if variant == 0:
            def flat(x):
                if wc == 128:
                    return x.reshape(1, n)
                return jnp.concatenate(
                    [x[:, t * 128:(t + 1) * 128].reshape(1, n)
                     for t in range(wc // 128)], axis=1)

            u = jnp.concatenate(
                [flat(jnp.maximum(0.0, 1.0 - jnp.abs(ty - c)) * wm)
                 for c in range(NB_HIST)], axis=0)
            wx = [jnp.maximum(0.0, 1.0 - jnp.abs(tx - c))
                  for c in range(NB_HIST)]
            vmat = jnp.concatenate(
                [flat(wx[c] * wo[o]) for c in range(NB_HIST)
                 for o in range(NB_ORI)], axis=0)
            acc = jax.lax.dot_general(
                u.astype(jnp.bfloat16), vmat.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            desc_ref[0] = acc
        else:
            uy = [jnp.maximum(0.0, 1.0 - jnp.abs(ty - c))
                  for c in range(NB_HIST)]
            wx = [jnp.maximum(0.0, 1.0 - jnp.abs(tx - c))
                  for c in range(NB_HIST)]
            if variant == 1:
                def flat(x):
                    if wc == 128:
                        return x.reshape(1, n)
                    return jnp.concatenate(
                        [x[:, t * 128:(t + 1) * 128].reshape(1, n)
                         for t in range(wc // 128)], axis=1)

                u16 = jnp.concatenate(
                    [flat(uy[c] * wx[d]) for c in range(NB_HIST)
                     for d in range(NB_HIST)], axis=0)
                v8 = jnp.concatenate(
                    [flat(wo[o] * wm) for o in range(NB_ORI)], axis=0)
                acc = jax.lax.dot_general(
                    u16.astype(jnp.bfloat16), v8.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (16, 8)
            else:
                u16 = jnp.stack([uy[c] * wx[d] for c in range(NB_HIST)
                                 for d in range(NB_HIST)])   # (16, wr, wc)
                v8 = jnp.stack([wo[o] * wm for o in range(NB_ORI)])
                acc = jax.lax.dot_general(
                    u16.astype(jnp.bfloat16), v8.astype(jnp.bfloat16),
                    (((1, 2), (1, 2)), ((), ())),
                    preferred_element_type=jnp.float32)  # (16, 8)
            desc_ref[0] = acc.reshape(NB_HIST, NB_HIST * NB_ORI)

    return kernel


def desc_v(g4, count, addr, meta, *, geom, variant, n_buf=8):
    capp = addr.shape[0]
    kernel = make_desc_kernel_v(geom, capp, n_buf, variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(count,),
        in_specs=[
            pl.BlockSpec((8, 1, 16), lambda i, *s: (i // 8, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, NB_HIST, NB_HIST * NB_ORI),
                               lambda i, *s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_buf, geom.wr, geom.wc), jnp.float32),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((capp, NB_HIST, NB_HIST * NB_ORI),
                                       jnp.float32),
        grid_spec=grid_spec,
    )(jnp.asarray(count, jnp.int32).reshape(1), addr, meta, g4)


def timed(fn, args, k=10):
    out = fn(*args)
    _ = np.asarray(out).ravel()[:1]

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        _ = np.asarray(o).ravel()[:1]
        return time.perf_counter() - t0

    run(2)
    t1 = min(run(k) for _ in range(2))
    t2 = min(run(2 * k) for _ in range(2))
    return (t2 - t1) / k * 1e3


def main():
    n_kp = int(sys.argv[1]) if len(sys.argv) > 1 else 5952
    cfg = SiftConfig(max_nb_sift_per_buffer=32768)
    s = cfg.nb_scales_per_octave
    L = s + 2

    h_atlas, w_atlas = 5968, 3072
    g4 = jax.jit(lambda k: pb.make_shifted_copies(jax.random.uniform(
        k, (L, h_atlas, w_atlas), jnp.float32)))(jax.random.key(0))
    _ = float(g4[0, 0, 0, 0])
    print("atlas ready", flush=True)

    rng = np.random.default_rng(0)
    cap = ((n_kp + 7) // 8) * 8
    ys = rng.integers(8, 3000, cap)
    xs = rng.integers(8, 2040, cap)
    layer = rng.integers(1, L, cap)
    subs = np.abs(rng.normal(1.2, 0.8, cap)) % (s + 1)
    sig = cfg.seed_scale_sigma * 2.0 ** (subs / s)
    ang = rng.random(cap).astype(np.float32) * 6.28

    def mk_meta():
        cols = [xs.astype(np.float32), ys.astype(np.float32),
                sig.astype(np.float32),
                xs.astype(np.float32), ys.astype(np.float32),
                np.full(cap, 1.0, np.float32),
                np.full(cap, h_atlas - 2.0, np.float32),
                np.full(cap, w_atlas - 2.0, np.float32), ang]
        cols += [np.zeros(cap, np.float32)] * 7
        return jnp.asarray(np.stack(cols, -1).reshape(cap, 1, 16))

    def mk_addr(r1, wr, wc):
        ys_w = np.clip(((ys - r1) // 8) * 8, 0, h_atlas - wr)
        ss = np.clip(((xs - r1) // 64) * 64, 0, w_atlas - (wc - 64))
        cidx = (ss % 128) // 64
        ax = ss - 64 * cidx
        return jnp.asarray(
            (cidx + (layer << 2) + ((ys_w // 8) << 5)
             + ((ax // 128) << 16)).astype(np.int32))

    count = jnp.int32(n_kp)
    meta = mk_meta()
    wrs = pb.kernel_window_rows(cfg)
    edges = [pb.desc_window_edge(pb._sigma_max(cfg, pb._sigma_split(cfg))),
             pb.desc_window_edge(pb._sigma_max(cfg, s + 1))]

    ref = {}
    for b in (1, 0):
        wc = 128 if edges[b] + 63 <= 128 else 256
        geom = pb._KernelGeom(wr=wrs[b], wc=wc, h8=h_atlas, w32=w_atlas)
        addr = mk_addr((edges[b] - 1) // 2, wrs[b], wc)
        for variant, n_buf in ((0, 8), (1, 8), (2, 8), (2, 4)):
            tag = f"b{b} v{variant} nbuf{n_buf}"
            try:
                f = jax.jit(functools.partial(
                    desc_v, geom=geom, variant=variant, n_buf=n_buf))
                ms = timed(f, (g4, count, addr, meta))
                out = np.asarray(f(g4, count, addr, meta))[:n_kp]
                key_ = (b,)
                if key_ not in ref:
                    ref[key_] = out
                err = np.abs(out - ref[key_]).max()
                print(f"{tag}: {ms:7.2f} ms  {ms / n_kp * 1e3:6.2f} us/kp"
                      f"  max|d-v0|={err:.4f}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
