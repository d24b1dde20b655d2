"""Fused separable gaussian blur (+ DoG) Pallas kernel — the scale-space
hot loop (SURVEY.md §7 step 6; reference: shaders/GaussianBlur.comp +
DifferenceOfGaussian.comp and the per-octave command recording in
sift_detector.c:955-1037).

Why a kernel: the XLA formulation (ops/scale_space._conv1d_symmetric)
costs, per scale, two symmetric pads (2 reverses + concat each), two
shifted-slice MAC fusions, plus the DoG subtract — ~8 full-image HBM
round-trips and ~10 dispatched ops per scale x direction, i.e. ~380
executed ops in the compiled detect and most of the ScaleSpace time is
traffic/dispatch, not math (scripts/hlocount.py census). This kernel
computes H-then-V blur AND the DoG layer in ONE pass over the image: per
output tile it DMAs a halo block, runs both tap loops in VMEM with
cyclic rolls, fixes the mirror borders on narrow strips, and writes
blurred + DoG rows — ~2 executed ops per scale, ~2x less HBM traffic,
same FLOPs.

Semantics match ``blur_separable`` exactly: symmetric (MIRRORED_REPEAT)
boundaries — ``x[-1-m] == x[m]`` and ``x[H+m] == x[H-1-m]`` — with the
same H-then-V float accumulation order (tap 0, then +-1, ..., +-k).

Tiling: rows in blocks of ``_R`` with an 8-aligned ``_K8`` halo; columns
single-tile up to ``_MAX_SINGLE_W`` lanes (the VMEM stack budget for the
unrolled tap chain at k=13 runs out between 1536 and 2048 lanes), else
128-halo column tiles of ``_WT`` interior lanes. Clamp-shifted edge
tiles make any H % 8 == 0, W % 128 == 0 size work (overlapping rows or
columns recompute bit-identical values).

Eligibility (callers fall back to the XLA path otherwise):
* float32 pyramid (fp16 storage mode keeps the XLA path),
* H % 8 == 0, W % 128 == 0, H >= _RIN_MIN, W >= 256.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
# Output rows per grid step, env-tunable for hardware A/B: per-grid-step
# fixed overhead (~7 us measured at 3456x2304 octave 0) dominates the
# kernel, so fewer/bigger steps win as long as the remote compiler's
# 16 MB scoped-VMEM limit holds (the local deviceless compiler's
# accounting is looser — validate R bumps on hardware).
_R = int(_os.environ.get("VKSIFT_BLUR_R", "48"))
_K8 = 16           # 8-aligned row halo; max half-kernel is 13 (gaussian.py)
_RIN_MIN = 96      # minimum rows for the kernel path (= _R + 2*_K8)
_MAX_SINGLE_W = 1280   # single col-tile limit (VMEM stack, margin to 1536)
# Interior cols per tile when column-tiled. Wider tiles cut the DMA
# row-segment count (the binding constraint: strided block copies cost
# ~50 ns/row-segment on v5e — 54k segments/layer at WT=1024 explains
# the measured 2-5 ms/layer vs the ~0.5 ms HBM roofline).
_WT = int(_os.environ.get("VKSIFT_BLUR_WT", "1024"))
_CHALO = 128       # col halo (>= max half-kernel, 128-aligned)


def eligible(h: int, w: int, dtype) -> bool:
    return (dtype == jnp.float32 and h % 8 == 0 and w % 128 == 0
            and h >= _RIN_MIN and w >= 256)


def _rev128():
    """(128,128) exchange matrix (anti-diagonal) as an in-kernel const."""
    i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return (i + j == 127).astype(jnp.float32)


_FORI = _os.environ.get("VKSIFT_BLUR_FORI") == "1"


def _make_kernel(H: int, W: int, taps: Tuple[float, ...], with_dog: bool,
                 R: int, WT: int, CH: int):
    k = len(taps) - 1
    assert 1 <= k <= _K8, k
    RIN = R + 2 * _K8
    WB = WT + 2 * CH          # DMA'd block width (== W when CH == 0)

    def kernel(x_hbm, taps_ref, y_hbm, dog_hbm, xv2, yv2, dogv2,
               sin, sy, sd):
        # Double-buffered across (sequential) grid steps: the serial
        # start/wait input + end-of-step output drain left every step
        # stalled on DMA latency (the whole-kernel pyramid measured
        # 22.4 ms at 3456x2304 vs a ~5 ms HBM roofline). Step t
        # prefetches t+1's input into the other slot and defers each
        # output drain until that slot is next written (t+2) or the
        # final step.
        ti = pl.program_id(0)
        col = pl.program_id(1)
        ncols = pl.num_programs(1)
        t = ti * ncols + col          # last grid dim varies fastest
        total = pl.num_programs(0) * ncols

        def geom_at(tt):
            r0 = jnp.minimum((tt // ncols) * R, H - R)
            ys = jnp.clip(r0 - _K8, 0, H - RIN)
            c0_ = jnp.minimum(jax.lax.rem(tt, ncols) * WT, W - WT)
            cs = jnp.clip(c0_ - CH, 0, W - WB)
            return r0, ys, c0_, cs

        def in_dma(slot, tt):
            _, ys, _, cs = geom_at(tt)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(ys, 8), RIN),
                         pl.ds(pl.multiple_of(cs, 128), WB)],
                xv2.at[slot], sin.at[slot])

        row0, ystart, col0, cstart = geom_at(t)

        def out_y(slot):
            return pltpu.make_async_copy(
                yv2.at[slot],
                y_hbm.at[pl.ds(pl.multiple_of(row0, 8), R),
                         pl.ds(pl.multiple_of(col0, 128), WT)],
                sy.at[slot])

        def out_dog(slot):
            return pltpu.make_async_copy(
                dogv2.at[slot],
                dog_hbm.at[pl.ds(pl.multiple_of(row0, 8), R),
                           pl.ds(pl.multiple_of(col0, 128), WT)],
                sd.at[slot])

        def run_slot(xv, yv, dogv, slot_i):
            compute_body(xv, taps_ref, yv, dogv, row0, ystart, col0,
                         cstart)
            out_y(slot_i).start()
            if with_dog:
                out_dog(slot_i).start()

        import os as _os
        if _os.environ.get("VKSIFT_BLUR_DB", "1") == "0":
            # Serial A/B arm: single slot, fully in-line start/wait.
            in_dma(0, t).start()
            in_dma(0, t).wait()
            run_slot(xv2.at[0], yv2.at[0], dogv2.at[0], 0)
            out_y(0).wait()
            if with_dog:
                out_dog(0).wait()
            return

        slot = jax.lax.rem(t, 2)

        @pl.when(t == 0)
        def _():
            in_dma(0, t).start()

        @pl.when(t + 1 < total)
        def _():
            in_dma(1 - slot, t + 1).start()

        in_dma(slot, t).wait()

        # Drain the output DMAs issued two steps ago on this slot before
        # overwriting its buffers (wait matches on byte count, so the
        # reconstructed descriptor's differing address is fine).
        @pl.when(t >= 2)
        def _():
            out_y(slot).wait()
            if with_dog:
                out_dog(slot).wait()

        # ONE body instance: the block is read out of the alternating
        # slot as a value (a dynamic leading-index slice — measured
        # indistinguishable from the static-slot pl.when duplication on
        # v5e, results/hw_r5b vs r5c, while the duplication DOUBLED the
        # body's scoped-VMEM live set and forced R down).
        run_slot(xv2.at[slot], yv2.at[slot], dogv2.at[slot], slot)

        # Final step: drain everything still in flight.
        @pl.when(t == total - 1)
        def _():
            out_y(slot).wait()
            if with_dog:
                out_dog(slot).wait()

            @pl.when(t >= 1)
            def _():
                out_y(1 - slot).wait()
                if with_dog:
                    out_dog(1 - slot).wait()

        return

    def compute_body(xv, taps_ref, yv, dogv, row0, ystart, col0, cstart):
        x = xv[...]                                   # (RIN, WB) f32

        rev = _rev128()

        # ---------------- H pass (lanes), mirror at 0 / W-1 -------------
        # Interior via cyclic lane rolls (halo >= k covers tile edges);
        # image borders recomputed on 128-lane strips with reversed-tile
        # values and spliced where the GLOBAL lane is within k of an edge
        # (strips carry correct values exactly when this tile touches the
        # image edge; elsewhere the splice mask is empty).
        # Tap accumulation: optionally a fori_loop (VKSIFT_BLUR_FORI=1)
        # — the unrolled chain's temporaries dominate the kernel's
        # scoped-VMEM footprint (WT=1536 lands 16.04M vs the 16M limit,
        # hw round-5), while the loop form holds ~4 live buffers and
        # unlocks wide tiles. Bit-identical accumulation order; traced
        # roll amounts are supported hardware lane rotates.
        if _FORI:
            def hstep(j, a):
                return a + (pltpu.roll(x, j, 1)
                            + pltpu.roll(x, WB - j, 1)) * taps_ref[j]

            acc = jax.lax.fori_loop(1, k + 1, hstep, x * taps[0])
        else:
            acc = x * taps[0]
            for j in range(1, k + 1):
                acc = acc + (pltpu.roll(x, j, 1)
                             + pltpu.roll(x, WB - j, 1)) * taps[j]

        first = x[:, :128]                            # (RIN, 128)
        last = x[:, WB - 128:]
        revf = jax.lax.dot_general(                   # revf[:,p]=x[:,127-p]
            first, rev, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        revl = jax.lax.dot_general(                   # revl[:,p]=x[:,WB-1-p]
            last, rev, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # (1, 128) iota broadcast in the wheres: the full (RIN, 128)
        # form was the 40 KB that pushed WT=1536 over the 16 MB scoped
        # VMEM limit.
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        accl = first * taps[0]
        accr = last * taps[0]
        for j in range(1, k + 1):
            # left strip, lanes c in [0,128): x[c-j] with mirror c-j<0 ->
            # x[j-c-1] = roll(revf, j)[c]; plain value = roll(first, j)[c]
            # (cyclic garbage only at c<j, exactly where the mirror wins).
            left_m = pltpu.roll(revf, j, 1)
            left_p = pltpu.roll(first, j, 1)
            xm = jnp.where(lane128 < j, left_m, left_p)
            # x[c+j]: in-tile roll valid for c < 128-j; the strip is only
            # consumed at c < k and k + j <= 26 < 128, so always in-tile.
            xp = pltpu.roll(first, 128 - j, 1)
            accl = accl + (xm + xp) * taps[j]
            # right strip, lanes c in [WB-128, WB): x[c+j] with mirror
            # c+j>=W -> x[2W-1-c-j] = roll(revl, 128-j)[c_local].
            right_m = pltpu.roll(revl, 128 - j, 1)
            right_p = pltpu.roll(last, 128 - j, 1)
            xp2 = jnp.where(lane128 >= 128 - j, right_m, right_p)
            xm2 = pltpu.roll(last, j, 1)
            accr = accr + (xp2 + xm2) * taps[j]

        # Splice the edge strips per 128-lane TILE instead of building
        # two full-size pads + a full-size global-lane iota (three
        # (RIN, WB) buffers of scoped VMEM): the mirror lanes live only
        # in the block's first/last lane tile, and only when that tile
        # touches the image edge (cstart == 0 / cstart + WB == W,
        # traced scalars broadcast into the tile-local wheres).
        left_edge = (cstart == 0) & (lane128 < k)
        right_edge = (cstart + WB == W) & (lane128 >= 128 - k)
        repl0 = jnp.where(left_edge, accl, acc[:, :128])
        repl1 = jnp.where(right_edge, accr, acc[:, WB - 128:])
        mid = [acc[:, 128:WB - 128]] if WB > 256 else []
        xh = jnp.concatenate([repl0] + mid + [repl1], axis=1)

        # ---------------- V pass (sublanes), mirror at 0 / H-1 ----------
        if _FORI:
            def vstep(j, a):
                return a + (pltpu.roll(xh, j, 0)
                            + pltpu.roll(xh, RIN - j, 0)) * taps_ref[j]

            accv = jax.lax.fori_loop(1, k + 1, vstep, xh * taps[0])
        else:
            accv = xh * taps[0]
            for j in range(1, k + 1):
                accv = accv + (pltpu.roll(xh, j, 0)
                               + pltpu.roll(xh, RIN - j, 0)) * taps[j]

        # Image-edge rows: global row g = ystart + u needs the mirror when
        # g-j < 0 or g+j >= H; whenever that holds for a KEPT row, the
        # mirror source row is inside this block, and the row-reversed
        # block revv[u] = xh[RIN-1-u] provides it via a traced roll.
        # Interior tiles skip the whole fix (lax.cond).
        def fix_rows():
            i8 = jax.lax.broadcasted_iota(jnp.int32, (RIN, RIN), 0)
            j8 = jax.lax.broadcasted_iota(jnp.int32, (RIN, RIN), 1)
            revm = (i8 + j8 == RIN - 1).astype(jnp.float32)
            revv = jax.lax.dot_general(               # revv[u]=xh[RIN-1-u]
                revm, xh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            rows = jax.lax.broadcasted_iota(jnp.int32, (RIN, WB), 0)
            out = xh * taps[0]
            M = H - ystart
            for j in range(1, k + 1):
                lo_thr = j - ystart            # u < lo_thr -> mirror low
                xm = pltpu.roll(xh, j, 0)
                # low mirror (triggers only when ystart==0): value
                # xh[j-u-1] = revv[RIN-1-(j-u-1)] = roll(revv, j)[u].
                xm_m = pltpu.roll(revv, jnp.mod(j - ystart, RIN), 0)
                xm = jnp.where(rows < lo_thr, xm_m, xm)
                xp = pltpu.roll(xh, RIN - j, 0)
                hi_thr = M - j                 # u >= hi_thr -> mirror high
                # high mirror: xh[2M-1-u-j] = roll(revv, 2M-j)[u].
                xp_m = pltpu.roll(revv, jnp.mod(2 * M - j, RIN), 0)
                xp = jnp.where(rows >= hi_thr, xp_m, xp)
                out = out + (xm + xp) * taps[j]
            return out

        needs_fix = (ystart < k) | (ystart + RIN > H - k)
        accv = jax.lax.cond(needs_fix, fix_rows, lambda: accv)

        # ---------------- outputs --------------------------------------
        # Mosaic has no dynamic_slice on values: extract the kept region
        # with traced rolls + static slices (offsets never wrap for the
        # kept rows/cols).
        c0 = row0 - ystart                           # multiple of 8
        d0 = col0 - cstart                           # multiple of 128
        def center(a):
            a = pltpu.roll(a, jnp.mod(RIN - c0, RIN), 0)[:R]
            if WB != WT:
                a = pltpu.roll(a, jnp.mod(WB - d0, WB), 1)[:, :WT]
            return a
        yv[...] = center(accv)
        if with_dog:
            dogv[...] = yv[...] - center(x)

    return kernel, RIN, WB


@functools.partial(jax.jit, static_argnames=("taps", "with_dog"))
def blur_dog_tpu(x: jax.Array, taps: Tuple[float, ...],
                 with_dog: bool = True
                 ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Blur ``x`` (H, W) f32 with the symmetric half-kernel ``taps`` and
    (optionally) return ``dog = blurred - x`` — one fused pass.

    Exact same boundary semantics and accumulation order as
    ``scale_space.blur_separable`` (golden-tested in
    tests/test_pallas_blur.py).
    """
    H, W = x.shape
    assert eligible(H, W, x.dtype), (H, W, x.dtype)
    R = _R if H >= _R + 2 * _K8 else 8 * max(1, (H - 2 * _K8) // 8)
    if W <= _MAX_SINGLE_W:
        WT, CH = W, 0
    else:
        WT, CH = _WT, _CHALO
    kernel, RIN, WB = _make_kernel(
        H, W, tuple(float(t) for t in taps), with_dog, R, WT, CH)
    shapes = [jax.ShapeDtypeStruct((H, W), jnp.float32)]
    if with_dog:
        shapes.append(jax.ShapeDtypeStruct((H, W), jnp.float32))

    taps_arr = jnp.asarray(list(taps), jnp.float32)
    out = pl.pallas_call(
        kernel if with_dog else
        (lambda x_hbm, taps_ref, y_hbm, xv2, yv2, dogv2, sin, sy, sd:
         kernel(x_hbm, taps_ref, y_hbm, None, xv2, yv2, dogv2,
                sin, sy, sd)),
        grid=(pl.cdiv(H, R), pl.cdiv(W, WT)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(shapes),
        out_shape=shapes,
        scratch_shapes=[
            pltpu.VMEM((2, RIN, WB), jnp.float32),
            pltpu.VMEM((2, R, WT), jnp.float32),
            pltpu.VMEM((2, R, WT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x, taps_arr)
    if with_dog:
        return out[0], out[1]
    return out[0], None
