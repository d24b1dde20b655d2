"""Fused orientation + descriptor TPU kernels (Pallas).

The reference runs ComputeOrientation (32 threads/keypoint) and
ComputeDescriptors (64 threads/keypoint) as indirect dispatches so device
work scales with the *actual* keypoint count (sift_detector.c:1191-1259).
This module is the TPU equivalent: Pallas kernels with a DYNAMIC grid equal
to the live keypoint/pair count — no skipped-step overhead, static XLA
shapes.

Two kernels (profiling on v5e showed that tiny (1, 36) histogram
smoothing/peak ops inside a per-keypoint kernel are op-issue bound and cost
more than all the windowed vector math combined — so anything per-keypoint
that is small moves OUT to batched XLA):

* **K1 (histogram)**: per keypoint, DMA a small window (orientation radius)
  of the keypoint's gaussian layer from a whole-pyramid ATLAS, compute
  gradients (in-kernel polynomial atan2 — Mosaic lacks the primitive),
  gaussian-weighted magnitudes, and the raw 36-bin histogram
  (ComputeOrientation.comp:70-121). Smoothing, parabolic peak
  interpolation and top-k selection run vectorized in XLA
  (:mod:`.orientation.peaks_from_histograms`).
* **K2 (descriptor)**: per (keypoint, orientation) pair, DMA the larger
  descriptor window (three sigma buckets — per-pair cost is linear in
  window area on v5e, so the common low-sigma pairs get small windows),
  rebuild gradients, and accumulate the 128-bin descriptor as ONE MXU
  matmul ``desc(4,32) = U(4,N) @ V(32,N)^T`` in bf16 with f32 accumulation
  (ComputeDescriptors.comp:106-198) — replacing the shader's fixed-point
  shared-memory atomics.

Window DMA alignment: rows align to 8 (f32 sublane tile); every window
DMAs TWO lane tiles (256 cols) from the single atlas at a 128-aligned
start, and the kernel repositions the content to lane 0 with a dynamic
in-kernel roll, slicing back to one 128-lane tile for compute — so no
lane-shifted atlas copies exist at all (rounds 1-2 built 4 then 2 shifted
copies to avoid in-kernel rolls; the copies were the largest allocation
and their build the largest fixed cost at big resolutions). Keypoints/
pairs whose window fits a 64-lane half run 2-per-grid-step through the
*packed* kernel variants (content rolled to lanes 0 and 64, per-pixel
math shared — the kernels are VPU-bound and lanes past the window edge
were dead). DMAs are multi-buffered ``_PREFETCH`` steps ahead. Only a
packed address word lives in SMEM (~1 MB total); all other per-keypoint
metadata arrives as VMEM blocks spanning 8 grid steps.

Normalization/quantization to u8 runs in XLA afterwards (tiny).
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import (L2_NORM_THRESHOLD, LAMBDA_DESCRIPTOR,
                      LAMBDA_ORIENTATION, NB_HIST, NB_ORI,
                      NB_ORI_HIST_BINS, ORI_PEAK_RATIO, SiftConfig)

_TWO_PI = 2.0 * math.pi
_N_BUF = 8             # DMA multi-buffering slots
_PREFETCH = 7          # DMA prefetch distance (< _N_BUF)
# Largest descriptor window edge eligible for the 2-pairs-per-window
# lane-packed kernel: each pair's window (content + gradient ring) must fit
# one 64-lane half after the in-kernel repositioning roll.
_PACK_MAX_EDGE = 64


# ---------------------------------------------------------------------------
# In-kernel atan2 (Mosaic lacks the primitive)
# ---------------------------------------------------------------------------

# Minimax polynomial for atan(t), t in [0, 1]; |err| < 1e-5 rad — far below
# the orientation histogram bin width (2pi/36 ~ 0.175 rad).
_ATAN_COEFFS = (0.9998660, -0.3302995, 0.1801410, -0.0851330, 0.0208351)


def _atan01(t: jax.Array) -> jax.Array:
    z = t * t
    p = _ATAN_COEFFS[-1]
    for c in _ATAN_COEFFS[-2::-1]:
        p = p * z + c
    return p * t


def atan2_0_2pi(y: jax.Array, x: jax.Array,
                approx_div: bool = False) -> jax.Array:
    """atan2(y, x) mapped to [0, 2pi); safe at (0, 0) (returns ~0).

    ``approx_div=True`` replaces the octant-reduction divide with the
    VPU's approximate reciprocal (~2^-12 relative error -> <= 2.5e-4 rad
    angle error). The DESCRIPTOR kernels use it (error is ~3e-4 of one
    8-bin soft-binning cell, invisible after u8 quantization); the
    HISTOGRAM kernels keep the exact divide — the 36-bin hard binning +
    parabolic peak interpolation amplifies per-pixel bin flips into
    >1e-3 rad orientation shifts vs the XLA/golden path."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    if approx_div:
        t = mn * pl.reciprocal(jnp.maximum(mx, 1e-30), approx=True)
    else:
        t = mn / jnp.maximum(mx, 1e-30)
    p = _atan01(t)
    r = jnp.where(ay > ax, (math.pi / 2) - p, p)
    r = jnp.where(x < 0, math.pi - r, r)
    r = jnp.where(y < 0, _TWO_PI - r, r)
    # y<0 branch can yield exactly 2pi when r was 0; fold it back.
    return jnp.where(r >= _TWO_PI, r - _TWO_PI, r)


def _ori_rows(theta, ang, wm, use_vlfeat):
    """The 8 orientation-bin rows of the descriptor contraction, with the
    pixel weight ``wm`` folded in.

    Exactly two adjacent circular bins receive weight per pixel
    ((1 - fo) at floor(fb), fo at floor(fb)+1 mod 8, fo = frac(fb)), so
    building the rows from one floor/frac + two selects per row replaces
    the 8 circular-hat chains (abs/min/sub/max each) AND the 4 spatial-row
    wm multiplies — ~20 fewer VPU ops per window element in the hottest
    kernels. Same math as ComputeDescriptors.comp:167-198; UBC vs VLFeat
    is the bin direction sign (vulkansift_types.h:132-135)."""
    sgn = 1.0 if use_vlfeat else -1.0
    x = (theta - ang) * (sgn * (NB_ORI / _TWO_PI))
    fb = x - NB_ORI * jnp.floor(x * (1.0 / NB_ORI))  # wrap to [0, 8]
    ob = jnp.floor(fb)
    fo = fb - ob
    ob = jnp.where(ob >= NB_ORI, 0.0, ob)            # fb == 8.0 edge
    obp = jnp.where(ob + 1.0 >= NB_ORI, 0.0, ob + 1.0)
    wm1 = wm * (1.0 - fo)
    wm2 = wm * fo
    return [jnp.where(ob == o, wm1, jnp.where(obp == o, wm2, 0.0))
            for o in range(NB_ORI)]


# ---------------------------------------------------------------------------
# Window geometry
# ---------------------------------------------------------------------------

def desc_window_edge(sigma_oct_max: float) -> int:
    """Descriptor window edge (pixels) incl. the gradient ring for the
    bucket's max sigma: 2*(int_radius+1)+1 with int_radius =
    floor(sqrt(2)*3*sigma*(NB_HIST+1)/2 + 0.5) (ComputeDescriptors.comp:
    106-109)."""
    r = int(math.floor(math.sqrt(2.0) * LAMBDA_DESCRIPTOR * sigma_oct_max
                       * (NB_HIST + 1) * 0.5 + 0.5))
    return 2 * (r + 1) + 1


def ori_window_edge(sigma_oct_max: float) -> int:
    """Orientation window edge incl. gradient ring: box radius
    floor(3*1.5*sigma) (ComputeOrientation.comp:70-71)."""
    r = int(math.floor(3.0 * LAMBDA_ORIENTATION * sigma_oct_max))
    return 2 * (r + 1) + 1


def _max_subpix_for_edge(config: SiftConfig, max_edge: int) -> float:
    """Largest subpix_s whose descriptor window edge fits ``max_edge``
    (edge is monotone in sigma; bisect to float precision)."""
    lo, hi = 0.0, float(config.nb_scales_per_octave + 1)
    if desc_window_edge(_sigma_max(config, hi)) <= max_edge:
        return hi
    for _ in range(50):
        mid = 0.5 * (lo + hi)
        if desc_window_edge(_sigma_max(config, mid)) <= max_edge:
            lo = mid
        else:
            hi = mid
    return lo


def _max_subpix_for_ori_edge(config: SiftConfig, max_edge: int) -> float:
    """Largest subpix_s whose ORIENTATION window edge fits ``max_edge``."""
    lo, hi = 0.0, float(config.nb_scales_per_octave + 1)
    if ori_window_edge(_sigma_max(config, hi)) <= max_edge:
        return hi
    for _ in range(50):
        mid = 0.5 * (lo + hi)
        if ori_window_edge(_sigma_max(config, mid)) <= max_edge:
            lo = mid
        else:
            hi = mid
    return lo


def _sigma_splits(config: SiftConfig) -> Tuple[float, float]:
    """subpix_s thresholds splitting pairs into 3 window-size buckets.

    Smaller windows for the common low-sigma keypoints: per-pair kernel
    cost is linear in window area (measured on v5e), and the subpix_s
    distribution concentrates near the low scales. The second split is
    pinned to the largest sigma whose window edge fits a 64-lane half
    (when that is feasible), so buckets 0 AND 1 qualify for the 2-pair
    lane-packed kernel (see _make_desc_kernel_packed)."""
    hi = config.nb_scales_per_octave + 1
    s2_pack = _max_subpix_for_edge(config, _PACK_MAX_EDGE)
    s2 = s2_pack if hi / 3.0 < s2_pack < hi else 2.0 * hi / 3.0
    return (min(hi / 3.0, s2), s2)


def _sigma_max(config: SiftConfig, subpix_s: float) -> float:
    return config.seed_scale_sigma * 2.0 ** (
        subpix_s / config.nb_scales_per_octave)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _window_rows(edge: int) -> int:
    # Coverage: edge + <=7 row alignment slack, rounded to the f32 tile.
    return _round_up(edge + 7, 8)


class _KernelGeom(NamedTuple):
    wr: int   # window rows (8-aligned)
    wc: int   # window cols (128 or 256)
    h8: int   # padded atlas rows
    w32: int  # padded atlas cols (128-multiple)


# Packed DMA-address word: layer (3b) | ys/8 (11b) | ax/128 (7b) |
# delta+64 (9b). Windows DMA from the SINGLE atlas at 128-aligned lane
# starts (two lane tiles wide) and every kernel repositions the content to
# lane 0 (or lane 64 for a packed pair's B half) with a dynamic roll of
# ``delta = (cx - r1) - window_start`` — so no lane-shifted atlas copies
# exist at all. Field widths bound the atlas at 16384 rows and 16256 cols
# (asserted in run_atlas) and delta at [-64, 447] (worst case is the
# right-edge clamp, 256 - r1).
_ADDR_YS_SHIFT = 3
_ADDR_AX_SHIFT = 14
_ADDR_SH_SHIFT = 21


def pack_addr(layer, ys, ax, delta):
    return (layer + ((ys // 8) << _ADDR_YS_SHIFT)
            + ((ax // 128) << _ADDR_AX_SHIFT)
            + ((delta + 64) << _ADDR_SH_SHIFT)).astype(jnp.int32)


def _decode_delta(a):
    return jax.lax.rem(a >> _ADDR_SH_SHIFT, 512) - 64


# ---------------------------------------------------------------------------
# Shared kernel machinery
# ---------------------------------------------------------------------------

def _dma_machinery(count_ref, addr_ref, gauss_ref, wscr, sems, geom, capp,
                   *, clamp_to_count=False):
    """Returns (start_dma, wait_current) closures for the standard
    multi-buffered window-DMA pattern.

    ``clamp_to_count``: start the DMA for every entry the grid will WAIT
    on (2 per step), clamping the address index to the last live entry —
    for kernels that consume a fixed number of entries per grid step and
    must be able to wait on a slot whose entry index is past the live
    count (the packed 2-pair kernel's odd tail). Starts are still guarded
    to the grid's total entry coverage: an entry the grid never waits on
    must never start, or the kernel exits with the DMA in flight — a
    runtime abort on hardware (caught on v5e, round 3)."""
    wr, wc = geom.wr, geom.wc

    def _start(idx, i):
        a = addr_ref[idx]
        layer = jax.lax.rem(a, 8)
        ys = jax.lax.rem(a >> _ADDR_YS_SHIFT, 2048) * 8
        ax = jax.lax.rem(a >> _ADDR_AX_SHIFT, 128) * 128
        slot = jax.lax.rem(i, _N_BUF)
        pltpu.make_async_copy(
            gauss_ref.at[layer,
                         pl.ds(pl.multiple_of(ys, 8), wr),
                         pl.ds(pl.multiple_of(ax, 128), wc)],
            wscr.at[slot], sems.at[slot]).start()

    def start_dma(i):
        if clamp_to_count:
            # Grid is ceil(count/2) steps consuming 2 entries each, so the
            # coverage limit is count rounded up to even. (Computed from
            # count_ref, not pl.num_programs — the latter has no CPU
            # interpret-mode lowering.)
            cnt = count_ref[0]
            @pl.when(i < cnt + jax.lax.rem(cnt, 2))
            def _():
                _start(jnp.clip(jnp.minimum(i, count_ref[0] - 1), 0,
                                capp - 1), i)
        else:
            @pl.when(i < count_ref[0])
            def _():
                _start(jnp.minimum(i, capp - 1), i)

    def wait_current(step):
        slot = jax.lax.rem(step, _N_BUF)
        pltpu.make_async_copy(
            gauss_ref.at[0, pl.ds(0, wr), pl.ds(0, wc)],
            wscr.at[slot], sems.at[slot]).wait()
        return wscr[slot]

    return start_dma, wait_current


def _window_fields(win, step, addr_ref, meta, geom, approx_div=False):
    """Common per-window quantities: gradients, magnitude, angle, coords,
    interior mask, and per-keypoint metadata scalars.

    The DMA'd window (wr, geom.wc) has its content at lanes
    [delta, delta+edge); a dynamic roll moves it to lane 0 and (for
    two-tile DMAs) a static slice drops the now-empty upper tile, so
    compute always runs on (wr, 128). Wrapped lanes carry px outside the
    image interior or the window radius, so the existing masks reject
    them (right-edge clamp case: wrapped px >= window_start + geom.wc >
    xhi; left clamp: wrapped px < cx - r1 < cx - radius)."""
    wr, wc = geom.wr, geom.wc
    a = addr_ref[step]
    ys0 = jax.lax.rem(a >> _ADDR_YS_SHIFT, 2048) * 8
    ss0 = jax.lax.rem(a >> _ADDR_AX_SHIFT, 128) * 128
    delta = _decode_delta(a)

    win = pltpu.roll(win, jnp.mod(wc - delta, wc), 1)
    if wc != 128:
        win = win[:, :128]
    wcc = 128
    gx = 0.5 * (pltpu.roll(win, wcc - 1, 1) - pltpu.roll(win, 1, 1))
    gy = 0.5 * (pltpu.roll(win, wr - 1, 0) - pltpu.roll(win, 1, 0))
    mag = jnp.sqrt(gx * gx + gy * gy)
    theta = atan2_0_2pi(gy, gx, approx_div=approx_div)

    ii = jax.lax.broadcasted_iota(jnp.int32, (wr, wcc), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (wr, wcc), 1)
    py = (ys0 + ii).astype(jnp.float32)
    px = (ss0 + delta + jj).astype(jnp.float32)

    sxf, syf, sig = meta[0:1, 0:1], meta[0:1, 1:2], meta[0:1, 2:3]
    cxf, cyf = meta[0:1, 3:4], meta[0:1, 4:5]
    ylo, yhi, xhi = meta[0:1, 5:6], meta[0:1, 6:7], meta[0:1, 7:8]

    # Structural window border (roll wrap) + per-keypoint image interior
    # (atlas band bounds, atlas coordinates).
    mask0 = ((ii >= 1) & (ii <= wr - 2) & (jj >= 1) & (jj <= wcc - 2)
             & (px >= 1) & (px <= xhi) & (py >= ylo) & (py <= yhi))
    return dict(mag=mag, theta=theta, px=px, py=py, mask0=mask0,
                sx=sxf, sy=syf, sig=sig, cx=cxf, cy=cyf)


# ---------------------------------------------------------------------------
# K1: orientation histogram kernel
# ---------------------------------------------------------------------------

def _make_hist_kernel(geom: _KernelGeom, capp: int):
    nb = NB_ORI_HIST_BINS
    assert nb == 36, "6x6 histogram factorization assumes 36 bins"

    def kernel(count_ref, addr_ref, meta_ref, gauss_ref, hist_ref,
               wscr, sems):
        step = pl.program_id(0)
        start_dma, wait_current = _dma_machinery(
            count_ref, addr_ref, gauss_ref, wscr, sems, geom, capp)

        @pl.when(step == 0)
        def _():
            for p in range(_PREFETCH):
                start_dma(jnp.int32(p))

        start_dma(step + _PREFETCH)
        win = wait_current(step)
        f = _window_fields(win, step, addr_ref,
                           meta_ref[jax.lax.rem(step, 8)], geom)

        # Gaussian-weighted magnitudes over the sigma-dependent box
        # (ComputeOrientation.comp:70-99).
        slam = LAMBDA_ORIENTATION * f["sig"]
        obr = jnp.floor(3.0 * slam)
        oexp = -1.0 / (2.0 * slam * slam)
        dxi = f["px"] - f["cx"]
        dyi = f["py"] - f["cy"]
        sdx = f["px"] - f["sx"]
        sdy = f["py"] - f["sy"]
        omask = (f["mask0"] & (jnp.abs(dxi) <= obr)
                 & (jnp.abs(dyi) <= obr))
        om = jnp.where(
            omask, jnp.exp((sdx * sdx + sdy * sdy) * oexp) * f["mag"], 0.0)
        bins = jnp.minimum(
            jnp.floor(f["theta"] * (nb / _TWO_PI)), nb - 1).astype(jnp.int32)
        # 36 masked reductions. Measured-and-rejected alternative
        # (round 4, v5e): factoring the one-hot as a 6x6 outer product
        # (12 rows + one f32-HIGHEST MXU dot) DOUBLED the kernel cost
        # (0.43 -> 0.90 us/kp, results/hw_r4a/kernelbench.log) — the
        # compare+select+reduce chains fuse well on the VPU, the
        # flatten-copies + HIGHEST dot do not.
        hist = jnp.concatenate(
            [jnp.sum(jnp.where(bins == b, om, 0.0)).reshape(1, 1)
             for b in range(nb)], axis=1)
        hist_ref[:] = hist.reshape(1, 1, nb)

    return kernel


def orientation_hist_tpu(gauss4: jax.Array, count: jax.Array,
                         addr: jax.Array, meta: jax.Array, *,
                         geom: _KernelGeom) -> jax.Array:
    """Raw 36-bin orientation histograms for ``count`` keypoints.

    Rows at index >= count are UNWRITTEN garbage; callers must mask."""
    capp = addr.shape[0]
    if capp % 8:
        pad = 8 - capp % 8
        addr = jnp.pad(addr, (0, pad))
        meta = jnp.pad(meta, ((0, pad), (0, 0), (0, 0)))
    capp_p = addr.shape[0]
    kernel = _make_hist_kernel(geom, capp_p)
    count = jnp.asarray(count, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(count,),
        in_specs=[
            pl.BlockSpec((8, 1, 8), lambda i, *s: (i // 8, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, NB_ORI_HIST_BINS),
                               lambda i, *s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_N_BUF, geom.wr, geom.wc), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    hist = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((capp_p, 1, NB_ORI_HIST_BINS),
                                       jnp.float32),
        grid_spec=grid_spec,
    )(count.reshape(1), addr, meta, gauss4)
    return hist.reshape(capp_p, NB_ORI_HIST_BINS)[:capp]


def _make_hist_kernel_packed(geom: _KernelGeom, capp: int, edge: int):
    """2 keypoints per grid step (orientation window edge <= 64 lanes).

    Same lane-half packing as :func:`_make_desc_kernel_packed` (see its
    wrap-garbage analysis), plus the 36 per-bin masked reductions become
    ONE MXU contraction: hist (2, 36) = om2 (2, N) @ onehot-bins (36, N)^T
    with the two rows masked to the A/B lane halves — the per-bin
    reduction trees were the dominant op-issue cost of the unpacked
    kernel."""
    wr, wc = geom.wr, geom.wc
    assert edge <= _PACK_MAX_EDGE
    n = wr * 128
    nb = NB_ORI_HIST_BINS
    r1 = (edge - 1) // 2

    def kernel(count_ref, addr_ref, meta_ref, gauss_ref, hist_ref,
               wscr, sems):
        step = pl.program_id(0)
        start_dma, wait_current = _dma_machinery(
            count_ref, addr_ref, gauss_ref, wscr, sems, geom, capp,
            clamp_to_count=True)

        @pl.when(step == 0)
        def _():
            for p in range(6):
                start_dma(jnp.int32(p))

        start_dma(2 * step + 6)
        start_dma(2 * step + 7)
        wa = wait_current(2 * step)
        wb = wait_current(2 * step + 1)

        mrow = jax.lax.rem(2 * step, 8)
        ma = meta_ref[mrow]
        mb = meta_ref[mrow + 1]

        def dec(i):
            a = addr_ref[jnp.clip(jnp.minimum(i, count_ref[0] - 1), 0,
                                  capp - 1)]
            ys = jax.lax.rem(a >> _ADDR_YS_SHIFT, 2048) * 8
            ss = jax.lax.rem(a >> _ADDR_AX_SHIFT, 128) * 128
            return ys, ss, _decode_delta(a)

        ysA, ssA, dA = dec(2 * step)
        ysB, ssB, dB = dec(2 * step + 1)
        ii = jax.lax.broadcasted_iota(jnp.int32, (wr, 128), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (wr, 128), 1)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        in_a1 = lane1 < 64
        in_a = jj < 64
        wa_r = pltpu.roll(wa, jnp.mod(wc - dA, wc), 1)[:, :128]
        wb_r = pltpu.roll(wb, jnp.mod(64 - dB, wc), 1)[:, :128]
        win = jnp.where(in_a, wa_r, wb_r)

        gx = 0.5 * (pltpu.roll(win, 127, 1) - pltpu.roll(win, 1, 1))
        gy = 0.5 * (pltpu.roll(win, wr - 1, 0) - pltpu.roll(win, 1, 0))
        mag = jnp.sqrt(gx * gx + gy * gy)
        theta = atan2_0_2pi(gy, gx)

        def sel(k):
            return jnp.where(in_a1, ma[0:1, k:k + 1], mb[0:1, k:k + 1])

        sx, sy, sig = sel(0), sel(1), sel(2)
        cx, cy = sel(3), sel(4)
        ylo, yhi, xhi = sel(5), sel(6), sel(7)

        ybase = jnp.where(in_a1, ysA, ysB).astype(jnp.float32)
        xbase = jnp.where(in_a1, ssA + dA,
                          ssB + dB - 64).astype(jnp.float32)
        py = ybase + ii.astype(jnp.float32)
        px = xbase + jj.astype(jnp.float32)
        mask0 = ((ii >= 1) & (ii <= wr - 2)
                 # Disjoint lane-half interiors: a plain OR, NOT a
                 # jnp.where over boolean vectors — Mosaic materializes
                 # bool select operands as i8 and cannot truncate
                 # vector<i8> back to i1 (compile failure on v5e).
                 & (((jj >= 1) & (jj <= 62))
                    | ((jj >= 65) & (jj <= 126)))
                 & (px >= 1) & (px <= xhi) & (py >= ylo) & (py <= yhi))

        slam = jnp.maximum(LAMBDA_ORIENTATION * sig, 1e-3)
        obr = jnp.floor(3.0 * slam)
        oexp = -1.0 / (2.0 * slam * slam)
        dxi = px - cx
        dyi = py - cy
        sdx = px - sx
        sdy = py - sy
        omask = (mask0 & (jnp.abs(dxi) <= obr) & (jnp.abs(dyi) <= obr))
        om = jnp.where(
            omask, jnp.exp((sdx * sdx + sdy * sdy) * oexp) * mag, 0.0)
        bins = jnp.minimum(
            jnp.floor(theta * (nb / _TWO_PI)), nb - 1).astype(jnp.int32)

        def flat(x):
            return x.reshape(1, n)

        m_a = flat(in_a.astype(jnp.float32))
        omf = flat(om)
        om2 = jnp.concatenate([omf * m_a, omf * (1.0 - m_a)], axis=0)
        b36 = jnp.concatenate(
            [flat((bins == b).astype(jnp.float32)) for b in range(nb)],
            axis=0)                                       # (36, N)
        # f32 HIGHEST: bin weights are exact 0/1, so only om's rounding
        # would enter at bf16 — keep histogram accumulation exact, the
        # MXU pass is tiny (2 x 36 x N).
        acc = jax.lax.dot_general(
            om2, b36, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)           # (2, 36)
        hist_ref[0] = acc

    return kernel


def orientation_hist_tpu_packed(gauss4: jax.Array, count: jax.Array,
                                addr: jax.Array, meta: jax.Array, *,
                                geom: _KernelGeom, edge: int) -> jax.Array:
    """Raw 36-bin histograms via the 2-keypoint packed kernel. Same
    contract as :func:`orientation_hist_tpu`; ``addr`` must carry the
    delta field."""
    capp = addr.shape[0]
    if capp % 16:
        pad = 16 - capp % 16
        addr = jnp.pad(addr, (0, pad))
        meta = jnp.pad(meta, ((0, pad), (0, 0), (0, 0)))
    capp_p = addr.shape[0]
    kernel = _make_hist_kernel_packed(geom, capp_p, edge)
    count = jnp.asarray(count, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((count + 1) // 2,),
        in_specs=[
            pl.BlockSpec((8, 1, 8), lambda i, *s: (2 * i // 8, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 2, NB_ORI_HIST_BINS),
                               lambda i, *s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_N_BUF, geom.wr, geom.wc), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    hist = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (capp_p // 2, 2, NB_ORI_HIST_BINS), jnp.float32),
        grid_spec=grid_spec,
    )(count.reshape(1), addr, meta, gauss4)
    # Step i's block rows (0, 1) are keypoints (2i, 2i+1): plain reshape.
    return hist.reshape(capp_p, NB_ORI_HIST_BINS)[:capp]


# ---------------------------------------------------------------------------
# K2: descriptor kernel (per (keypoint, orientation) pair)
# ---------------------------------------------------------------------------

def _make_desc_kernel(geom: _KernelGeom, capp: int, use_vlfeat: bool):
    wr, wc = geom.wr, geom.wc
    n = wr * 128
    half_cells = NB_HIST / 2.0  # 2.0

    def kernel(count_ref, addr_ref, meta_ref, gauss_ref, desc_ref,
               wscr, sems):
        step = pl.program_id(0)
        start_dma, wait_current = _dma_machinery(
            count_ref, addr_ref, gauss_ref, wscr, sems, geom, capp)

        @pl.when(step == 0)
        def _():
            for p in range(_PREFETCH):
                start_dma(jnp.int32(p))

        start_dma(step + _PREFETCH)
        win = wait_current(step)
        meta = meta_ref[jax.lax.rem(step, 8)]
        f = _window_fields(win, step, addr_ref, meta, geom, approx_div=True)
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
        ty = oy + half_cells - 0.5
        tx = ox + half_cells - 0.5

        def flat(x):
            # Compute is always (wr, 128) after the repositioning roll.
            return x.reshape(1, n)

        # desc[cy, cx, o] = sum_p hy[cy]*wm * hx[cx] * wo[o] — a 3-way
        # contraction. Grouping it as (hy*hx: 16 rows) @ (wm*wo: 8 rows)^T
        # instead of (hy*wm: 4 rows) @ (hx*wo: 32 rows)^T builds 24 flat
        # rows instead of 36 and does 16+8 window-sized multiplies instead
        # of 4+32 — ~25% less VPU work in the hottest kernel, identical
        # 128-MAC/pixel MXU cost. Output lands as (16, 8); the row-major
        # flatten (cy*4+cx)*8+o == cy*32+cx*8+o matches the (4, 32) layout
        # exactly, so the XLA-side reshape is free.
        uy = [jnp.maximum(0.0, 1.0 - jnp.abs(ty - c))
              for c in range(NB_HIST)]
        wx = [jnp.maximum(0.0, 1.0 - jnp.abs(tx - c))
              for c in range(NB_HIST)]
        w16 = jnp.concatenate(
            [flat(uy[cy] * wx[cx]) for cy in range(NB_HIST)
             for cx in range(NB_HIST)], axis=0)          # (16, N)
        o8 = jnp.concatenate(
            [flat(r) for r in _ori_rows(f["theta"], ang, wm, use_vlfeat)],
            axis=0)                                      # (8, N)
        # Explicit bf16 operands = single MXU pass; accumulation stays f32.
        # Per-element rel err ~4e-3 averages out over the ~1e3 contributing
        # pixels — well under one u8 descriptor bin after quantization.
        acc = jax.lax.dot_general(
            w16.astype(jnp.bfloat16), o8.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (16, 8)
        desc_ref[0] = acc

    return kernel


def descriptor_tpu(gauss4: jax.Array, count: jax.Array, addr: jax.Array,
                   meta: jax.Array, *, geom: _KernelGeom,
                   use_vlfeat: bool) -> jax.Array:
    """Raw (unnormalized) descriptors (capp, 16, 8) for ``count`` pairs
    (row-major flatten == the (4, 32) [cy][cx*8+o] bin layout).
    Rows at index >= count are UNWRITTEN garbage; callers must mask."""
    capp = addr.shape[0]
    if capp % 8:
        pad = 8 - capp % 8
        addr = jnp.pad(addr, (0, pad))
        meta = jnp.pad(meta, ((0, pad), (0, 0), (0, 0)))
    capp_p = addr.shape[0]
    kernel = _make_desc_kernel(geom, capp_p, use_vlfeat)
    count = jnp.asarray(count, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(count,),
        in_specs=[
            pl.BlockSpec((8, 1, 16), lambda i, *s: (i // 8, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, NB_HIST * NB_HIST, NB_ORI),
                               lambda i, *s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_N_BUF, geom.wr, geom.wc), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((capp_p, NB_HIST * NB_HIST, NB_ORI),
                                       jnp.float32),
        grid_spec=grid_spec,
    )(count.reshape(1), addr, meta, gauss4)
    return out[:capp]


# ---------------------------------------------------------------------------
# K2-packed: 2 descriptor pairs per grid step (window edge <= 64 lanes)
# ---------------------------------------------------------------------------

def _make_desc_kernel_packed(geom: _KernelGeom, capp: int, edge: int,
                             use_vlfeat: bool):
    """2 pairs per grid step, one per 64-lane half.

    The unpacked kernel is VPU-compute bound and its ops run on full
    (wr, 128) vectors while a bucket-0/1 window only occupies ``edge`` + 31
    alignment-slack lanes — >= 56 lanes of every row are dead. Here each
    step DMAs BOTH pairs' windows, repositions them with dynamic lane
    rolls (pair A's content to lane 0, pair B's to lane 64), lane-selects
    into ONE combined window, and runs the per-pixel math once — per-pair
    VPU cost ~halves. The contraction splits the orientation rows into
    A-masked and B-masked blocks so acc (16, 16) holds pair A's descriptor
    in columns 0..7 and pair B's in 8..15.

    Wrap-garbage safety (requires edge <= 64, i.e. r1 <= 31): the roll
    deltas satisfy -r1 <= delta <= 72 (window-start clamps included), so
    wrapped lanes either fall outside the structural half masks
    (A: jj in [1, 62], B: jj in [65, 126]) or carry px that the
    image-interior (px >= 1, px <= xhi) or radius (|dxi| <= drad <= r1-1)
    masks reject.
    """
    wr, wc = geom.wr, geom.wc
    assert edge <= _PACK_MAX_EDGE
    n = wr * 128
    half_cells = NB_HIST / 2.0
    r1 = (edge - 1) // 2

    def kernel(count_ref, addr_ref, meta_ref, gauss_ref, desc_ref,
               wscr, sems):
        step = pl.program_id(0)
        start_dma, wait_current = _dma_machinery(
            count_ref, addr_ref, gauss_ref, wscr, sems, geom, capp,
            clamp_to_count=True)

        # 2 DMAs in flight per step: prefetch 3 steps (6 pairs) ahead so
        # at most _N_BUF (8) slots are ever outstanding.
        @pl.when(step == 0)
        def _():
            for p in range(6):
                start_dma(jnp.int32(p))

        start_dma(2 * step + 6)
        start_dma(2 * step + 7)
        wa = wait_current(2 * step)
        wb = wait_current(2 * step + 1)

        mrow = jax.lax.rem(2 * step, 8)
        ma = meta_ref[mrow]          # (1, 16) pair A metadata
        mb = meta_ref[mrow + 1]      # (1, 16) pair B metadata

        def dec(i):
            a = addr_ref[jnp.clip(jnp.minimum(i, count_ref[0] - 1), 0,
                                  capp - 1)]
            ys = jax.lax.rem(a >> _ADDR_YS_SHIFT, 2048) * 8
            ss = jax.lax.rem(a >> _ADDR_AX_SHIFT, 128) * 128
            return ys, ss, _decode_delta(a)

        ysA, ssA, dA = dec(2 * step)
        ysB, ssB, dB = dec(2 * step + 1)

        ii = jax.lax.broadcasted_iota(jnp.int32, (wr, 128), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (wr, 128), 1)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        in_a1 = lane1 < 64       # (1, 128) for metadata rows
        in_a = jj < 64           # (wr, 128) for window-shaped selects

        # Reposition: lane j of the combined window holds window column
        # j (pair A, j < 64) or j - 64 (pair B); the DMA'd windows are two
        # lane tiles wide, sliced back to one after the roll.
        wa_r = pltpu.roll(wa, jnp.mod(wc - dA, wc), 1)[:, :128]
        wb_r = pltpu.roll(wb, jnp.mod(64 - dB, wc), 1)[:, :128]
        win = jnp.where(in_a, wa_r, wb_r)

        gx = 0.5 * (pltpu.roll(win, 127, 1) - pltpu.roll(win, 1, 1))
        gy = 0.5 * (pltpu.roll(win, wr - 1, 0) - pltpu.roll(win, 1, 0))
        mag = jnp.sqrt(gx * gx + gy * gy)
        theta = atan2_0_2pi(gy, gx, approx_div=True)

        def sel(k):
            return jnp.where(in_a1, ma[0:1, k:k + 1], mb[0:1, k:k + 1])

        sx, sy, sig = sel(0), sel(1), sel(2)
        cx, cy = sel(3), sel(4)
        ylo, yhi, xhi = sel(5), sel(6), sel(7)
        ang = sel(8)

        ybase = jnp.where(in_a1, ysA, ysB).astype(jnp.float32)
        xbase = jnp.where(in_a1, ssA + dA, ssB + dB - 64).astype(jnp.float32)
        py = ybase + ii.astype(jnp.float32)
        px = xbase + jj.astype(jnp.float32)

        mask0 = ((ii >= 1) & (ii <= wr - 2)
                 # Disjoint lane-half interiors: a plain OR, NOT a
                 # jnp.where over boolean vectors — Mosaic materializes
                 # bool select operands as i8 and cannot truncate
                 # vector<i8> back to i1 (compile failure on v5e).
                 & (((jj >= 1) & (jj <= 62))
                    | ((jj >= 65) & (jj <= 126)))
                 & (px >= 1) & (px <= xhi) & (py >= ylo) & (py <= yhi))

        # dlam floor: the odd tail's dead B half carries zero metadata;
        # without it 1/dlam -> inf produces NaNs that the shared MXU
        # contraction would propagate into pair A's columns.
        dlam = jnp.maximum(LAMBDA_DESCRIPTOR * sig, 1e-3)
        drad = jnp.floor(math.sqrt(2.0) * dlam * (NB_HIST + 1) * 0.5 + 0.5)
        dxi = px - cx
        dyi = py - cy
        sdx = px - sx
        sdy = py - sy
        dmask = (mask0 & (jnp.abs(dxi) <= drad) & (jnp.abs(dyi) <= drad))
        dexp = -1.0 / (2.0 * half_cells * half_cells)
        inv_lam = 1.0 / dlam

        kc = jnp.cos(ang) * inv_lam
        ks = jnp.sin(ang) * inv_lam
        ox = kc * sdx + ks * sdy
        oy = kc * sdy - ks * sdx
        wm = jnp.where(
            dmask, jnp.exp(dexp * (ox * ox + oy * oy)) * mag, 0.0)
        ty = oy + half_cells - 0.5
        tx = ox + half_cells - 0.5

        def flat(x):
            return x.reshape(1, n)

        uy = [jnp.maximum(0.0, 1.0 - jnp.abs(ty - c))
              for c in range(NB_HIST)]
        wx = [jnp.maximum(0.0, 1.0 - jnp.abs(tx - c))
              for c in range(NB_HIST)]
        w16 = jnp.concatenate(
            [flat(uy[cy_] * wx[cx_]) for cy_ in range(NB_HIST)
             for cx_ in range(NB_HIST)], axis=0)          # (16, N)
        o8 = jnp.concatenate(
            [flat(r) for r in _ori_rows(theta, ang, wm, use_vlfeat)],
            axis=0)                                       # (8, N)
        m_a = flat(in_a.astype(jnp.float32))               # (1, N)
        o16 = jnp.concatenate([o8 * m_a, o8 * (1.0 - m_a)], axis=0)
        acc = jax.lax.dot_general(
            w16.astype(jnp.bfloat16), o16.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (16, 16)
        desc_ref[0] = acc

    return kernel


def descriptor_tpu_packed(gauss4: jax.Array, count: jax.Array,
                          addr: jax.Array, meta: jax.Array, *,
                          geom: _KernelGeom, edge: int,
                          use_vlfeat: bool,
                          deinterleave: bool = True) -> jax.Array:
    """Raw descriptors (capp, 16, 8) via the 2-pair packed kernel.
    Same contract as :func:`descriptor_tpu`; ``addr`` must carry the
    delta field (pack_addr(..., delta=...)).

    ``deinterleave=False`` returns the kernel's native
    ``(ceil(capp/2), 16, 16)`` layout (step i lanes [0:8] = pair 2i,
    [8:16] = pair 2i+1) and skips the stack+reshape: at full buffer
    capacity those two dense relayouts cost ~2.5 ms each on v5e
    (hardware trace, remeasure_r3s2) — callers that consume rows by
    index (run_atlas's bucket merge) split the lane half themselves at
    the live bucket size instead."""
    capp = addr.shape[0]
    if capp % 16:
        pad = 16 - capp % 16
        addr = jnp.pad(addr, (0, pad))
        meta = jnp.pad(meta, ((0, pad), (0, 0), (0, 0)))
    capp_p = addr.shape[0]
    kernel = _make_desc_kernel_packed(geom, capp_p, edge, use_vlfeat)
    count = jnp.asarray(count, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((count + 1) // 2,),
        in_specs=[
            pl.BlockSpec((8, 1, 16), lambda i, *s: (2 * i // 8, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, NB_HIST * NB_HIST, 2 * NB_ORI),
                               lambda i, *s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_N_BUF, geom.wr, geom.wc), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (capp_p // 2, NB_HIST * NB_HIST, 2 * NB_ORI), jnp.float32),
        grid_spec=grid_spec,
    )(count.reshape(1), addr, meta, gauss4)
    if not deinterleave:
        return out
    # De-interleave the lane halves: step i columns [0:8] = pair 2i,
    # [8:16] = pair 2i+1.
    out = jnp.stack([out[:, :, :NB_ORI], out[:, :, NB_ORI:]], axis=1)
    return out.reshape(capp_p, NB_HIST * NB_HIST, NB_ORI)[:capp]


# ---------------------------------------------------------------------------
# Whole-pyramid atlas orchestration
# ---------------------------------------------------------------------------

def desc_bucket_edges(config: SiftConfig) -> Tuple[int, ...]:
    """Descriptor window edges for the 3 sigma buckets."""
    s1, s2 = _sigma_splits(config)
    tops = (s1, s2, config.nb_scales_per_octave + 1)
    return tuple(desc_window_edge(_sigma_max(config, t)) for t in tops)


def kernel_window_rows(config: SiftConfig) -> Tuple[int, ...]:
    """Per-bucket DESCRIPTOR window row counts."""
    return tuple(_window_rows(e) for e in desc_bucket_edges(config))


def min_octave_rows(config: SiftConfig) -> int:
    return max(kernel_window_rows(config))


def _window_start(center, r1, align, lim):
    """Aligned window start covering [center-r1, center+r1], clamped."""
    return jnp.clip(((center - r1) // align) * align, 0, lim)


def _bucket_sizes(total: int, lo: int = 4096):
    """Power-of-two live-count buckets [lo, 2*lo, ..., total]."""
    sizes = []
    b = lo
    while b < total:
        sizes.append(b)
        b *= 2
    sizes.append(total)
    return sizes


def atlas_plan(config: SiftConfig, oct_res):
    """Static atlas geometry: (band_off tuple, h_atlas, w_atlas).

    Octave gaussian bands stack vertically, 8-row aligned; the atlas is
    wide/tall enough that every kernel window DMA (two 128-lane tiles,
    up to the largest window row count) stays in bounds."""
    s = config.nb_scales_per_octave
    max_wc = 256
    assert max(desc_bucket_edges(config)) <= 129, (
        "descriptor window edge exceeds the two-lane-tile DMA window")
    w_atlas = _round_up(max(max_wc, max(ow for ow, _ in oct_res)), 128)
    band_off = []
    rows = 0
    for ow, oh in oct_res:
        band_off.append(rows)
        rows += _round_up(oh, 8)
    max_wr = max(
        _window_rows(ori_window_edge(_sigma_max(config, s + 1))),
        max(kernel_window_rows(config)))
    h_atlas = _round_up(max(rows, max_wr), 8)
    # Address-word field widths (pack_addr): ys/8 has 11 bits, ax/128
    # has 7. Largest supported pyramid (Hannover 3456x2304 upsampled:
    # ~9200 atlas rows, 6912 cols) fits comfortably.
    assert h_atlas <= 2048 * 8 and w_atlas <= 127 * 128, (
        "atlas exceeds the DMA address-word field widths")
    return tuple(band_off), h_atlas, w_atlas


def run_atlas(gaussians, refined_list, rank_select_fn, *,
              config: SiftConfig, oct_res, caps, capacity: int,
              atlas=None):
    """Back half for ALL octaves: one histogram kernel + two descriptor
    kernels (small/large sigma) over a whole-pyramid atlas.

    Octave gaussian stacks are packed vertically into one atlas image (per
    layer); keypoints from every octave run through dynamic-grid kernels
    whose step counts equal the live counts. Window reads may spill into
    neighboring octave bands — per-keypoint band bounds mask them out.

    ``atlas``: pass a pre-built (nb_layers, h_atlas, w_atlas) f32 atlas
    (scale_space.build_pyramid(atlas_bands=...)) to skip the band
    pack — the stack+concat here re-materialized the whole gaussian
    pyramid (~15 ms/frame at 3456x2304, round-5 trace) when the blur
    could instead write atlas bands directly. ``gaussians`` may then be
    None.

    Returns (fields dict at ``capacity``, count, per_octave_counts i32[O],
    lost i32[]).
    """
    s = config.nb_scales_per_octave
    nb_layers = s + 2
    ori_cap = config.orientation_capacity
    use_vlfeat = config.descriptor_format.value == 1
    nb_oct = len(oct_res)

    # --- build the atlas: octave bands stacked vertically ---------------
    with jax.named_scope("AtlasBuild"):
        band_off, h_atlas, w_atlas = atlas_plan(config, oct_res)
        if atlas is None:
            bands = []
            for o, (ow, oh) in enumerate(oct_res):
                g = gaussians[o][:nb_layers].astype(jnp.float32)
                bands.append(jnp.pad(g, ((0, 0),
                                         (0, _round_up(oh, 8) - oh),
                                         (0, w_atlas - ow))))
            atlas = jnp.concatenate(bands, axis=1)
            if atlas.shape[1] != h_atlas:
                atlas = jnp.pad(atlas, ((0, 0),
                                        (0, h_atlas - atlas.shape[1]),
                                        (0, 0)))
        else:
            assert atlas.shape == (nb_layers, h_atlas, w_atlas), (
                atlas.shape, (nb_layers, h_atlas, w_atlas))

    # --- global keypoint arrays (concat over octaves) --------------------
    def cat(field):
        return jnp.concatenate([getattr(r, field) for r in refined_list])

    valid = cat("valid")
    subpix_s = cat("subpix_s")
    scale_x = cat("scale_x")
    scale_y = cat("scale_y")
    scale_idx = cat("scale_idx")
    total_cap = valid.shape[0]

    # Per-octave constants materialize by concatenation (free), never by
    # table gathers.
    def per_kp(vals, dtype=jnp.float32):
        return jnp.concatenate([jnp.full((caps[o],), vals[o], dtype)
                                for o in range(nb_oct)])

    oct_id = per_kp(list(range(nb_oct)), jnp.int32)

    # Sigma-scaled sampling (see patches.build_patchset): keypoints at the
    # octave's top scales (scale_idx >= s) sample the NEXT octave's band at
    # half resolution — same absolute blur, a quarter of the window area,
    # so the dominant large-sigma pairs drop from the big-window descriptor
    # bucket into the packed small-window ones. Pure metadata rewriting:
    # the kernels read per-keypoint sampling scalars and don't care which
    # band a window DMAs from. Next-octave constants materialize by
    # segment concatenation like the own-octave ones (never table gathers).
    from .patches import sigma_remap_enabled
    nxt = [min(o + 1, nb_oct - 1) for o in range(nb_oct)]
    remap = (per_kp([1 if o + 1 < nb_oct else 0 for o in range(nb_oct)],
                    jnp.int32) > 0) & (scale_idx >= s)
    if not sigma_remap_enabled():
        remap = jnp.zeros_like(remap)

    def pick(vals_next, vals_own, dtype=jnp.int32):
        return jnp.where(remap, per_kp(vals_next, dtype),
                         per_kp(vals_own, dtype))

    k_off = pick([band_off[n] for n in nxt], band_off)
    k_ow = pick([oct_res[n][0] for n in nxt], [ow for ow, _ in oct_res])
    k_oh = pick([oct_res[n][1] for n in nxt], [oh for _, oh in oct_res])
    # Next octave holds G_lo[i] = G_hi[2i+1] (odd-texel nearest blit), so
    # hi coordinate u sits at lo coordinate (u - 1) / 2 — see
    # patches.build_patchset.
    sx_s = jnp.where(remap, (scale_x - 1.0) * 0.5, scale_x)
    sy_s = jnp.where(remap, (scale_y - 1.0) * 0.5, scale_y)
    subpix_samp = jnp.where(remap, subpix_s - s, subpix_s)
    layer = jnp.clip(jnp.where(remap, scale_idx - s, scale_idx),
                     0, nb_layers - 1).astype(jnp.int32)

    sig_oct = jnp.maximum(
        config.seed_scale_sigma * jnp.exp2(subpix_samp / s), 1e-6)
    cx = jnp.clip(jnp.round(sx_s), 0, k_ow).astype(jnp.int32)
    cy = (jnp.clip(jnp.round(sy_s), 0, k_oh).astype(jnp.int32) + k_off)
    ylo = (k_off + 1).astype(jnp.float32)
    yhi = (k_off + k_oh - 2).astype(jnp.float32)
    xhi = (k_ow - 2).astype(jnp.float32)
    sy_at = sy_s + k_off.astype(jnp.float32)

    # ONE packed per-keypoint record: every downstream consumer row-gathers
    # this matrix once instead of issuing a 1-D gather per field — a
    # (32k,) gather costs ~0.23 ms on v5e and the old layout issued ~50.
    # Columns 0..7 are exactly the kernels' 8 meta scalars (SAMPLING
    # values, possibly remapped); output positions are reconstructed from
    # x/y/octave in PackFeatures (scale_x = x * 2^-octave_idx, exact).
    REC = jnp.stack([
        sx_s, sy_at, sig_oct,                          # 0..2 sampling
        cx.astype(jnp.float32), cy.astype(jnp.float32),  # 3, 4
        ylo, yhi, xhi,                                 # 5..7
        cat("x"), cat("y"),                            # 8, 9 output
        scale_idx.astype(jnp.float32),                 # 10 output scale_idx
        cat("sigma"), cat("intensity"),                # 11, 12
        layer.astype(jnp.float32),                     # 13 sampling layer
        oct_id.astype(jnp.float32),                    # 14
        subpix_samp,                                   # 15 bucket key
    ], axis=-1)

    def addr_from_rec(rec, r1, wr, wc):
        # Row clamp is per-kernel (h_atlas - wr): a window starting there
        # still covers the keypoint's rows (band bottoms are < h_atlas and
        # the interior mask drops out-of-band rows), and the DMA never
        # reads past the atlas bottom (ADVICE round 1, medium).
        bcx = rec[:, 3].astype(jnp.int32)
        bcy = rec[:, 4].astype(jnp.int32)
        lay = jnp.clip(rec[:, 13].astype(jnp.int32), 0, nb_layers - 1)
        ys = _window_start(bcy, r1, 8, h_atlas - wr)
        ss = _window_start(bcx, r1, 128, w_atlas - wc)
        # delta repositions the window content to lane 0 in-kernel.
        return pack_addr(lay, ys, ss, delta=bcx - r1 - ss)

    # --- K1: orientation histograms for ALL valid keypoints --------------
    with jax.named_scope("ComputeOrientation"):
        sig_max_all = _sigma_max(config, s + 1)
        ori_edge = ori_window_edge(sig_max_all)
        ori_geom = _KernelGeom(wr=_window_rows(ori_edge), wc=256,
                               h8=h_atlas, w32=w_atlas)
        kidx, kcnt = rank_select_fn(valid, total_cap)
        rec_k = REC[kidx]                                # one row gather

        # Sigma split for the histogram kernel: its cost is linear in
        # window rows (36 masked reductions over (wr, 128)), and with
        # sigma-scaled sampling most keypoints' sampling sigma is far
        # below the static max that sizes ``ori_geom`` (wr 48 at default
        # config) — a second small-window geometry (wr 32) for them cuts
        # the kernel's dominant cost ~1/3 for the majority bucket. Split
        # key is subpix_samp (REC col 15), monotone in sampling sigma.
        t_ori_small = _max_subpix_for_ori_edge(config, 25)
        edge_small = ori_window_edge(_sigma_max(config, t_ori_small))
        geom_small = _KernelGeom(wr=_window_rows(edge_small), wc=256,
                                 h8=h_atlas, w32=w_atlas)
        ori_split = (geom_small.wr < ori_geom.wr
                     and os.environ.get("VKSIFT_ORI_SPLIT", "1") != "0")
        # OPT-IN only: the hardware A/B (results/remeasure_r3s2, v5e)
        # measured the packed histogram kernel at 3.73 ms in-program vs
        # 0.69 ms for the unpacked kernel in isolation at the same
        # keypoint count — the lane-half roll/select machinery costs more
        # than the halved grid saves on real silicon (the packed variant
        # was also the op under both transient TPU INTERNAL errors in
        # that chain). The packed DESCRIPTOR kernels measure faster and
        # stay on by default.
        ori_packed = (ori_edge <= _PACK_MAX_EDGE
                      and os.environ.get("VKSIFT_PACKED_HIST") == "1")
        live_k = jnp.arange(total_cap) < kcnt
        if ori_split and not ori_packed:
            small = (rec_k[:, 15] <= t_ori_small) & live_k
            big = jnp.logical_not(rec_k[:, 15] <= t_ori_small) & live_k
            idx_s, cnt_s = rank_select_fn(small, total_cap)
            idx_b, cnt_b = rank_select_fn(big, total_cap)
            rec_s, rec_b = rec_k[idx_s], rec_k[idx_b]
            hist_s = orientation_hist_tpu(
                atlas, cnt_s,
                addr_from_rec(rec_s, (edge_small - 1) // 2,
                              geom_small.wr, 256),
                rec_s[:, :8].reshape(-1, 1, 8), geom=geom_small)
            hist_b = orientation_hist_tpu(
                atlas, cnt_b,
                addr_from_rec(rec_b, (ori_edge - 1) // 2,
                              ori_geom.wr, 256),
                rec_b[:, :8].reshape(-1, 1, 8), geom=ori_geom)
            rank_s = jnp.cumsum(small.astype(jnp.int32)) - 1
            rank_b = jnp.cumsum(big.astype(jnp.int32)) - 1
            hist = None  # merged at the live bucket size below
        else:
            ori_addr = addr_from_rec(rec_k, (ori_edge - 1) // 2,
                                     ori_geom.wr, 256)
            if ori_packed:
                hist = orientation_hist_tpu_packed(
                    atlas, kcnt, ori_addr, rec_k[:, :8].reshape(-1, 1, 8),
                    geom=ori_geom, edge=ori_edge)
            else:
                hist = orientation_hist_tpu(
                    atlas, kcnt, ori_addr, rec_k[:, :8].reshape(-1, 1, 8),
                    geom=ori_geom)

        # peaks (vectorized XLA; tiny per-keypoint vectors are op-issue
        # bound inside a per-keypoint kernel). Bucketed lax.switch: the
        # smoothing/peak math runs at the smallest power-of-two bucket
        # holding the LIVE keypoint count instead of at capacity — the
        # TPU-native analogue of the reference's indirect dispatch for
        # the XLA glue.
        from .orientation import peaks_from_histograms
        in_cnt = live_k
        if hist is not None:
            hist = jnp.where(in_cnt[:, None], hist, 0.0)

        ksizes = _bucket_sizes(total_cap)

        def peaks_branch(k):
            def run():
                if hist is not None:
                    hk = hist[:k]
                else:
                    # Sigma-split merge at the live bucket size: each live
                    # keypoint is in exactly one bucket at rank < that
                    # bucket's count, so garbage kernel rows are never
                    # selected.
                    hs = hist_s[jnp.clip(rank_s[:k], 0, total_cap - 1)]
                    hb = hist_b[jnp.clip(rank_b[:k], 0, total_cap - 1)]
                    hk = jnp.where(small[:k, None], hs, hb)
                    hk = jnp.where(in_cnt[:k, None], hk, 0.0)
                o = peaks_from_histograms(hk, ori_cap)
                pad = ((0, total_cap - k), (0, 0))
                return jnp.pad(o.angles, pad), jnp.pad(o.valid, pad)
            return run

        kbi = sum((kcnt > k).astype(jnp.int32) for k in ksizes[:-1]) \
            if len(ksizes) > 1 else jnp.int32(0)
        angles, ovalid = jax.lax.switch(
            kbi, [peaks_branch(k) for k in ksizes])

        # Keypoint-major pair bookkeeping: peaks_from_histograms returns
        # PREFIX-COMPACT validity per row (top_k sorts -inf last), so each
        # keypoint's pairs are the contiguous slots
        # [start_k, start_k + nori_k) in pair order — scatter/cumsum run at
        # the keypoint count (total_cap) instead of total_cap*ori_cap
        # (4x smaller; both ops are per-element latency-bound on v5e).
        nori = jnp.sum((ovalid & in_cnt[:, None]).astype(jnp.int32), axis=1)
        cs_n = jnp.cumsum(nori)
        start_k = cs_n - nori

        pair_total = cs_n[total_cap - 1]
        count = jnp.minimum(pair_total, capacity)
        lost = pair_total - count

    # --- K2: descriptors per pair, split into 3 sigma buckets -------------
    s1, s2 = _sigma_splits(config)
    wrs = kernel_window_rows(config)
    edges = desc_bucket_edges(config)
    nbk = len(edges)
    d128 = NB_HIST * NB_HIST * NB_ORI
    psizes = _bucket_sizes(capacity)

    def pbi():
        return sum((count > p).astype(jnp.int32) for p in psizes[:-1]) \
            if len(psizes) > 1 else jnp.int32(0)

    # Pair-stage glue at the live bucket size P, padded back to capacity
    # (dense pad writes are ~free; the gathers/cumsums they replace are
    # latency-bound at full capacity).
    def pair_branch(p):
        def run():
            # pslot[i] = keypoint owning pair slot i: scatter each live
            # keypoint's index at its segment start, then running max.
            seg = jnp.zeros((p,), jnp.int32).at[
                jnp.where(nori > 0, start_k, p)].max(
                jnp.arange(total_cap, dtype=jnp.int32), mode="drop")
            pslot = jax.lax.cummax(seg)
            rec_p = rec_k[pslot]
            oidx = jnp.arange(p, dtype=jnp.int32) - start_k[pslot]
            angle = jnp.take_along_axis(
                angles[pslot], oidx[:, None], axis=1)[:, 0]
            pair_bucket = ((rec_p[:, 15] > s1).astype(jnp.int32)
                           + (rec_p[:, 15] > s2).astype(jnp.int32))
            live = jnp.arange(p) < count
            rec_pa = jnp.concatenate(
                [rec_p[:, :8], angle[:, None], rec_p[:, 8:15]], axis=1)
            addrs, metas, scnts, branks = [], [], [], []
            for b in range(nbk):
                wc = 256
                sel = live & (pair_bucket == b)
                sidx, scnt = rank_select_fn(sel, p)
                rec_b = rec_pa[sidx]
                addr_b = addr_from_rec(
                    jnp.concatenate([rec_b[:, :8], rec_b[:, 9:]], axis=1),
                    (edges[b] - 1) // 2, wrs[b], wc)
                addrs.append(jnp.pad(addr_b, (0, capacity - p)))
                metas.append(jnp.pad(rec_b, ((0, capacity - p), (0, 0))))
                scnts.append(scnt)
                branks.append(jnp.pad(
                    jnp.cumsum(sel.astype(jnp.int32)) - 1,
                    (0, capacity - p)))
            pad1 = (0, capacity - p)
            return (tuple(addrs), tuple(metas), tuple(scnts),
                    tuple(branks),
                    jnp.pad(rec_p, (pad1, (0, 0))), jnp.pad(angle, pad1),
                    jnp.pad(pair_bucket, pad1))
        return run

    (addrs, metas, scnts, branks, rec_p, angle, pair_bucket) = \
        jax.lax.switch(pbi(), [pair_branch(p) for p in psizes])
    pair_live = jnp.arange(capacity) < count

    with jax.named_scope("ComputeDescriptors"):
        raws = []      # kernel-native layouts; per-bucket packed flag
        packed_b = []
        for b in range(nbk):
            geom = _KernelGeom(wr=wrs[b], wc=256, h8=h_atlas, w32=w_atlas)
            if edges[b] <= _PACK_MAX_EDGE:
                # Kernel-native (ceil(cap/2), 16, 16) layout: the
                # de-interleave is done per-row in the merge below at the
                # LIVE bucket size — at capacity the stack+reshape relayouts
                # cost ~5 ms/frame on v5e (hardware trace, remeasure_r3s2).
                raw = descriptor_tpu_packed(
                    atlas, scnts[b], addrs[b], metas[b].reshape(-1, 1, 16),
                    geom=geom, edge=edges[b], use_vlfeat=use_vlfeat,
                    deinterleave=False)
                packed_b.append(True)
            else:
                raw = descriptor_tpu(
                    atlas, scnts[b], addrs[b], metas[b].reshape(-1, 1, 16),
                    geom=geom, use_vlfeat=use_vlfeat)
                packed_b.append(False)
            raws.append(raw)

        # Merge the bucket outputs back into pair-slot order with row
        # gathers + selects (a row scatter here costs ~20x more on TPU),
        # again at the live bucket size. Each live slot is in exactly one
        # bucket at rank < that bucket's live count, so garbage kernel
        # rows are never selected.
        #
        # Normalization stays in XLA: an in-kernel epilogue
        # (normalize+quantize per grid step) was measured-and-rejected on
        # v5e (round 4: +0.3-0.45 us/pair — Mosaic scalar reductions
        # serialize the VPU; results/hw_r4a/kernelbench.log). The barrier
        # before normalize keeps its two reduces from re-materializing
        # the gathered descriptor bank (~0.75 ms/frame, round-4 trace).
        from .descriptor import normalize_descriptor

        def merge_branch(p):
            def run():
                d = jnp.zeros((p, d128), jnp.float32)
                for b in range(nbk):
                    rb = jnp.clip(branks[b][:p], 0, p - 1)
                    if packed_b[b]:
                        # Bucket ranks rb < live count <= p, so pair
                        # 2i/2i+1 rows live in the first p//2 kernel
                        # steps; gather those, then pick the lane half.
                        rows = raws[b][:(p + 1) // 2][rb // 2]  # (p,16,16)
                        half = jnp.where((rb % 2 == 1)[:, None, None],
                                         rows[:, :, NB_ORI:],
                                         rows[:, :, :NB_ORI])
                        db = half.reshape(p, d128)
                    else:
                        # Reshape at p BEFORE the row gather: gathering
                        # the (capacity, 16, 8) layout directly makes XLA
                        # relayout the whole kernel output at capacity
                        # (0.59 ms at 32k, hardware trace).
                        db = raws[b][:p].reshape(p, d128)[rb]
                    d = jnp.where((pair_bucket[:p] == b)[:, None], db, d)
                d = jnp.where(pair_live[:p, None], d, 0.0)
                d = jax.lax.optimization_barrier(d)
                return jnp.pad(normalize_descriptor(d),
                               ((0, capacity - p), (0, 0)))
            return run

        desc_u8 = jax.lax.switch(
            pbi(), [merge_branch(p) for p in psizes])
    in_count = pair_live

    # Per-octave counts (diagnostics parity: per-section counters) + final
    # feature packing ("CopySiftCount"/pack analogue) — all straight from
    # the pair record, zero extra gathers.
    with jax.named_scope("PackFeatures"):
        pair_oct = rec_p[:, 14].astype(jnp.int32)
        per_octave = jnp.stack([
            jnp.sum(jnp.where(in_count & (pair_oct == o), 1, 0))
            for o in range(nb_oct)])

        def msk(a):
            m = in_count if a.ndim == 1 else in_count[:, None]
            return jnp.where(m, a, jnp.zeros_like(a))

        # Octave coords reconstructed from image coords (x = scale_x *
        # 2^octave_idx in refine, so the inverse power-of-two multiply is
        # bit-exact) — REC columns 0..7 hold SAMPLING values which may be
        # remapped to the next octave (sigma-scaled sampling above).
        oct_idx = pair_oct - (1 if config.use_input_upsampling else 0)
        inv_sf = jnp.exp2(-oct_idx.astype(jnp.float32))
        fields = dict(
            x=msk(rec_p[:, 8]), y=msk(rec_p[:, 9]),
            scale_x=msk(rec_p[:, 8] * inv_sf),
            scale_y=msk(rec_p[:, 9] * inv_sf),
            scale_idx=msk(rec_p[:, 10].astype(jnp.int32)),
            octave_idx=msk(oct_idx),
            sigma=msk(rec_p[:, 11]),
            orientation=msk(angle),
            intensity=msk(rec_p[:, 12]),
            descriptor=msk(desc_u8),
        )
    return fields, count, per_octave, lost
