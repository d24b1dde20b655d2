"""Fused orientation + descriptor TPU kernel (Pallas).

The reference runs ComputeOrientation (32 threads/keypoint) and
ComputeDescriptors (64 threads/keypoint) as indirect dispatches so device
work scales with the *actual* keypoint count (sift_detector.c:1191-1259).
This module is the TPU equivalent: one Pallas kernel whose grid covers the
static capacity but whose steps self-skip beyond the live count
(``@pl.when(i < count)``) — compute scales with actual keypoints, the
XLA-visible shapes stay static.

Per grid step (one keypoint):

1. A σ-bucketed square window of the keypoint's gaussian layer is DMA'd
   HBM→VMEM (multi-buffered 3 steps ahead to hide DMA latency). Window
   starts must be tile-aligned, so column alignment uses 4 lane-shifted
   copies of the octave (32-lane granularity) and row starts align to 8.
2. Gradients/magnitude/angle are computed in-register (atan2 via an
   in-kernel polynomial — Mosaic has no atan2 primitive).
3. The 36-bin orientation histogram (gaussian-weighted, box-masked,
   ComputeOrientation.comp:70-121) accumulates via 36 masked reductions,
   is smoothed 6x with the circular [1,1,1]/3 kernel, and up to
   ``ori_cap`` strict-local-max peaks >= 0.8*max are picked
   strongest-first with parabolic interpolation (:130-168).
4. For each valid orientation, the 128-bin descriptor
   (ComputeDescriptors.comp:106-198) is accumulated as ONE MXU matmul:
   ``desc(4,32) = U(4,Npx) @ V(32,Npx)^T`` where U rows are
   y-cell-hat-weighted magnitudes and V rows are x-cell x orientation-bin
   hat products, with ``precision=HIGHEST`` (f32-exact). This replaces the
   shader's fixed-point shared-memory atomics.

Normalization/quantization to u8 runs in XLA afterwards (tiny).

Octaves narrower than 128 px fall back to the XLA ops (their cost is
negligible); see :mod:`vulkansift_tpu.pipeline`.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import (LAMBDA_DESCRIPTOR, LAMBDA_ORIENTATION, NB_HIST, NB_ORI,
                      NB_ORI_HIST_BINS, ORI_PEAK_RATIO, SiftConfig)

_TWO_PI = 2.0 * math.pi
_N_COPIES = 2          # lane-shift copies (64-lane granularity)
_N_BUF = 8             # DMA multi-buffering slots
_PREFETCH = 7          # DMA prefetch distance (< _N_BUF)


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


def atan2_0_2pi(y: jax.Array, x: jax.Array) -> jax.Array:
    """atan2(y, x) mapped to [0, 2pi); safe at (0, 0) (returns ~0)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = mn / jnp.maximum(mx, 1e-30)
    p = _atan01(t)
    r = jnp.where(ay > ax, (math.pi / 2) - p, p)
    r = jnp.where(x < 0, math.pi - r, r)
    r = jnp.where(y < 0, _TWO_PI - r, r)
    # y<0 branch can yield exactly 2pi when r was 0; fold it back.
    return jnp.where(r >= _TWO_PI, r - _TWO_PI, r)


# ---------------------------------------------------------------------------
# Window geometry (sigma buckets)
# ---------------------------------------------------------------------------

def desc_window_edge(sigma_oct_max: float) -> int:
    """Descriptor window edge (pixels) incl. the gradient ring for the
    bucket's max sigma: 2*(int_radius+1)+1 with int_radius =
    floor(sqrt(2)*3*sigma*(NB_HIST+1)/2 + 0.5) (ComputeDescriptors.comp:
    106-109)."""
    r = int(math.floor(math.sqrt(2.0) * LAMBDA_DESCRIPTOR * sigma_oct_max
                       * (NB_HIST + 1) * 0.5 + 0.5))
    return 2 * (r + 1) + 1


def bucket_thresholds(config: SiftConfig) -> Tuple[float, ...]:
    """subpix_s thresholds splitting keypoints into 3 sigma buckets."""
    smax = config.nb_scales_per_octave + 1
    return (smax / 3.0, 2.0 * smax / 3.0)


def bucket_sigma_max(config: SiftConfig) -> Tuple[float, ...]:
    s = config.nb_scales_per_octave
    t1, t2 = bucket_thresholds(config)
    return tuple(config.seed_scale_sigma * 2.0 ** (t / s)
                 for t in (t1, t2, float(s + 1)))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class _KernelGeom(NamedTuple):
    wr: int   # window rows (8-aligned)
    wc: int   # window cols (128)
    h8: int   # padded image rows
    w32: int  # padded image cols
    h: int    # true image rows
    w: int    # true image cols


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

# Packed DMA-address word: cidx (2b) | layer (3b) | ys/8 (11b) | ax/128 (rest)
_ADDR_LAYER_SHIFT = 2
_ADDR_YS_SHIFT = 5
_ADDR_AX_SHIFT = 16


def pack_addr(cidx, layer, ys, ax):
    # cidx is the 64-lane shift-copy index (0 or 1).
    return (cidx + (layer << _ADDR_LAYER_SHIFT) + ((ys // 8) << _ADDR_YS_SHIFT)
            + ((ax // 128) << _ADDR_AX_SHIFT)).astype(jnp.int32)


def _make_kernel(geom: _KernelGeom, *, ori_cap: int, use_vlfeat: bool,
                 capp: int):
    wr, wc, h8, w32, _, _ = geom
    n = wr * wc
    nb = NB_ORI_HIST_BINS
    half_cells = NB_HIST / 2.0  # 2.0

    def kernel(count_ref, addr_ref, meta_ref, gauss_ref,
               desc_ref, ang_ref, pval_ref, wscr, sems):
        # Grid is DYNAMIC: exactly ``count`` steps run (the TPU analogue of
        # the reference's vkCmdDispatchIndirect) — no skipped-step overhead.
        # Only the packed DMA-address word lives in SMEM; all other
        # per-keypoint metadata arrives as a VMEM block (meta_ref).
        step = pl.program_id(0)

        def start_dma(i):
            @pl.when(i < count_ref[0])
            def _():
                idx = jnp.minimum(i, capp - 1)
                a = addr_ref[idx]
                cidx = jax.lax.rem(a, 4)
                layer = jax.lax.rem(a >> _ADDR_LAYER_SHIFT, 8)
                ys = jax.lax.rem(a >> _ADDR_YS_SHIFT, 2048) * 8
                ax = (a >> _ADDR_AX_SHIFT) * 128
                slot = jax.lax.rem(i, _N_BUF)
                pltpu.make_async_copy(
                    gauss_ref.at[cidx, layer,
                                 pl.ds(pl.multiple_of(ys, 8), wr),
                                 pl.ds(pl.multiple_of(ax, 128), wc)],
                    wscr.at[slot], sems.at[slot]).start()

        @pl.when(step == 0)
        def _():
            for p in range(_PREFETCH):
                start_dma(jnp.int32(p))

        start_dma(step + _PREFETCH)

        slot = jax.lax.rem(step, _N_BUF)
        pltpu.make_async_copy(
            gauss_ref.at[0, 0, pl.ds(0, wr), pl.ds(0, wc)],
            wscr.at[slot], sems.at[slot]).wait()

        # Per-keypoint metadata (all values exact integers or subpixel
        # floats, broadcast from (1, 1) slices of the VMEM block). The
        # block covers 8 consecutive grid steps, so Mosaic re-fetches it
        # only every 8th step.
        meta = meta_ref[jax.lax.rem(step, 8)]    # (1, 8) f32
        sxf = meta[0:1, 0:1]
        syf = meta[0:1, 1:2]
        sig = meta[0:1, 2:3]
        cxf = meta[0:1, 3:4]
        cyf = meta[0:1, 4:5]
        ylo = meta[0:1, 5:6]
        yhi = meta[0:1, 6:7]
        xhi = meta[0:1, 7:8]

        a = addr_ref[step]
        ys0 = jax.lax.rem(a >> _ADDR_YS_SHIFT, 2048) * 8
        ss0 = (a >> _ADDR_AX_SHIFT) * 128 + jax.lax.rem(a, 4) * 64

        win = wscr[slot]
        gx = 0.5 * (pltpu.roll(win, wc - 1, 1) - pltpu.roll(win, 1, 1))
        gy = 0.5 * (pltpu.roll(win, wr - 1, 0) - pltpu.roll(win, 1, 0))
        mag = jnp.sqrt(gx * gx + gy * gy)
        theta = atan2_0_2pi(gy, gx)

        ii = jax.lax.broadcasted_iota(jnp.int32, (wr, wc), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (wr, wc), 1)
        py = (ys0 + ii).astype(jnp.float32)
        px = (ss0 + jj).astype(jnp.float32)
        # Structural window border (roll wrap) + per-keypoint image
        # interior (atlas band bounds, atlas coordinates).
        mask0 = ((ii >= 1) & (ii <= wr - 2) & (jj >= 1) & (jj <= wc - 2)
                 & (px >= 1) & (px <= xhi) & (py >= ylo) & (py <= yhi))

        dxi = px - cxf
        dyi = py - cyf
        sdx = px - sxf
        sdy = py - syf

        # --- orientation histogram (ComputeOrientation.comp:70-121) ---
        slam = LAMBDA_ORIENTATION * sig
        obr = jnp.floor(3.0 * slam)
        oexp = -1.0 / (2.0 * slam * slam)
        omask = mask0 & (jnp.abs(dxi) <= obr) & (jnp.abs(dyi) <= obr)
        om = jnp.where(omask,
                       jnp.exp((sdx * sdx + sdy * sdy) * oexp) * mag,
                       0.0)
        bins = jnp.minimum(
            jnp.floor(theta * (nb / _TWO_PI)), nb - 1).astype(jnp.int32)
        hist = jnp.concatenate(
            [jnp.sum(jnp.where(bins == b, om, 0.0)).reshape(1, 1)
             for b in range(nb)], axis=1)
        for _ in range(6):
            hist = (pltpu.roll(hist, 1, 1) + hist
                    + pltpu.roll(hist, nb - 1, 1)) * (1.0 / 3.0)

        prev = pltpu.roll(hist, 1, 1)
        nxt = pltpu.roll(hist, nb - 1, 1)
        hmax = jnp.max(hist)
        is_peak = ((hist >= ORI_PEAK_RATIO * hmax) & (hist > prev)
                   & (hist > nxt))
        denom = prev - 2.0 * hist + nxt
        interp = jnp.where(denom == 0.0, 0.0,
                           0.5 * (prev - nxt)
                           / jnp.where(denom == 0.0, 1.0, denom))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
        angles_all = ((lane.astype(jnp.float32) + interp + 0.5)
                      * (_TWO_PI / nb))
        cand = jnp.where(is_peak, hist, -1.0)

        # --- descriptor factors shared across orientations ----------
        dlam = LAMBDA_DESCRIPTOR * sig
        drad = jnp.floor(math.sqrt(2.0) * dlam * (NB_HIST + 1) * 0.5 + 0.5)
        dmask = mask0 & (jnp.abs(dxi) <= drad) & (jnp.abs(dyi) <= drad)
        dexp = -1.0 / (2.0 * half_cells * half_cells)
        inv_lam = 1.0 / dlam

        vs = []
        angs = []
        for j in range(ori_cap):
            v = jnp.max(cand)
            pos = jnp.argmax(cand)
            ang = jnp.sum(jnp.where(lane == pos, angles_all, 0.0))
            vs.append(v.reshape(1, 1))
            angs.append(ang.reshape(1, 1))
            cand = jnp.where(lane == pos, -1.0, cand)

            @pl.when(v > 0.0)
            def _(ang=ang, j=j):
                kc = jnp.cos(ang) * inv_lam
                ks = jnp.sin(ang) * inv_lam
                ox = kc * sdx + ks * sdy
                oy = kc * sdy - ks * sdx
                wm = jnp.where(
                    dmask, jnp.exp(dexp * (ox * ox + oy * oy)) * mag,
                    0.0)
                rel = jnp.mod(theta - ang, _TWO_PI)
                if use_vlfeat:
                    fb = rel * (NB_ORI / _TWO_PI)
                else:
                    fb = jnp.mod(-rel, _TWO_PI) * (NB_ORI / _TWO_PI)
                ty = oy + half_cells - 0.5
                tx = ox + half_cells - 0.5

                def flat(x):
                    # (wr, wc) -> (1, wr*wc); Mosaic only flattens single
                    # lane-tile rows, so concat per-128-lane tiles.
                    if wc == 128:
                        return x.reshape(1, n)
                    return jnp.concatenate(
                        [x[:, t * 128:(t + 1) * 128].reshape(1, wr * 128)
                         for t in range(wc // 128)], axis=1)

                u_rows = [
                    flat(jnp.maximum(0.0, 1.0 - jnp.abs(ty - c)) * wm)
                    for c in range(NB_HIST)]
                u = jnp.concatenate(u_rows, axis=0)          # (4, N)
                wx = [jnp.maximum(0.0, 1.0 - jnp.abs(tx - c))
                      for c in range(NB_HIST)]
                wo = []
                for o in range(NB_ORI):
                    od = jnp.abs(fb - o)
                    wo.append(jnp.maximum(
                        0.0, 1.0 - jnp.minimum(od, NB_ORI - od)))
                v_rows = [flat(wx[c] * wo[o])
                          for c in range(NB_HIST)
                          for o in range(NB_ORI)]
                vmat = jnp.concatenate(v_rows, axis=0)       # (32, N)
                # Explicit bf16 operands = single MXU pass (vs 3 for
                # f32 inputs); accumulation stays f32. Per-element rel err
                # ~4e-3 averages out over the ~1e3 contributing pixels —
                # well under one u8 descriptor bin after quantization.
                acc = jax.lax.dot_general(
                    u.astype(jnp.bfloat16), vmat.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (4, 32)
                desc_ref[0, j] = acc
        pval_ref[:] = jnp.concatenate(vs, axis=1).reshape(1, 1, ori_cap)
        ang_ref[:] = jnp.concatenate(angs, axis=1).reshape(1, 1, ori_cap)

    return kernel


class BackhalfOut(NamedTuple):
    desc_raw: jax.Array  # f32 (capp, ori_cap, 4, 32) unnormalized
    angles: jax.Array    # f32 (capp, ori_cap)
    peak: jax.Array      # f32 (capp, ori_cap); valid = peak > 0


def orientation_descriptor_tpu(
        gauss4: jax.Array, count: jax.Array, addr: jax.Array,
        meta: jax.Array, *, geom: _KernelGeom, ori_cap: int,
        use_vlfeat: bool) -> BackhalfOut:
    """Run the fused kernel over one set of keypoints (atlas coords).

    The grid is DYNAMIC (= the live keypoint count), so device time scales
    with actual keypoints, not capacity. Output rows at index >= count are
    UNWRITTEN garbage; callers must mask by count (run_atlas does).

    Args:
      gauss4: (4, L, H_atlas, W_atlas) f32 lane-shifted atlas copies.
      count: i32[] live keypoint count.
      addr: i32[cap] packed DMA-address words (pack_addr) — the only
        per-keypoint SMEM array (SMEM is ~1MB total).
      meta: f32[cap, 1, 8] per-keypoint [sx, sy_atlas, sigma_oct, cx, cy,
        ylo, yhi, xhi] (exact integers as floats), VMEM-blocked per step.
    """
    capp = addr.shape[0]
    if capp % 8:
        pad = 8 - capp % 8
        addr = jnp.pad(addr, (0, pad))
        meta = jnp.pad(meta, ((0, pad), (0, 0), (0, 0)))
    kernel = _make_kernel(geom, ori_cap=ori_cap, use_vlfeat=use_vlfeat,
                          capp=capp)
    wr, wc = geom.wr, geom.wc
    count = jnp.asarray(count, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(count,),
        in_specs=[
            pl.BlockSpec((8, 1, 8), lambda i, *s: (i // 8, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, ori_cap, NB_HIST, NB_HIST * NB_ORI),
                         lambda i, *s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ori_cap), lambda i, *s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ori_cap), lambda i, *s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((_N_BUF, wr, wc), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    desc, ang, pval = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((capp, ori_cap, NB_HIST,
                                  NB_HIST * NB_ORI), jnp.float32),
            jax.ShapeDtypeStruct((capp, 1, ori_cap), jnp.float32),
            jax.ShapeDtypeStruct((capp, 1, ori_cap), jnp.float32),
        ),
        grid_spec=grid_spec,
    )(count.reshape(1), addr, meta, gauss4)
    return BackhalfOut(desc_raw=desc,
                       angles=ang.reshape(capp, -1),
                       peak=pval.reshape(capp, -1))


def make_shifted_copies(atlas: jax.Array) -> jax.Array:
    """(L, H, W) f32 atlas -> (2, L, H, W) 64-lane-shifted copies."""
    return jnp.stack([jnp.roll(atlas, -64 * c, axis=-1)
                      for c in range(_N_COPIES)], axis=0)


# ---------------------------------------------------------------------------
# Whole-pyramid atlas orchestration
# ---------------------------------------------------------------------------

def _sigma_split(config: SiftConfig) -> float:
    """subpix_s threshold splitting keypoints into small/large-window sets."""
    return (config.nb_scales_per_octave + 1) / 2.0


def kernel_window_rows(config: SiftConfig) -> Tuple[int, int]:
    """(small, large) kernel window row counts (edge + <=7 alignment slack,
    rounded to the f32 sublane tile)."""
    s = config.nb_scales_per_octave
    sig_small = config.seed_scale_sigma * 2.0 ** (_sigma_split(config) / s)
    sig_large = config.seed_scale_sigma * 2.0 ** ((s + 1) / s)
    return tuple(_round_up(desc_window_edge(sm) + 7, 8)
                 for sm in (sig_small, sig_large))


def run_atlas(gaussians, refined_list, rank_select_fn, *,
              config: SiftConfig, oct_res, caps, capacity: int):
    """Back half for ALL octaves with TWO pallas_calls total.

    Octave gaussian stacks are packed vertically into one atlas image (per
    layer); keypoints from every octave run through one dynamic-grid kernel
    per sigma set. Window reads may spill into neighboring octave bands —
    the per-keypoint band bounds mask those pixels out.

    Args:
      gaussians: per-octave (S+3, oh, ow) stacks.
      refined_list: per-octave extract.RefinedKeypoints at caps[o].
      oct_res: per-octave (ow, oh); caps: per-octave capacities.
      capacity: final packed feature capacity (max_nb_sift_per_buffer).

    Returns (fields dict at ``capacity``, count, per_octave_counts i32[O],
    lost i32[]).
    """
    s = config.nb_scales_per_octave
    nb_layers = s + 2
    ori_cap = config.orientation_capacity
    use_vlfeat = config.descriptor_format.value == 1
    nb_oct = len(oct_res)

    # --- build the atlas: octave bands stacked vertically ---------------
    w_atlas = _round_up(max(128, max(ow for ow, _ in oct_res)), 128)
    band_off = []
    rows = 0
    for ow, oh in oct_res:
        band_off.append(rows)
        rows += _round_up(oh, 8)
    h_atlas = _round_up(rows, 8)
    bands = []
    for o, (ow, oh) in enumerate(oct_res):
        g = gaussians[o][:nb_layers].astype(jnp.float32)
        bands.append(jnp.pad(g, ((0, 0), (0, _round_up(oh, 8) - oh),
                                 (0, w_atlas - ow))))
    atlas = jnp.concatenate(bands, axis=1)
    if atlas.shape[1] != h_atlas:
        atlas = jnp.pad(atlas, ((0, 0), (0, h_atlas - atlas.shape[1]),
                                (0, 0)))
    g4 = make_shifted_copies(atlas)

    # --- global keypoint arrays (concat over octaves) --------------------
    def cat(field):
        return jnp.concatenate([getattr(r, field) for r in refined_list])

    valid = cat("valid")
    subpix_s = cat("subpix_s")
    scale_x = cat("scale_x")
    scale_y = cat("scale_y")
    scale_idx = cat("scale_idx")
    total_cap = valid.shape[0]

    oct_id = jnp.concatenate([jnp.full((caps[o],), o, jnp.int32)
                              for o in range(nb_oct)])
    off_arr = jnp.asarray(band_off, jnp.int32)
    ow_arr = jnp.asarray([ow for ow, _ in oct_res], jnp.int32)
    oh_arr = jnp.asarray([oh for _, oh in oct_res], jnp.int32)
    k_off = off_arr[oct_id]
    k_ow = ow_arr[oct_id]
    k_oh = oh_arr[oct_id]

    sig_oct = config.seed_scale_sigma * jnp.exp2(subpix_s / s)
    cx = jnp.clip(jnp.round(scale_x), 0, k_ow).astype(jnp.int32)
    cy = (jnp.clip(jnp.round(scale_y), 0, k_oh).astype(jnp.int32) + k_off)
    layer = jnp.clip(scale_idx, 0, nb_layers - 1)
    ylo = k_off + 1
    yhi = k_off + k_oh - 2
    xhi = k_ow - 2
    sy_at = scale_y + k_off.astype(jnp.float32)

    split = _sigma_split(config)
    wrs = kernel_window_rows(config)
    sig_small = config.seed_scale_sigma * 2.0 ** (split / s)
    sig_large = config.seed_scale_sigma * 2.0 ** ((s + 1) / s)
    edges = [desc_window_edge(sm) for sm in (sig_small, sig_large)]

    # Per-set capacity: enough for the worst case split.
    set_cap = total_cap
    outs = []
    kidxs = []
    kcnts = []
    for b in range(2):
        wr = wrs[b]
        r1 = (edges[b] - 1) // 2
        # Small-sigma set: edge+63 <= 128 with 64-lane shift copies.
        # Large-sigma set: needs 2 lane tiles (edge 91 + residual 63 > 128).
        wc = 128 if edges[b] + 63 <= 128 else 256
        geom = _KernelGeom(wr=wr, wc=wc, h8=h_atlas, w32=w_atlas, h=0, w=0)
        sel = valid & ((subpix_s <= split) if b == 0 else (subpix_s > split))
        kidx, kcnt = rank_select_fn(sel, set_cap)
        bcx = cx[kidx]
        bcy = cy[kidx]
        ys = jnp.clip(((bcy - r1) // 8) * 8, 0, h_atlas - wr)
        # 64-aligned window start; keep the aligned DMA base within bounds.
        ss = jnp.clip(((bcx - r1) // 64) * 64, 0, w_atlas - (wc - 64))
        cidx_ = (ss % 128) // 64
        ax = ss - 64 * cidx_
        addr = pack_addr(cidx_, layer[kidx], ys, ax)
        meta = jnp.stack([
            scale_x[kidx].astype(jnp.float32),
            sy_at[kidx].astype(jnp.float32),
            jnp.maximum(sig_oct[kidx], 1e-6).astype(jnp.float32),
            bcx.astype(jnp.float32),
            bcy.astype(jnp.float32),
            ylo[kidx].astype(jnp.float32),
            yhi[kidx].astype(jnp.float32),
            xhi[kidx].astype(jnp.float32),
        ], axis=-1).reshape(set_cap, 1, 8)
        out = orientation_descriptor_tpu(
            g4, kcnt, addr, meta,
            geom=geom, ori_cap=ori_cap, use_vlfeat=use_vlfeat)
        outs.append(out)
        kidxs.append(kidx)
        kcnts.append(kcnt)

    kidx_all = jnp.concatenate(kidxs)
    in_cnt = jnp.concatenate([jnp.arange(set_cap) < c for c in kcnts])
    peak = jnp.concatenate([o.peak for o in outs])
    angles = jnp.concatenate([o.angles for o in outs])

    pvalid = ((peak > 0.0) & in_cnt[:, None]).reshape(-1)
    pair_total = jnp.sum(pvalid, dtype=jnp.int32)
    count = jnp.minimum(pair_total, capacity)
    lost = pair_total - count
    pidx, _ = rank_select_fn(pvalid, capacity)
    parent = kidx_all[pidx // ori_cap]
    angle = angles.reshape(-1)[pidx]
    # Gather descriptors from each set's output separately — concatenating
    # the two capacity-sized raw buffers first would copy ~0.5 GB of mostly
    # garbage rows through HBM.
    nrows = set_cap * ori_cap
    d128 = NB_HIST * NB_HIST * NB_ORI
    in_small = pidx < nrows
    d_small = outs[0].desc_raw.reshape(nrows, d128)[
        jnp.minimum(pidx, nrows - 1)]
    d_large = outs[1].desc_raw.reshape(nrows, d128)[
        jnp.maximum(pidx - nrows, 0)]
    from .descriptor import normalize_descriptor
    desc_u8 = normalize_descriptor(
        jnp.where(in_small[:, None], d_small, d_large))
    in_count = jnp.arange(capacity) < count

    # Per-octave counts (diagnostics parity: per-section counters).
    pair_oct = oct_id[parent]
    per_octave = jnp.stack([
        jnp.sum(jnp.where(in_count & (pair_oct == o), 1, 0))
        for o in range(nb_oct)])

    def g_at(field):
        return cat(field)[parent]

    def msk(a):
        m = in_count if a.ndim == 1 else in_count[:, None]
        return jnp.where(m, a, jnp.zeros_like(a))

    fields = dict(
        x=msk(g_at("x")), y=msk(g_at("y")),
        scale_x=msk(g_at("scale_x")), scale_y=msk(g_at("scale_y")),
        scale_idx=msk(g_at("scale_idx")),
        octave_idx=msk(pair_oct
                       - (1 if config.use_input_upsampling else 0)),
        sigma=msk(g_at("sigma")),
        orientation=msk(angle),
        intensity=msk(g_at("intensity")),
        descriptor=msk(desc_u8),
    )
    return fields, count, per_octave, lost
