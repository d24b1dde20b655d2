"""DoG extrema detection and subpixel refinement (pure XLA, dense-first).

Replaces the reference's ExtractKeypoints compute shader
(reference: src/vulkansift/shaders/ExtractKeypoints.comp) with a TPU-native
design built around dense vectorized passes instead of per-thread scalar
work:

1. :func:`extremum_candidates` — dense 3x3x3 strict-extremum test with the
   |v| > 0.8*dog_threshold pre-filter (ExtractKeypoints.comp:57-116),
   compacted to a static per-octave capacity with a cumsum + searchsorted
   rank-select (raster order, deterministic) — the XLA-idiomatic replacement
   for the shader's atomicAdd append (ExtractKeypoints.comp:208-224), and
   ~10x faster on TPU than jnp.nonzero(size=...).
2. :func:`refine_candidates` — the 5-step iterative subpixel refinement via
   3x3 Hessian solve (ExtractKeypoints.comp:133-188). TPU-native split:
   the per-cell Newton step (gradient, Hessian solve, 0.6-convergence and
   move decision) is computed DENSELY for every interior DoG cell and packed
   into a one-byte walk code; each candidate then just *walks* the code
   field for 5 steps (tiny gathers instead of per-candidate 3x3x3
   dynamic-slice chains). The final offsets/DoG-value/edge tests
   (ExtractKeypoints.comp:194-206) are recomputed exactly once at each
   candidate's final cell from a 27-point gather. Semantics are identical
   to the reference's loop (VLFeat-style no-move-on-last-iteration, clamped
   integer moves, singular-Hessian rejection).

The candidate capacity policy is the reference's geometric-halves section
sizing (SiftConfig.octave_section_capacities; reference sift_memory.c:40-87).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NB_REFINEMENT_STEPS, SiftConfig


class Candidates(NamedTuple):
    """Compacted extremum candidates for one octave (static capacity)."""

    s: jax.Array  # i32[K] scale index of the DoG center layer (1..nb_scales)
    y: jax.Array  # i32[K]
    x: jax.Array  # i32[K]
    count: jax.Array  # i32[]
    # Walk code at the candidate's own cell (candidate bit stripped), or
    # None. The Pallas frontend's compaction already holds the 128-lane
    # code block each candidate lives in, so providing this is ~free and
    # saves the refinement walk's step-0 code gather.
    code0: Optional[jax.Array] = None  # i32[K] | None


class RefinedKeypoints(NamedTuple):
    """Refinement output; ``valid`` marks survivors of all final tests."""

    valid: jax.Array      # bool[K]
    scale_x: jax.Array    # f32[K] subpixel x in octave coords
    scale_y: jax.Array    # f32[K]
    subpix_s: jax.Array   # f32[K] subpixel scale
    scale_idx: jax.Array  # i32[K] round(subpix_s)
    sigma: jax.Array      # f32[K] absolute blur level (includes 2^octave)
    intensity: jax.Array  # f32[K] refined DoG value
    x: jax.Array          # f32[K] input-image x (= scale_x * 2^octave)
    y: jax.Array          # f32[K]


_RANK_SCATTER_MAX_N = 1 << 18


def bucket_sizes(total: int, lo: int = 2048):
    """Power-of-two live-count buckets [lo, 2*lo, ..., total] for
    lax.switch-based capacity scaling."""
    sizes = []
    b = lo
    while b < total:
        sizes.append(b)
        b *= 2
    sizes.append(total)
    return sizes


def rank_select(mask_flat: jax.Array, capacity: int) -> Tuple[jax.Array, jax.Array]:
    """Indices of the first ``capacity`` true elements, in order.

    Two formulations, picked by mask size (both measured on v5e; both are
    far faster than jnp.nonzero(size=), which lowers to a sort-like
    pattern):

    * small masks (<= ~256k): cumsum + 1-D rank scatter with out-of-range
      drop — 0.17 ms at n=32k vs 3.8 ms for searchsorted (the binary
      search issues capacity*log(n) random gathers).
    * large masks: cumsum + searchsorted (scatter cost scales with n and
      loses past ~300k).

    Returns (indices i32[capacity], true_count i32[] clamped to capacity).
    Slots beyond the true count are zero-filled.
    """
    n = mask_flat.shape[0]
    mask = mask_flat.astype(jnp.int32)
    cs = jnp.cumsum(mask)
    count = jnp.minimum(cs[-1], capacity)
    if n <= _RANK_SCATTER_MAX_N:
        rank = jnp.where(mask_flat, cs - 1, capacity)  # invalid -> dropped
        idx = jnp.zeros((capacity,), jnp.int32).at[rank].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        return idx, count
    ranks = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(cs, ranks, side="left")
    idx = jnp.clip(idx, 0, n - 1).astype(jnp.int32)
    idx = jnp.where(ranks <= count, idx, 0)
    return idx, count


def dense_frontend(dog: jax.Array, dog_threshold: float,
                   capacity: int) -> Tuple[Candidates, jax.Array]:
    """Fused dense front half: extremum candidates AND the refinement
    walk-code field from ONE set of 3x3x3 neighbor slices (the extremum
    test and the Newton solve read identical neighborhoods; computing them
    together lets XLA fuse the dense passes)."""
    d = dog.astype(jnp.float32)
    ns, h, w = d.shape

    nb = {(a, b, c): jax.lax.dynamic_slice(
        d, (a, b, c), (ns - 2, h - 2, w - 2))
        for a in (0, 1, 2) for b in (0, 1, 2) for c in (0, 1, 2)}
    ctr = nb[(1, 1, 1)]
    nb_max = None
    nb_min = None
    for key, v in nb.items():
        if key == (1, 1, 1):
            continue
        nb_max = v if nb_max is None else jnp.maximum(nb_max, v)
        nb_min = v if nb_min is None else jnp.minimum(nb_min, v)
    mask = (jnp.abs(ctr) > (dog_threshold * 0.8)) & (
        (ctr > nb_max) | (ctr < nb_min))

    idx, count = rank_select(mask.reshape(-1), capacity)
    hw = (h - 2) * (w - 2)
    s = idx // hw + 1
    rem = idx % hw
    y = rem // (w - 2) + 1
    x = rem % (w - 2) + 1
    cand = Candidates(s=s.astype(jnp.int32), y=y.astype(jnp.int32),
                      x=x.astype(jnp.int32), count=count)

    off_s, off_x, off_y, _, _, _, singular = _newton_step(
        *[nb[(a, b, c)] for a in (0, 1, 2) for b in (0, 1, 2)
          for c in (0, 1, 2)])
    conv = ((jnp.abs(off_x) < 0.6) & (jnp.abs(off_y) < 0.6)
            & (jnp.abs(off_s) < 0.6))

    def sign_code(off):
        return jnp.where(off >= 0.6, 2, jnp.where(off <= -0.6, 0, 1))

    code = (sign_code(off_s) + 3 * sign_code(off_x) + 9 * sign_code(off_y)
            + _CODE_CONV * conv.astype(jnp.int32)
            + _CODE_SING * singular.astype(jnp.int32))
    return cand, code.astype(jnp.int8)


def extremum_candidates(dog: jax.Array, dog_threshold: float,
                        capacity: int) -> Candidates:
    """Find strict 26-neighbor extrema above the pre-threshold.

    Args:
      dog: (S+2, H, W) DoG images for one octave (any float dtype).
      dog_threshold: already divided by nb_scales (sift_detector.c:1136).
      capacity: static max number of candidates (octave section capacity).

    Returns compacted (s, y, x) indices in raster order plus the (clamped)
    true count. Centers range over s in [1, S], y in [1, H-2], x in [1, W-2]
    (ExtractKeypoints.comp:46-53).
    """
    d = dog.astype(jnp.float32)
    ns, h, w = d.shape
    c = d[1:-1, 1:-1, 1:-1]

    nb_max = jnp.full_like(c, -jnp.inf)
    nb_min = jnp.full_like(c, jnp.inf)
    for ds in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == 0 and dy == 0 and dx == 0:
                    continue
                nb = jax.lax.dynamic_slice(
                    d, (1 + ds, 1 + dy, 1 + dx), (ns - 2, h - 2, w - 2))
                nb_max = jnp.maximum(nb_max, nb)
                nb_min = jnp.minimum(nb_min, nb)

    mask = (jnp.abs(c) > (dog_threshold * 0.8)) & (
        (c > nb_max) | (c < nb_min))

    idx, count = rank_select(mask.reshape(-1), capacity)
    hw = (h - 2) * (w - 2)
    s = idx // hw + 1
    rem = idx % hw
    y = rem // (w - 2) + 1
    x = rem % (w - 2) + 1
    return Candidates(s=s.astype(jnp.int32), y=y.astype(jnp.int32),
                      x=x.astype(jnp.int32), count=count)


# ---------------------------------------------------------------------------
# Dense Newton-step fields + walk-code packing
# ---------------------------------------------------------------------------

# Walk-code layout (int8): ms+1 (base 3) | mx+1 (base 3) | my+1 (base 3)
# | converged (base 2) | singular (base 2) -> values in [0, 107].
_CODE_CONV = 27
_CODE_SING = 54


def _newton_step(n000, n001, n002, n010, n011, n012, n020, n021, n022,
                 n100, n101, n102, n110, n111, n112, n120, n121, n122,
                 n200, n201, n202, n210, n211, n212, n220, n221, n222):
    """One 3x3x3 Newton solve. Arguments n{s}{y}{x} are the neighborhood
    values (scalars or same-shape arrays); index order (s, y, x), offsets
    0/1/2 meaning -1/0/+1. Returns (off_s, off_x, off_y, g_s, g_x, g_y,
    singular). Math mirrors ExtractKeypoints.comp:124-165."""
    g_s = 0.5 * (n211 - n011)
    g_x = 0.5 * (n112 - n110)
    g_y = 0.5 * (n121 - n101)
    ctr = n111
    h11 = n211 + n011 - 2.0 * ctr  # d2/ds2
    h22 = n112 + n110 - 2.0 * ctr  # d2/dx2
    h33 = n121 + n101 - 2.0 * ctr  # d2/dy2
    h12 = 0.25 * (n212 - n210 - n012 + n010)  # ds dx
    h13 = 0.25 * (n221 - n201 - n021 + n001)  # ds dy
    h23 = 0.25 * (n122 - n120 - n102 + n100)  # dx dy

    det = (h11 * (h22 * h33 - h23 * h23)
           - h12 * (h12 * h33 - h13 * h23)
           + h13 * (h12 * h23 - h13 * h22))
    singular = det == 0.0
    # One reciprocal instead of six divides (div is multi-pass on the VPU;
    # this runs densely over every interior DoG cell).
    rdet = 1.0 / jnp.where(singular, 1.0, det)
    inv11 = (h22 * h33 - h23 * h23) * rdet
    inv12 = -(h12 * h33 - h13 * h23) * rdet
    inv13 = (h12 * h23 - h13 * h22) * rdet
    inv22 = (h11 * h33 - h13 * h13) * rdet
    inv23 = -(h11 * h23 - h13 * h12) * rdet
    inv33 = (h11 * h22 - h12 * h12) * rdet

    off_s = -inv11 * g_s - inv12 * g_x - inv13 * g_y
    off_x = -inv12 * g_s - inv22 * g_x - inv23 * g_y
    off_y = -inv13 * g_s - inv23 * g_x - inv33 * g_y
    return off_s, off_x, off_y, g_s, g_x, g_y, singular


def _walk_classify(n000, n001, n002, n010, n011, n012, n020, n021, n022,
                   n100, n101, n102, n110, n111, n112, n120, n121, n122,
                   n200, n201, n202, n210, n211, n212, n220, n221, n222):
    """Walk-code classification WITHOUT the reciprocal/inverse: the walk
    only needs each Newton offset classified into {<= -0.6, interior,
    >= 0.6}, and Cramer gives off_i = det_i / det — so compare the
    numerators det_i (sign-corrected by det) against 0.6*|det| directly.
    Saves the VPU-multipass reciprocal and the 6 inverse-entry products
    of :func:`_newton_step` over every dense cell. Returns (cs, cx, cy,
    conv, singular) with c* in {0, 1, 2} (the move-sign codes)."""
    g_s = 0.5 * (n211 - n011)
    g_x = 0.5 * (n112 - n110)
    g_y = 0.5 * (n121 - n101)
    ctr = n111
    h11 = n211 + n011 - 2.0 * ctr
    h22 = n112 + n110 - 2.0 * ctr
    h33 = n121 + n101 - 2.0 * ctr
    h12 = 0.25 * (n212 - n210 - n012 + n010)
    h13 = 0.25 * (n221 - n201 - n021 + n001)
    h23 = 0.25 * (n122 - n120 - n102 + n100)

    m11 = h22 * h33 - h23 * h23
    m12 = h12 * h33 - h13 * h23
    m13 = h12 * h23 - h13 * h22
    det = h11 * m11 - h12 * m12 + h13 * m13
    singular = det == 0.0
    # off_s*det, off_x*det, off_y*det (Cramer numerators of H off = -g).
    num_s = -g_s * m11 + g_x * m12 - g_y * m13
    num_x = (g_s * m12 - g_x * (h11 * h33 - h13 * h13)
             + g_y * (h11 * h23 - h13 * h12))
    num_y = (-g_s * m13 + g_x * (h11 * h23 - h12 * h13)
             - g_y * (h11 * h22 - h12 * h12))
    thr = 0.6 * jnp.abs(det)
    neg = det < 0.0

    def cls(num):
        n = jnp.where(neg, -num, num)   # sign-corrected numerator
        return jnp.where(n >= thr, 2, jnp.where(n <= -thr, 0, 1))

    cs, cx, cy = cls(num_s), cls(num_x), cls(num_y)
    conv = (cs == 1) & (cx == 1) & (cy == 1)
    return cs, cx, cy, conv, singular


def _dense_walk_code(dog: jax.Array) -> jax.Array:
    """Per-interior-cell walk code: move signs (|off| >= 0.6 per axis),
    convergence, and Hessian-singularity, packed into one int8."""
    d = dog.astype(jnp.float32)
    ns, h, w = d.shape

    def sl(ds, dy, dx):
        return jax.lax.dynamic_slice(
            d, (1 + ds, 1 + dy, 1 + dx), (ns - 2, h - 2, w - 2))

    nb = {(a, b, c): sl(a - 1, b - 1, c - 1)
          for a in (0, 1, 2) for b in (0, 1, 2) for c in (0, 1, 2)}
    cs, cx, cy, conv, singular = _walk_classify(
        *[nb[(a, b, c)] for a in (0, 1, 2) for b in (0, 1, 2)
          for c in (0, 1, 2)])
    code = (cs + 3 * cx + 9 * cy
            + _CODE_CONV * conv.astype(jnp.int32)
            + _CODE_SING * singular.astype(jnp.int32))
    return code.astype(jnp.int8)


def _gather_flat(flat: jax.Array, idx: jax.Array) -> jax.Array:
    return flat[jnp.clip(idx, 0, flat.shape[0] - 1)]


def _gather_neighborhood(flat: jax.Array, base: jax.Array, stride_layer,
                         stride_row) -> dict:
    """27-point (3x3x3) neighborhoods around flat indices ``base``, as 27
    single-element (k,) gathers. Hardware (v5e): element gathers lower
    to the fast 1-D gather path (vmapped dynamic slices are ~20x slower,
    results/hw_r5a/gatherbench.log). A single folded (27, k) gather was
    measured-and-REJECTED in-pipeline: refine +8.81 vs +6.53 ms at
    1536x1024 (results/hw_r5c/stagebench_1536_default.log vs r5b) — the
    2-D index array drops off the fast path, and the isolated
    giant-source regime where folding won (gatherbench2) does not occur
    in the per-octave bucketed refine. Callers guarantee base points at
    interior cells; the clip only protects dummy slots."""
    n = flat.shape[0]
    nb = {}
    for a in (0, 1, 2):
        for b in (0, 1, 2):
            row0 = base + (a - 1) * stride_layer + (b - 1) * stride_row
            for c in (0, 1, 2):
                idx = jnp.clip(row0 + c - 1, 0, n - 1)
                nb[(a, b, c)] = flat[idx]
    return nb


def _gather_neighborhood_2d(d2: jax.Array, base_row: jax.Array,
                            layer_rows: int, col: jax.Array) -> dict:
    """27-point neighborhoods from a 2-D ``(S*H, W)`` view of the DoG
    stack — 27 element gathers (see :func:`_gather_neighborhood` for the
    measured-and-rejected folded single-gather alternative). The
    (S, H, W) -> (S*H, W) reshape is a layout-preserving bitcast when H
    is a multiple of the 8-row tile, while a 1-D flatten relayouts the
    whole stack (1.9 ms at 3456x2304 octave 0, round-5 trace).
    ``base_row = s*H + y``; ``layer_rows = H``."""
    nr, w = d2.shape
    nb = {}
    for a in (0, 1, 2):
        for b in (0, 1, 2):
            r = jnp.clip(base_row + (a - 1) * layer_rows + (b - 1),
                         0, nr - 1)
            for c in (0, 1, 2):
                cc = jnp.clip(col + c - 1, 0, w - 1)
                nb[(a, b, c)] = d2[r, cc]
    return nb


@functools.partial(jax.jit, static_argnames=(
    "nb_scales", "width", "height", "dog_threshold", "edge_threshold",
    "seed_sigma", "octave_idx"))
def refine_candidates(dog: jax.Array, cand: Candidates, *, nb_scales: int,
                      width: int, height: int, dog_threshold: float,
                      edge_threshold: float, seed_sigma: float,
                      octave_idx: int,
                      code: Optional[jax.Array] = None) -> RefinedKeypoints:
    """Subpixel refinement of compacted candidates (see module docstring).

    Slots at index >= cand.count walk dummy data and are masked invalid.
    ``octave_idx`` already includes the -1 shift for the upsampled octave
    (sift_detector.c:1134).
    """
    d = dog.astype(jnp.float32)
    ns, h, w = d.shape

    if code is None:
        code = _dense_walk_code(dog)
    # Two layouts: interior (S, H-2, W-2) indexed [s-1, y-1, x-1] (the XLA
    # dense path) or full-width (S, HR, WP) indexed [s-1, y-1, x] (the
    # Pallas frontend, ops/pallas_frontend; may carry a candidate bit).
    full_width = code.shape[-1] >= w
    chr_, cwr = code.shape[1], code.shape[2]
    # Materialize the dense code field BEFORE the walk scan: without the
    # barrier XLA fuses the whole dense Newton computation into the while
    # body and recomputes it every step (~10 ms/octave at octave 0,
    # observed in traces) instead of gathering from 1 byte/cell in HBM.
    code = jax.lax.optimization_barrier(code)
    # 2-D (S*HR, WR) view: layout-preserving (no relayout) when the row
    # count is tile-aligned, unlike a 1-D flatten.
    code2 = code.reshape(code.shape[0] * chr_, cwr)

    def code_at(rs, ry, rx):
        row = (rs - 1) * chr_ + (ry - 1)
        cc = rx if full_width else rx - 1
        row = jnp.clip(row, 0, code2.shape[0] - 1)
        cc = jnp.clip(cc, 0, cwr - 1)
        c = code2[row, cc].astype(jnp.int32)
        return jax.lax.rem(c, 128)  # strip any candidate bit

    # --- 5-step walk over the dense code field -------------------------
    def step(carry, step_i, c0=None):
        rs, ry, rx, valid, done = carry
        c = code_at(rs, ry, rx) if c0 is None else c0
        sing = (c // _CODE_SING) % 2 == 1
        conv = (c // _CODE_CONV) % 2 == 1
        active = valid & jnp.logical_not(done)
        valid = jnp.where(active & sing, False, valid)
        act2 = active & jnp.logical_not(sing)
        done = jnp.where(act2 & conv, True, done)
        may_move = act2 & jnp.logical_not(conv) & (
            step_i < NB_REFINEMENT_STEPS - 1)
        mm = may_move.astype(jnp.int32)
        ms = c % 3 - 1
        mx = (c // 3) % 3 - 1
        my = (c // 9) % 3 - 1
        # Clamped integer moves (ExtractKeypoints.comp:183-188): with
        # |m| <= 1 and positions already interior, "refuse the move if it
        # leaves the interior" == clip(pos + m) to the interior — fewer
        # ops on the latency-bound (k,) walk chains.
        rx = jnp.clip(rx + mx * mm, 1, width - 2)
        ry = jnp.clip(ry + my * mm, 1, height - 2)
        rs = jnp.clip(rs + ms * mm, 1, nb_scales)
        return (rs, ry, rx, valid, done), None

    k = cand.s.shape[0]
    d2 = d.reshape(ns * h, w)

    def refine_at(kb):
        """Walk + final tests on the first ``kb`` candidate slots, padded
        back to ``k``. Bucketed by the live candidate count: the walk and
        neighborhood gathers are latency-bound per element, so running
        them at the bucket size scales refine with actual candidates."""

        def run():
            carry = (cand.s[:kb], cand.y[:kb], cand.x[:kb],
                     jnp.ones((kb,), jnp.bool_), jnp.zeros((kb,), jnp.bool_))
            # Unrolled (NB_REFINEMENT_STEPS is 5 and static): a lax.scan
            # here pays TPU while-loop per-iteration overhead. Step 0 uses
            # the candidate's own code when the frontend provides it
            # (saves one latency-bound gather per walk).
            for step_i in range(NB_REFINEMENT_STEPS):
                c0 = (cand.code0[:kb] if step_i == 0
                      and cand.code0 is not None else None)
                carry, _ = step(carry, step_i, c0)
            rs, ry, rx, valid, _ = carry

            # Final Newton solve + acceptance tests at the stop cell.
            # Walk stops are interior cells, so all 27 neighbors are
            # in-bounds; fetch as 9 contiguous 3-element slices from the
            # 2-D view (no 1-D flatten relayout).
            nb = _gather_neighborhood_2d(d2, rs * h + ry, h, rx)
            off_s, off_x, off_y, g_s, g_x, g_y, singular = _newton_step(
                *[nb[(a, b, c)] for a in (0, 1, 2) for b in (0, 1, 2)
                  for c in (0, 1, 2)])
            valid &= jnp.logical_not(singular)

            subpix_x = rx.astype(jnp.float32) + off_x
            subpix_y = ry.astype(jnp.float32) + off_y
            subpix_s = rs.astype(jnp.float32) + off_s

            ctr = nb[(1, 1, 1)]
            new_val = ctr + 0.5 * (g_x * off_x + g_y * off_y + g_s * off_s)

            ok = valid
            ok &= jnp.abs(new_val) > dog_threshold
            ok &= ((jnp.abs(off_x) < 1.5) & (jnp.abs(off_y) < 1.5)
                   & (jnp.abs(off_s) < 1.5))
            ok &= (subpix_x >= 0) & (subpix_x < width)
            ok &= (subpix_y >= 0) & (subpix_y < height)
            ok &= (subpix_s >= 0) & (subpix_s <= nb_scales + 1)

            # 2x2 spatial Hessian edge test (ExtractKeypoints.comp:
            # 197-206).
            h11 = nb[(1, 1, 2)] + nb[(1, 1, 0)] - 2.0 * ctr
            h22 = nb[(1, 2, 1)] + nb[(1, 0, 1)] - 2.0 * ctr
            h12 = 0.25 * (nb[(1, 2, 2)] - nb[(1, 0, 2)] - nb[(1, 2, 0)]
                          + nb[(1, 0, 0)])
            det2 = h11 * h22 - h12 * h12
            edgeness = jnp.where(
                det2 == 0.0, jnp.inf,
                (h11 + h22) ** 2 / jnp.where(det2 == 0.0, 1.0, det2))
            e = edge_threshold
            ok &= (edgeness < ((e + 1.0) ** 2 / e)) & (edgeness >= 0)
            ok &= jnp.arange(kb) < cand.count

            pad = (0, k - kb)
            return tuple(jnp.pad(a, pad) for a in (
                ok, subpix_x, subpix_y, subpix_s, new_val))
        return run

    sizes = bucket_sizes(k, lo=2048)
    if len(sizes) == 1:
        ok, subpix_x, subpix_y, subpix_s, new_val = refine_at(k)()
    else:
        bi = sum((cand.count > s).astype(jnp.int32) for s in sizes[:-1])
        ok, subpix_x, subpix_y, subpix_s, new_val = jax.lax.switch(
            bi, [refine_at(s) for s in sizes])

    scale_factor = 2.0 ** octave_idx
    sigma = seed_sigma * jnp.exp2(subpix_s / nb_scales) * scale_factor
    return RefinedKeypoints(
        valid=ok,
        scale_x=subpix_x,
        scale_y=subpix_y,
        subpix_s=subpix_s,
        scale_idx=jnp.round(subpix_s).astype(jnp.int32),
        sigma=sigma,
        intensity=new_val,
        x=subpix_x * scale_factor,
        y=subpix_y * scale_factor,
    )


# ---------------------------------------------------------------------------
# Global (all-octaves) refinement
# ---------------------------------------------------------------------------

class GlobalRefined(NamedTuple):
    """refine_candidates output concatenated over octaves, plus octave ids."""

    refined: RefinedKeypoints  # all arrays at sum(caps)
    oct_id: jax.Array          # i32[sum(caps)]


def refine_candidates_global(dogs, cands, codes, *, nb_scales: int,
                             oct_res, dog_threshold: float,
                             edge_threshold: float, seed_sigma: float,
                             upsampling: bool,
                             octave_base: int = 0) -> GlobalRefined:
    """One refinement walk for ALL octaves.

    The per-octave walks are gather-latency bound on TPU (each of the
    5 scan steps issues one gather per octave); concatenating the code
    fields and DoG volumes into flat buffers with per-candidate base
    offsets turns 5 x nb_octaves gathers into 5 gathers total.

    Args:
      dogs: per-octave (S+2, H, W) DoG stacks.
      cands: per-octave Candidates (capacity caps[o]).
      codes: per-octave walk-code fields — interior layout (S, H-2, W-2)
        or the Pallas frontend's full-width layout (S, HR, WP); layouts may
        be mixed across octaves.
      octave_base: pyramid index of ``dogs[0]`` — nonzero when refining
        only a tail of the pyramid (the hybrid split in pipeline.py:
        big octaves walk per-octave, small octaves share one walk).
    """
    nb_oct = len(oct_res)

    # --- row-concat the code fields and DoGs (2-D views) ----------------
    # The former 1-D ``reshape(-1)`` flattens were full relayouts of
    # every octave volume (~1.9 ms per big octave, round-5 trace; the
    # 1536x1024 force-global arm measured +13 ms over the hybrid,
    # results/hw_r5c/stagebench_1536_globalref.log). Lane-padding each
    # octave to the widest width and concatenating the (S*H, W) 2-D
    # views preserves layout (the reshape is a bitcast for 8-aligned
    # row counts; the pads only copy the narrower octaves).
    # Barrier: keep XLA from fusing the dense code computation into the
    # walk chain (it would recompute the field every step).
    wc_code = max(c.shape[2] for c in codes)
    code_roff = []
    code_rows = []
    ro = 0
    for c in codes:
        code_roff.append(ro)
        cpad = jnp.pad(c, ((0, 0), (0, 0), (0, wc_code - c.shape[2])))
        code_rows.append(cpad.reshape(c.shape[0] * c.shape[1], wc_code))
        ro += c.shape[0] * c.shape[1]
    code2 = jax.lax.optimization_barrier(
        jnp.concatenate(code_rows, axis=0))

    wc_dog = max(d.shape[2] for d in dogs)
    dog_roff = []
    dog_rows = []
    ro = 0
    for d in dogs:
        dog_roff.append(ro)
        dpad = jnp.pad(d.astype(jnp.float32),
                       ((0, 0), (0, 0), (0, wc_dog - d.shape[2])))
        dog_rows.append(dpad.reshape(d.shape[0] * d.shape[1], wc_dog))
        ro += d.shape[0] * d.shape[1]
    dog2 = jnp.concatenate(dog_rows, axis=0)

    # Per-octave geometry constants, materialized by segment CONCATENATION
    # (free constants), never by ``table[oct_id]`` gathers — a (31k,) 1-D
    # gather costs ~0.2 ms on v5e regardless of table size, and there are
    # seven of these.
    full_width = [codes[o].shape[-1] >= oct_res[o][0] for o in range(nb_oct)]

    def seg(vals):
        return jnp.concatenate(
            [jnp.full((cands[o].s.shape[0],), int(vals[o]), jnp.int32)
             for o in range(nb_oct)])

    # --- global candidate arrays -----------------------------------------
    oct_id = seg(list(range(nb_oct)))
    s0 = jnp.concatenate([c.s for c in cands])
    y0 = jnp.concatenate([c.y for c in cands])
    x0 = jnp.concatenate([c.x for c in cands])
    in_count = jnp.concatenate([jnp.arange(c.s.shape[0]) < c.count
                                for c in cands])
    k = s0.shape[0]

    g_chr = seg([c.shape[1] for c in codes])
    g_fw = seg([1 if f else 0 for f in full_width])
    g_coff = seg(code_roff)
    g_doff = seg(dog_roff)
    g_w = seg([w for w, _ in oct_res])
    g_h = seg([h for _, h in oct_res])
    # Keep the segment tables as RUNTIME values: without the barrier XLA
    # constant-folds every downstream index chain (g_coff + f(g_chr,
    # g_cwr, ...) per unrolled walk step) into materialized s32[K, 1]
    # constants whose tiled layout pads the minor dim to 128 lanes —
    # 8 MB of embedded executable bytes PER table (15 of them = 126 MB of
    # the 208 MB program at 640x480; /tmp/xdump round-5 analysis). The
    # concats themselves stay 1-D (64 KB) and the arithmetic costs ~10
    # VPU ops on K elements.
    (g_chr, g_fw, g_coff, g_doff, g_w, g_h,
     oct_id) = jax.lax.optimization_barrier(
        (g_chr, g_fw, g_coff, g_doff, g_w, g_h, oct_id))

    def code_at(rs, ry, rx):
        rxs = jnp.where(g_fw == 1, rx, rx - 1)
        row = g_coff + (rs - 1) * g_chr + (ry - 1)
        c = code2[jnp.clip(row, 0, code2.shape[0] - 1),
                  jnp.clip(rxs, 0, wc_code - 1)].astype(jnp.int32)
        return jax.lax.rem(c, 128)

    def step(carry, step_i, c0=None):
        rs, ry, rx, valid, done = carry
        c = code_at(rs, ry, rx) if c0 is None else c0
        sing = (c // _CODE_SING) % 2 == 1
        conv = (c // _CODE_CONV) % 2 == 1
        active = valid & jnp.logical_not(done)
        valid = jnp.where(active & sing, False, valid)
        act2 = active & jnp.logical_not(sing)
        done = jnp.where(act2 & conv, True, done)
        may_move = act2 & jnp.logical_not(conv) & (
            step_i < NB_REFINEMENT_STEPS - 1)
        mm = may_move.astype(jnp.int32)
        ms = c % 3 - 1
        mx = (c // 3) % 3 - 1
        my = (c // 9) % 3 - 1
        # Clamped integer moves as clips (see refine_candidates.step).
        rx = jnp.clip(rx + mx * mm, 1, g_w - 2)
        ry = jnp.clip(ry + my * mm, 1, g_h - 2)
        rs = jnp.clip(rs + ms * mm, 1, nb_scales)
        return (rs, ry, rx, valid, done), None

    # Step 0 skips its code gather when every octave's frontend provided
    # the candidate's own code.
    code0_g = (jnp.concatenate([c.code0 for c in cands])
               if all(c.code0 is not None for c in cands) else None)
    carry = (s0, y0, x0,
             jnp.ones((k,), jnp.bool_), jnp.zeros((k,), jnp.bool_))
    for step_i in range(NB_REFINEMENT_STEPS):  # unrolled; see above
        carry, _ = step(carry, step_i, code0_g if step_i == 0 else None)
    rs, ry, rx, valid, _ = carry

    # --- final Newton solve + acceptance tests at the stop cell ----------
    base_row = g_doff + rs * g_h + ry
    nb = _gather_neighborhood_2d(dog2, base_row, g_h, rx)
    off_s, off_x, off_y, g_s, g_x, g_y, singular = _newton_step(
        *[nb[(a, b, c)] for a in (0, 1, 2) for b in (0, 1, 2)
          for c in (0, 1, 2)])
    valid &= jnp.logical_not(singular)

    subpix_x = rx.astype(jnp.float32) + off_x
    subpix_y = ry.astype(jnp.float32) + off_y
    subpix_s = rs.astype(jnp.float32) + off_s

    ctr = nb[(1, 1, 1)]
    new_val = ctr + 0.5 * (g_x * off_x + g_y * off_y + g_s * off_s)

    wf = g_w.astype(jnp.float32)
    hf = g_h.astype(jnp.float32)
    ok = valid
    ok &= jnp.abs(new_val) > dog_threshold
    ok &= ((jnp.abs(off_x) < 1.5) & (jnp.abs(off_y) < 1.5)
           & (jnp.abs(off_s) < 1.5))
    ok &= (subpix_x >= 0) & (subpix_x < wf)
    ok &= (subpix_y >= 0) & (subpix_y < hf)
    ok &= (subpix_s >= 0) & (subpix_s <= nb_scales + 1)

    h11 = nb[(1, 1, 2)] + nb[(1, 1, 0)] - 2.0 * ctr
    h22 = nb[(1, 2, 1)] + nb[(1, 0, 1)] - 2.0 * ctr
    h12 = 0.25 * (nb[(1, 2, 2)] - nb[(1, 0, 2)] - nb[(1, 2, 0)]
                  + nb[(1, 0, 0)])
    det2 = h11 * h22 - h12 * h12
    edgeness = jnp.where(det2 == 0.0, jnp.inf,
                         (h11 + h22) ** 2 / jnp.where(det2 == 0.0, 1.0, det2))
    e = edge_threshold
    ok &= (edgeness < ((e + 1.0) ** 2 / e)) & (edgeness >= 0)
    ok &= in_count

    octave_idx = octave_base + oct_id - (1 if upsampling else 0)
    scale_factor = jnp.exp2(octave_idx.astype(jnp.float32))
    sigma = seed_sigma * jnp.exp2(subpix_s / nb_scales) * scale_factor
    refined = RefinedKeypoints(
        valid=ok, scale_x=subpix_x, scale_y=subpix_y, subpix_s=subpix_s,
        scale_idx=jnp.round(subpix_s).astype(jnp.int32),
        sigma=sigma, intensity=new_val,
        x=subpix_x * scale_factor, y=subpix_y * scale_factor)
    return GlobalRefined(refined=refined, oct_id=oct_id)
