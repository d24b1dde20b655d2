"""DoG extrema detection and subpixel refinement (pure XLA).

Replaces the reference's ExtractKeypoints compute shader
(reference: src/vulkansift/shaders/ExtractKeypoints.comp) with a two-phase
TPU-native design:

1. :func:`extremum_candidates` — dense, vectorized 3x3x3 strict-extremum test
   with the |v| > 0.8*dog_threshold pre-filter (ExtractKeypoints.comp:57-116),
   compacted to a static per-octave capacity via sort-free ``jnp.nonzero``.
   This replaces the shader's atomicAdd append (ExtractKeypoints.comp:208-224)
   with a deterministic raster-order compaction.
2. :func:`refine_candidates` — the 5-step iterative subpixel refinement via
   3x3 Hessian solve with the same 0.6 convergence / clamped integer moves /
   VLFeat-style no-move-on-last-iteration (ExtractKeypoints.comp:133-188),
   final DoG-value, displacement (<1.5), bounds, and 2x2-Hessian edge tests
   (ExtractKeypoints.comp:194-206). Runs vmapped over a *bucketed* candidate
   count, so compute tracks the actual keypoint count like the reference's
   indirect dispatch does, with a bounded number of XLA program shapes.

The candidate capacity policy is the reference's geometric-halves section
sizing (SiftConfig.octave_section_capacities; reference sift_memory.c:40-87).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import NB_REFINEMENT_STEPS, SiftConfig


class Candidates(NamedTuple):
    """Compacted extremum candidates for one octave (static capacity)."""

    s: jax.Array  # i32[K] scale index of the DoG center layer (1..nb_scales)
    y: jax.Array  # i32[K]
    x: jax.Array  # i32[K]
    count: jax.Array  # i32[]


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

    # Compact to static capacity, raster (s, y, x) order.
    flat = mask.reshape(-1)
    count = jnp.minimum(jnp.sum(flat, dtype=jnp.int32), capacity)
    (idx,) = jnp.nonzero(flat, size=capacity, fill_value=0)
    hw = (h - 2) * (w - 2)
    s = idx // hw + 1
    rem = idx % hw
    y = rem // (w - 2) + 1
    x = rem % (w - 2) + 1
    return Candidates(s=s.astype(jnp.int32), y=y.astype(jnp.int32),
                      x=x.astype(jnp.int32), count=count)


def _gather27(dog: jax.Array, s: jax.Array, y: jax.Array,
              x: jax.Array) -> jax.Array:
    """3x3x3 neighborhood around (s, y, x); callers guarantee in-bounds."""
    return jax.lax.dynamic_slice(dog, (s - 1, y - 1, x - 1), (3, 3, 3))


def _refine_one(dog: jax.Array, s0: jax.Array, y0: jax.Array, x0: jax.Array,
                *, nb_scales: int, width: int, height: int,
                dog_threshold: float, edge_threshold: float,
                seed_sigma: float, octave_idx: int) -> RefinedKeypoints:
    """Refine a single candidate; mirrors ExtractKeypoints.comp:124-231."""

    def step(carry, step_i):
        rx, ry, rs, offs, grads, valid, done = carry
        n = _gather27(dog, rs, ry, rx).astype(jnp.float32)
        # Gradient (central differences), order (S, X, Y) as in the shader.
        g_s = 0.5 * (n[2, 1, 1] - n[0, 1, 1])
        g_x = 0.5 * (n[1, 1, 2] - n[1, 1, 0])
        g_y = 0.5 * (n[1, 2, 1] - n[1, 0, 1])
        ctr = n[1, 1, 1]
        h11 = n[2, 1, 1] + n[0, 1, 1] - 2.0 * ctr  # d2/ds2
        h22 = n[1, 1, 2] + n[1, 1, 0] - 2.0 * ctr  # d2/dx2
        h33 = n[1, 2, 1] + n[1, 0, 1] - 2.0 * ctr  # d2/dy2
        h12 = 0.25 * (n[2, 1, 2] - n[2, 1, 0] - n[0, 1, 2] + n[0, 1, 0])
        h13 = 0.25 * (n[2, 2, 1] - n[2, 0, 1] - n[0, 2, 1] + n[0, 0, 1])
        h23 = 0.25 * (n[1, 2, 2] - n[1, 0, 2] - n[1, 2, 0] + n[1, 0, 0])

        det = (h11 * (h22 * h33 - h23 * h23)
               - h12 * (h12 * h33 - h13 * h23)
               + h13 * (h12 * h23 - h13 * h22))
        singular = det == 0.0
        safe_det = jnp.where(singular, 1.0, det)
        inv11 = (h22 * h33 - h23 * h23) / safe_det
        inv12 = -(h12 * h33 - h13 * h23) / safe_det
        inv13 = (h12 * h23 - h13 * h22) / safe_det
        inv22 = (h11 * h33 - h13 * h13) / safe_det
        inv23 = -(h11 * h23 - h13 * h12) / safe_det
        inv33 = (h11 * h22 - h12 * h12) / safe_det

        off_s = -inv11 * g_s - inv12 * g_x - inv13 * g_y
        off_x = -inv12 * g_s - inv22 * g_x - inv23 * g_y
        off_y = -inv13 * g_s - inv23 * g_x - inv33 * g_y

        active = jnp.logical_and(valid, jnp.logical_not(done))
        new_valid = jnp.where(active & singular, False, valid)
        act2 = jnp.logical_and(active, jnp.logical_not(singular))

        converged = ((jnp.abs(off_x) < 0.6) & (jnp.abs(off_y) < 0.6)
                     & (jnp.abs(off_s) < 0.6))
        new_done = jnp.where(act2 & converged, True, done)

        # Clamped integer move, skipped on the last iteration (VLFeat-style,
        # ExtractKeypoints.comp:183-188).
        may_move = act2 & jnp.logical_not(converged) & (
            step_i < NB_REFINEMENT_STEPS - 1)
        mx = (jnp.where((off_x >= 0.6) & (rx < width - 2), 1, 0)
              + jnp.where((off_x <= -0.6) & (rx > 1), -1, 0))
        my = (jnp.where((off_y >= 0.6) & (ry < height - 2), 1, 0)
              + jnp.where((off_y <= -0.6) & (ry > 1), -1, 0))
        ms = (jnp.where((off_s >= 0.6) & (rs < nb_scales), 1, 0)
              + jnp.where((off_s <= -0.6) & (rs > 1), -1, 0))
        rx = jnp.where(may_move, rx + mx, rx)
        ry = jnp.where(may_move, ry + my, ry)
        rs = jnp.where(may_move, rs + ms, rs)

        offs = tuple(jnp.where(act2, o, p)
                     for o, p in zip((off_x, off_y, off_s), offs))
        grads = tuple(jnp.where(act2, g, p)
                      for g, p in zip((g_x, g_y, g_s), grads))
        return (rx, ry, rs, offs, grads, new_valid, new_done), None

    zero = jnp.float32(0.0)
    init = (x0, y0, s0, (zero, zero, zero), (zero, zero, zero),
            jnp.bool_(True), jnp.bool_(False))
    (rx, ry, rs, (off_x, off_y, off_s), (g_x, g_y, g_s), valid, _), _ = (
        jax.lax.scan(step, init, jnp.arange(NB_REFINEMENT_STEPS)))

    subpix_x = rx.astype(jnp.float32) + off_x
    subpix_y = ry.astype(jnp.float32) + off_y
    subpix_s = rs.astype(jnp.float32) + off_s

    n = _gather27(dog, rs, ry, rx).astype(jnp.float32)
    ctr = n[1, 1, 1]
    new_val = ctr + 0.5 * (g_x * off_x + g_y * off_y + g_s * off_s)

    ok = valid
    ok &= jnp.abs(new_val) > dog_threshold
    ok &= (jnp.abs(off_x) < 1.5) & (jnp.abs(off_y) < 1.5) & (jnp.abs(off_s) < 1.5)
    ok &= (subpix_x >= 0) & (subpix_x < width)
    ok &= (subpix_y >= 0) & (subpix_y < height)
    ok &= (subpix_s >= 0) & (subpix_s <= nb_scales + 1)

    # 2x2 spatial Hessian edge test (ExtractKeypoints.comp:197-206).
    h11 = n[1, 1, 2] + n[1, 1, 0] - 2.0 * ctr
    h22 = n[1, 2, 1] + n[1, 0, 1] - 2.0 * ctr
    h12 = 0.25 * (n[1, 2, 2] - n[1, 0, 2] - n[1, 2, 0] + n[1, 0, 0])
    det2 = h11 * h22 - h12 * h12
    edgeness = jnp.where(det2 == 0.0, jnp.inf,
                         (h11 + h22) ** 2 / jnp.where(det2 == 0.0, 1.0, det2))
    e = edge_threshold
    ok &= (edgeness < ((e + 1.0) ** 2 / e)) & (edgeness >= 0)

    scale_factor = 2.0 ** octave_idx
    sigma = (seed_sigma * jnp.exp2(subpix_s / nb_scales) * scale_factor)
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


@functools.partial(jax.jit, static_argnames=(
    "nb_scales", "width", "height", "dog_threshold", "edge_threshold",
    "seed_sigma", "octave_idx"))
def refine_candidates(dog: jax.Array, cand: Candidates, *, nb_scales: int,
                      width: int, height: int, dog_threshold: float,
                      edge_threshold: float, seed_sigma: float,
                      octave_idx: int) -> RefinedKeypoints:
    """Vmapped subpixel refinement over a (bucketed) candidate array.

    Slots at index >= cand.count are refined on dummy data and masked
    invalid. ``octave_idx`` already includes the -1 shift for the upsampled
    octave (sift_detector.c:1134).
    """
    refined = jax.vmap(
        lambda s, y, x: _refine_one(
            dog, s, y, x, nb_scales=nb_scales, width=width, height=height,
            dog_threshold=dog_threshold, edge_threshold=edge_threshold,
            seed_sigma=seed_sigma, octave_idx=octave_idx)
    )(cand.s, cand.y, cand.x)
    in_count = jnp.arange(cand.s.shape[0]) < cand.count
    return refined._replace(valid=refined.valid & in_count)
