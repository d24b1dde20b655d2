"""Dense front-half TPU kernel: extremum mask + Newton walk-code + row
counts in ONE pass over an octave's DoG volume (Pallas).

The XLA formulation of the dense front half (ops/extract.dense_frontend)
materializes many intermediate passes; this kernel streams row blocks of
the DoG through VMEM once and emits, per interior cell:

* a packed u8 "cell code": the refinement walk code (move signs,
  convergence, singularity — see ops/extract) plus a candidate bit from
  the 26-neighbor strict-extremum test (ExtractKeypoints.comp:57-116);
* per-(layer, row) candidate counts, which turn the global rank-select
  compaction into a two-level search (tiny cumsum over rows + per-rank
  within-row search) instead of a cumsum over every DoG cell.

Cell-code addressing is FULL-SIZE raster: code[s-1, y, x] holds the cell
at DoG position (s, y, x); border cells carry no candidate bit.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .extract import (_CODE_CONV, _CODE_SING, _newton_step, Candidates,
                      rank_select)

_CODE_CAND = 128  # candidate bit (u8; walk code occupies [0, 107])
_BR = 16          # rows per grid step


def _make_front_kernel(ns: int, h: int, w_true: int, w: int,
                       dog_threshold: float):
    s_layers = ns - 2  # center layers 1..ns-2

    def kernel(dog_ref, code_ref, counts_ref, blk, sem):
        step = pl.program_id(0)
        y0 = step * _BR  # first interior row of this block (y = y0 + 1 … )

        # Halo block: rows [y0, y0 + _BR + 8) of every layer.
        dma = pltpu.make_async_copy(
            dog_ref.at[:, pl.ds(pl.multiple_of(y0, 8), _BR + 8), :],
            blk, sem)
        dma.start()
        dma.wait()

        # Lane-shifted variants per layer (x-1, x, x+1).
        def lat(l, dy, dx):
            rows = blk[l, pl.ds(dy, _BR), :]          # (BR, w)
            if dx == 0:
                return rows
            return pltpu.roll(rows, (-dx) % w, 1)

        jj = jax.lax.broadcasted_iota(jnp.int32, (_BR, w), 1)
        ii = jax.lax.broadcasted_iota(jnp.int32, (_BR, w), 0)
        interior_x = (jj >= 1) & (jj <= w_true - 2)
        interior_y = (y0 + 1 + ii) <= h - 2

        codes = []
        counts = []
        for sc in range(1, s_layers + 1):
            nb = {}
            for a in (0, 1, 2):
                for b in (0, 1, 2):
                    for c in (0, 1, 2):
                        nb[(a, b, c)] = lat(sc - 1 + a, b, c - 1)
            ctr = nb[(1, 1, 1)]
            mx = None
            mn = None
            for key, v in nb.items():
                if key == (1, 1, 1):
                    continue
                mx = v if mx is None else jnp.maximum(mx, v)
                mn = v if mn is None else jnp.minimum(mn, v)
            cand = ((jnp.abs(ctr) > dog_threshold * 0.8)
                    & ((ctr > mx) | (ctr < mn))
                    & interior_x & interior_y)

            off_s, off_x, off_y, _, _, _, singular = _newton_step(
                *[nb[(a, b, c)] for a in (0, 1, 2) for b in (0, 1, 2)
                  for c in (0, 1, 2)])
            conv = ((jnp.abs(off_x) < 0.6) & (jnp.abs(off_y) < 0.6)
                    & (jnp.abs(off_s) < 0.6))

            def sign_code(off):
                return jnp.where(off >= 0.6, 2,
                                 jnp.where(off <= -0.6, 0, 1))

            code = (sign_code(off_s) + 3 * sign_code(off_x)
                    + 9 * sign_code(off_y)
                    + _CODE_CONV * conv.astype(jnp.int32)
                    + _CODE_SING * singular.astype(jnp.int32)
                    + _CODE_CAND * cand.astype(jnp.int32))
            codes.append(code.astype(jnp.uint8).reshape(1, _BR, w))
            counts.append(jnp.sum(cand.astype(jnp.int32), axis=1,
                                  keepdims=True))      # (BR, 1)

        code_ref[:] = jnp.concatenate(codes, axis=0)   # (S, BR, w)
        counts_ref[:] = jnp.concatenate(counts, axis=1)  # (BR, S)

    return kernel


@functools.partial(jax.jit, static_argnames=("dog_threshold", "capacity"))
def frontend_tpu(dog: jax.Array, *, dog_threshold: float,
                 capacity: int) -> Tuple[Candidates, jax.Array]:
    """Pallas dense frontend for one octave.

    Args:
      dog: (S+2, H, W) DoG stack, H a multiple of 8 preferred (padded
        internally), W a multiple of 128 (caller pads; pyramid widths are).

    Returns (Candidates at ``capacity`` in raster order, code field
    u8 (S, HR, WP) addressed as code[s-1, y-1, x], lanes padded to 128).
    """
    d = dog.astype(jnp.float32)
    ns, h, w_true = d.shape
    w = -(-w_true // 128) * 128  # pad lanes (zeros can't pass the threshold)
    s_layers = ns - 2
    # Interior rows are 1..h-2; blocks start at multiples of _BR.
    nsteps = -(-(h - 2) // _BR)
    hp = nsteps * _BR + 8  # halo slack
    if hp > h or w > w_true:
        d = jnp.pad(d, ((0, 0), (0, max(hp - h, 0)), (0, w - w_true)))

    kernel = _make_front_kernel(ns, h, w_true, w, dog_threshold)
    code, counts = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((s_layers, _BR, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BR, s_layers), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s_layers, nsteps * _BR, w), jnp.uint8),
            jax.ShapeDtypeStruct((nsteps * _BR, s_layers), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ns, _BR + 8, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(d)

    # Two-level rank select: rows are (layer, block_row) in raster order
    # (s-major, then y). counts[r, sc] counts candidates in interior row
    # y = r + 1 of center layer sc+1.
    hr = nsteps * _BR
    row_counts = counts.T.reshape(-1)                   # (S * hr,)
    cs_rows = jnp.cumsum(row_counts)
    total = jnp.minimum(cs_rows[-1], capacity)
    ranks = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    row = jnp.searchsorted(cs_rows, ranks, side="left")
    row = jnp.clip(row, 0, s_layers * hr - 1).astype(jnp.int32)
    base = jnp.where(row > 0, cs_rows[jnp.maximum(row - 1, 0)], 0)
    within = ranks - base                                # 1-based rank in row

    sc = row // hr                                       # 0-based layer
    yy = row % hr                                        # interior row idx

    # Gather candidate-bit rows and search within them.
    rows_u8 = code.reshape(s_layers * hr, w)[row]        # (cap, w)
    cand_rows = (rows_u8 >= _CODE_CAND).astype(jnp.int32)
    cs_in = jnp.cumsum(cand_rows, axis=1)
    xx = jax.vmap(lambda r, k: jnp.searchsorted(r, k, side="left"))(
        cs_in, within)
    xx = jnp.clip(xx, 0, w - 1).astype(jnp.int32)

    live = ranks <= total
    cand = Candidates(
        s=jnp.where(live, sc + 1, 1).astype(jnp.int32),
        y=jnp.where(live, yy + 1, 1).astype(jnp.int32),
        x=jnp.where(live, xx, 1).astype(jnp.int32),
        count=total.astype(jnp.int32))
    # Full-width layout: code[s-1, y-1, x] (see extract.refine_candidates).
    return cand, code
