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

from .extract import (_CODE_CONV, _CODE_SING, _walk_classify, bucket_sizes,
                      Candidates, rank_select)

_CODE_CAND = 128  # candidate bit (u8; walk code occupies [0, 107])

# Perf-triage knob (NOT a product switch): ablate parts of the dense
# kernel to attribute its device time. "" = full kernel;
# "nonewton" = extremum test only (walk code forced to converged);
# "dmaonly" = stream blocks through VMEM and write near-nothing.
# Ablation silently emits degenerate walk codes (wrong keypoints, no
# error) and the XLA tail rows (_tail_rows) are NOT ablated, so the knob
# must never leak into a real run — hence the loud warning.
import os as _os
import sys as _sys
_ABLATE = _os.environ.get("VKSIFT_FRONTEND_ABLATE", "")
if _ABLATE:
    print(
        "#" * 72 + "\n"
        f"# WARNING: VKSIFT_FRONTEND_ABLATE={_ABLATE!r} is set — the dense\n"
        "# frontend kernel will emit DEGENERATE walk codes (triage-only\n"
        "# mode; keypoints will be WRONG). Unset it for any real run.\n"
        + "#" * 72, file=_sys.stderr, flush=True)
# Rows per grid step (env-overridable for hardware A/B: larger blocks
# amortize per-step grid/output-pipeline overhead against VMEM headroom).
_BR = int(_os.environ.get("VKSIFT_FRONTEND_BR", "16"))
_MAX_SINGLE_W = 4096  # beyond this, column-tile (VMEM budget)
# Interior columns per tile when tiled (env-tunable: wider tiles cut the
# per-step DMA row-segment count, the kernel's binding constraint).
_CW = int(_os.environ.get("VKSIFT_FRONTEND_CT", "2048"))


def _make_front_kernel(ns: int, h: int, w_true: int, w: int,
                       dog_threshold: float, cw: int, halo: int,
                       wdma: int = 0):
    """cw = interior columns per tile; halo = extra columns DMA'd on each
    side (0 for the single-tile case, 128 when column-tiled — wide images
    would otherwise blow VMEM with ~30 live (BR, W) intermediates).

    The grid covers only row blocks whose 8-row DMA halo is provably in
    bounds; the caller computes the remaining tail rows in XLA and writes
    them into the outputs with in-place dynamic-update-slices (see
    :func:`_tail_rows`) — the old whole-stack ``jnp.pad`` cost ~0.8 ms per
    frame at 1536x1024."""
    s_layers = ns - 2  # center layers 1..ns-2
    wt = cw + 2 * halo  # tile width

    def kernel(dog_ref, code_ref, counts_ref, blk2, sems):
        # Double-buffered input DMA across (sequential) grid steps: the
        # serial start();wait() formulation stalled every 16-row step on
        # DMA latency — a 5.26 ms "dmaonly" floor at 6912x4608 vs a
        # ~1.3 ms HBM roofline (results/hw_r5a/frontbench_dmaonly.log).
        # Scratch persists across TPU grid steps, so step t kicks off the
        # fetch for t+1 into the other slot before computing on its own.
        if halo:
            step = pl.program_id(0)
            col = pl.program_id(1)
            ncols = pl.num_programs(1)
            t = step * ncols + col  # last grid dim varies fastest
            total = pl.num_programs(0) * ncols
            band0 = col * cw            # this tile's first interior col
            # DMA start, clamped into the UNPADDED stack (the old
            # halo-pad was a whole-stack copy: 2.2 ms at 3456x2304).
            cs = jnp.clip(band0 - halo, 0, wdma - wt)
        else:
            step = pl.program_id(0)
            col = None
            t = step
            total = pl.num_programs(0)
            c0 = 0
        y0 = step * _BR  # first interior row of this block (y = y0 + 1 … )

        def get_dma(slot, tt):
            # Halo block for linear step tt: rows [y0', y0' + _BR + 8).
            if halo:
                c0t = jnp.clip(jax.lax.rem(tt, ncols) * cw - halo,
                               0, wdma - wt)
                y0t = (tt // ncols) * _BR
            else:
                c0t = 0
                y0t = tt * _BR
            return pltpu.make_async_copy(
                dog_ref.at[:, pl.ds(pl.multiple_of(y0t, 8), _BR + 8),
                           pl.ds(pl.multiple_of(c0t, 128), wt)],
                blk2.at[slot], sems.at[slot])

        # Perf A/B knob (read per trace, not baked at import):
        # VKSIFT_FRONTEND_DB=0 reverts to the serial start/wait DMA.
        if _os.environ.get("VKSIFT_FRONTEND_DB", "1") == "0":
            slot = jnp.int32(0)
            get_dma(0, t).start()
            get_dma(0, t).wait()
        else:
            slot = jax.lax.rem(t, 2)

            @pl.when(t == 0)
            def _():
                get_dma(0, t).start()

            @pl.when(t + 1 < total)
            def _():
                get_dma(1 - slot, t + 1).start()

            get_dma(slot, t).wait()

        def body(bref):
            # ONE body instance reading the alternating slot via a
            # dynamic leading index: the static-slot pl.when duplication
            # measured identically on hardware (r5b arm3 vs r5c default
            # — the +13 ms both carried was the in-place-pyramid
            # interaction, not the slot read) while DOUBLING the body's
            # scoped-VMEM live set (BR=32 OOM'd at 25 MB, hw_r5c
            # frontbench_br32).

            # Lane-shifted variants per layer (x-1, x, x+1).
            def lat(l, dy, dx):
                rows = bref[l, pl.ds(dy, _BR), :]     # (BR, wt)
                if dx == 0:
                    return rows
                return pltpu.roll(rows, (-dx) % wt, 1)

            jj = jax.lax.broadcasted_iota(jnp.int32, (_BR, wt), 1)
            ii = jax.lax.broadcasted_iota(jnp.int32, (_BR, wt), 0)
            if halo:
                # Global x of lane jj is cs + jj; the tile's interior
                # band is gx in [band0, band0 + cw).
                gx = cs + jj
                interior_x = ((gx >= 1) & (gx <= w_true - 2)
                              & (gx >= band0) & (gx < band0 + cw))
            else:
                interior_x = (jj >= 1) & (jj <= w_true - 2)
            interior_y = (y0 + 1 + ii) <= h - 2

            # Shift slabs once per (layer, dy, dx): adjacent center
            # layers share 2/3 of their 27-neighborhoods, and Mosaic does
            # not CSE the pltpu.roll chains across the sc loop
            # (ablation-measured).
            slab = {}
            for l in range(ns):
                for b in (0, 1, 2):
                    for dx in (-1, 0, 1):
                        slab[(l, b, dx)] = lat(l, b, dx)

            # Separable 26-neighbor max/min: per-(layer,row) x-triple
            # reductions and per-layer 3x3 reductions are shared across
            # the center layers — ~25% fewer compare ops than the flat
            # 26-term chains, bit-identical results (max/min are exactly
            # associative/commutative).
            rmax, rmin, lmax, lmin = {}, {}, {}, {}
            if _ABLATE not in ("dmaonly",):
                for l in range(ns):
                    for b in (0, 1, 2):
                        rmax[(l, b)] = jnp.maximum(
                            jnp.maximum(slab[(l, b, -1)], slab[(l, b, 0)]),
                            slab[(l, b, 1)])
                        rmin[(l, b)] = jnp.minimum(
                            jnp.minimum(slab[(l, b, -1)], slab[(l, b, 0)]),
                            slab[(l, b, 1)])
                    lmax[l] = jnp.maximum(jnp.maximum(rmax[(l, 0)],
                                                      rmax[(l, 1)]),
                                          rmax[(l, 2)])
                    lmin[l] = jnp.minimum(jnp.minimum(rmin[(l, 0)],
                                                      rmin[(l, 1)]),
                                          rmin[(l, 2)])

            codes = []
            counts = []
            for sc in range(1, s_layers + 1):
                nb = {}
                for a in (0, 1, 2):
                    for b in (0, 1, 2):
                        for c in (0, 1, 2):
                            nb[(a, b, c)] = slab[(sc - 1 + a, b, c - 1)]
                ctr = nb[(1, 1, 1)]
                if _ABLATE == "dmaonly":
                    cand = ((jnp.abs(ctr) > dog_threshold * 0.8)
                            & interior_x & interior_y)
                else:
                    # center layer without the center cell: full rows
                    # above/below + the x-pair on the center row.
                    cmax = jnp.maximum(
                        jnp.maximum(rmax[(sc, 0)], rmax[(sc, 2)]),
                        jnp.maximum(slab[(sc, 1, -1)], slab[(sc, 1, 1)]))
                    cmin = jnp.minimum(
                        jnp.minimum(rmin[(sc, 0)], rmin[(sc, 2)]),
                        jnp.minimum(slab[(sc, 1, -1)], slab[(sc, 1, 1)]))
                    mx = jnp.maximum(
                        jnp.maximum(lmax[sc - 1], lmax[sc + 1]), cmax)
                    mn = jnp.minimum(
                        jnp.minimum(lmin[sc - 1], lmin[sc + 1]), cmin)
                    cand = ((jnp.abs(ctr) > dog_threshold * 0.8)
                            & ((ctr > mx) | (ctr < mn))
                            & interior_x & interior_y)

                if _ABLATE in ("nonewton", "dmaonly"):
                    # Triage arms: walk code degenerates to "converged
                    # here".
                    code = (_CODE_CONV + 13
                            + _CODE_CAND * cand.astype(jnp.int32))
                else:
                    # Division-free walk classification (Cramer
                    # numerators vs 0.6*|det| — see extract._walk_classify)
                    cs_c, cx_c, cy_c, conv, singular = _walk_classify(
                        *[nb[(a, b, c)] for a in (0, 1, 2)
                          for b in (0, 1, 2) for c in (0, 1, 2)])
                    code = (cs_c + 3 * cx_c + 9 * cy_c
                            + _CODE_CONV * conv.astype(jnp.int32)
                            + _CODE_SING * singular.astype(jnp.int32)
                            + _CODE_CAND * cand.astype(jnp.int32))
                if halo:
                    # Tile interior starts at lane band0 - cs (0, 128 or
                    # 256 at the clamped edges): traced roll + static
                    # slice (Mosaic has no dynamic_slice on values). The
                    # candidate bit rides the rolled code (walk+flag
                    # codes max out at 107 < _CODE_CAND) — bool-vector
                    # rolls are Mosaic-hostile.
                    off = jnp.mod(-(band0 - cs), wt)
                    code = pltpu.roll(code, off, 1)[:, :cw]
                    cand = code >= _CODE_CAND
                cw_eff = cw if halo else w
                codes.append(code.astype(jnp.uint8).reshape(1, _BR, cw_eff))
                # Per-128-lane-block candidate counts via one tiny MXU
                # matmul (cand @ block-membership one-hot): they turn the
                # global rank-select into a 3-level search whose big
                # gather is one 128-lane block per candidate instead of a
                # full image row.
                nblk = cw_eff // 128
                bi = jax.lax.broadcasted_iota(jnp.int32, (cw_eff, nblk), 0)
                bj = jax.lax.broadcasted_iota(jnp.int32, (cw_eff, nblk), 1)
                bm = (bi // 128 == bj).astype(jnp.bfloat16)
                cb = jax.lax.dot_general(
                    cand.astype(jnp.bfloat16), bm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (BR, nblk)
                counts.append(cb.astype(jnp.int32).reshape(_BR, 1, nblk))

            code_ref[:] = jnp.concatenate(codes, axis=0)   # (S, BR, cw|w)
            cb_all = jnp.concatenate(counts, axis=1)       # (BR, S, nblk)
            if halo:
                # Mosaic requires the output block's lane dim be
                # 128-divisible (or the full array dim): pad the per-tile
                # block counts to a 128-lane block; the caller slices the
                # real nblk back out.
                cb_all = jnp.pad(
                    cb_all, ((0, 0), (0, 0), (0, 128 - cb_all.shape[2])))
            counts_ref[:] = cb_all

        body(blk2.at[slot])

    return kernel


def _tail_rows(d, ts: int, h: int, w_true: int, wp: int,
               dog_threshold: float):
    """Code + per-block candidate counts for interior rows y in
    [ts+1, h-2], computed in XLA (the row-block tail the kernel grid does
    not cover — a few dozen rows, so the dense Newton here is ~free).

    ``d`` is the unpadded (S+2, H, W_true) DoG stack; outputs are
    full-width ``wp`` like the kernel's: code u8 (S, rows_t, wp) and
    counts i32 (rows_t, S, wp // 128), row r <-> image row y = ts+1+r
    (the kernel's global row y-1 indexing). Semantics must match the
    kernel exactly: same walk code (shared _walk_classify path via
    _dense_walk_code) and same strict 26-neighbor extremum test with the
    0.8*threshold pre-filter (ExtractKeypoints.comp:57-116)."""
    from .extract import _dense_walk_code
    ns, _, w = d.shape
    rows_t = h - 2 - ts
    dsl = jax.lax.slice_in_dim(d, ts, h, axis=1)     # rows ts .. h-1
    code_i = _dense_walk_code(dsl)                    # (S, rows_t, w-2) i8

    def sl(dz, dy, dx):
        return jax.lax.dynamic_slice(
            dsl, (1 + dz, 1 + dy, 1 + dx), (ns - 2, rows_t, w - 2))

    ctr = sl(0, 0, 0)
    mx = None
    mn = None
    for a in (-1, 0, 1):
        for b in (-1, 0, 1):
            for c in (-1, 0, 1):
                if a == b == c == 0:
                    continue
                v = sl(a, b, c)
                mx = v if mx is None else jnp.maximum(mx, v)
                mn = v if mn is None else jnp.minimum(mn, v)
    xg = 1 + jax.lax.broadcasted_iota(jnp.int32, ctr.shape, 2)
    cand = ((jnp.abs(ctr) > dog_threshold * 0.8)
            & ((ctr > mx) | (ctr < mn)) & (xg <= w_true - 2))
    code_u = code_i.astype(jnp.uint8) + _CODE_CAND * cand.astype(jnp.uint8)
    code_t = jnp.pad(code_u, ((0, 0), (0, 0), (1, wp - w + 1)))
    cand_w = jnp.pad(cand.astype(jnp.int32), ((0, 0), (0, 0),
                                              (1, wp - w + 1)))
    counts_t = cand_w.reshape(ns - 2, rows_t, wp // 128, 128).sum(-1)
    return code_t, counts_t.transpose(1, 0, 2)


@functools.partial(jax.jit, static_argnames=(
    "dog_threshold", "capacity", "max_single_w", "col_tile"))
def frontend_tpu(dog: jax.Array, *, dog_threshold: float, capacity: int,
                 max_single_w: int = _MAX_SINGLE_W,
                 col_tile: int = _CW) -> Tuple[Candidates, jax.Array]:
    """Pallas dense frontend for one octave.

    Args:
      dog: (S+2, H, W) DoG stack, H a multiple of 8 preferred (padded
        internally), W a multiple of 128 (caller pads; pyramid widths are).
      max_single_w/col_tile: column-tiling thresholds (overridable for
        tests; defaults sized for the v5e VMEM budget).

    Returns (Candidates at ``capacity`` in raster order, code field
    u8 (S, HR, WP) addressed as code[s-1, y-1, x], lanes padded to 128).
    """
    d = dog.astype(jnp.float32)
    ns, h, w_true = d.shape
    w = -(-w_true // 128) * 128  # pad lanes (zeros can't pass the threshold)
    s_layers = ns - 2
    # Interior rows are 1..h-2; blocks start at multiples of _BR.
    nsteps = -(-(h - 2) // _BR)
    hr = nsteps * _BR
    # Row blocks whose 8-row DMA halo is provably in bounds; the remaining
    # interior rows (<= ~40) are the XLA tail (_tail_rows) — replacing the
    # whole-stack jnp.pad (126 MB/frame at 1536x1024, ~0.8 ms with its
    # layout-copy companion in the round-4 trace).
    fs = min(nsteps, max(0, (h - 8) // _BR))
    d_orig = d
    lane_tile = None  # column-tiled path: real blocks per 128-lane tile

    if w <= max_single_w:
        # Single column tile: whole rows stream through VMEM.
        if fs == 0:
            # Tiny images (< 2 row blocks): keep the old all-Pallas pad
            # path — the pad is a few KB here.
            d = jnp.pad(d, ((0, 0), (0, hr + 8 - h), (0, w - w_true)))
            fs = nsteps
        elif w > w_true:
            d = jnp.pad(d, ((0, 0), (0, 0), (0, w - w_true)))
        kernel = _make_front_kernel(ns, h, w_true, w, dog_threshold,
                                    cw=w, halo=0)
        nblk = w // 128
        code, counts = pl.pallas_call(
            kernel,
            grid=(fs,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                pl.BlockSpec((s_layers, _BR, w), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BR, s_layers, nblk), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((s_layers, hr, w), jnp.uint8),
                jax.ShapeDtypeStruct((hr, s_layers, nblk), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, ns, _BR + 8, w), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(d)
        if fs < nsteps:
            ts = fs * _BR
            code_t, counts_t = _tail_rows(d_orig, ts, h, w_true, w,
                                          dog_threshold)
            rows_t = code_t.shape[1]
            # Zero out count rows past the interior (kernel rows beyond
            # the tail stay unwritten garbage; code rows there are never
            # read — compaction only visits rows with nonzero counts).
            counts_t = jnp.pad(
                counts_t, ((0, hr - ts - rows_t), (0, 0), (0, 0)))
            code = jax.lax.dynamic_update_slice(code, code_t, (0, ts, 0))
            counts = jax.lax.dynamic_update_slice(counts, counts_t,
                                                  (ts, 0, 0))
    else:
        # Column-tiled: wider images (e.g. octave 0 of Hannover 3456x2304
        # upsampled = 6912 px) would hold ~30 live (BR, W) intermediates
        # in VMEM. Tiles of ~_CW interior columns with a 128-column halo
        # on each side; per-row counts accumulate across column tiles.
        # The tile width snaps to the 128-multiple in [0.75x, 1.5x] of
        # col_tile that minimizes ncols*cw - w_true: at 6912 the default
        # 2048 gives 4x2048 = 8192 (1280 wasted lanes of kernel work and
        # a 2.2 ms/frame pad, round-5 trace) while 3x2304 = 6912 is
        # exact.
        halo = 128
        wdma = -(-w_true // 128) * 128
        lo = max(128, (col_tile * 3 // 4) // 128 * 128)
        best = None
        for cand_cw in range(lo, max(col_tile * 3 // 2, lo) + 1, 128):
            nc = -(-w_true // cand_cw)
            waste = nc * cand_cw - w_true
            key = (waste, nc)
            if best is None or key < best[0]:
                best = (key, cand_cw)
        cw = best[1]
        ncols = -(-w_true // cw)
        wp = ncols * cw
        if fs == 0:
            d = jnp.pad(d, ((0, 0), (0, hr + 8 - h), (0, wdma - w_true)))
            fs = nsteps
        elif wdma > w_true:
            d = jnp.pad(d, ((0, 0), (0, 0), (0, wdma - w_true)))
        kernel = _make_front_kernel(ns, h, w_true, wp, dog_threshold,
                                    cw=cw, halo=halo, wdma=wdma)
        cblk = cw // 128
        code, counts_p = pl.pallas_call(
            kernel,
            grid=(fs, ncols),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                pl.BlockSpec((s_layers, _BR, cw), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BR, s_layers, 128), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((s_layers, hr, wp), jnp.uint8),
                jax.ShapeDtypeStruct((hr, s_layers, ncols * 128),
                                     jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, ns, _BR + 8, cw + 2 * halo), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(d)
        # The per-tile block counts stay in the kernel's 128-lane-padded
        # (hr, S, ncols*128) layout — stripping the padding with a
        # reshape+slice relayouted 21 MB and cost 1.9 ms/frame at
        # 3456x2304 (round-5 trace, reshape.62). The pad lanes are zero,
        # so the row sums and block cumsums below are unchanged; only the
        # final block index needs the padded->real remap (lane_tile).
        counts = counts_p
        lane_tile = cblk
        if fs < nsteps:
            ts = fs * _BR
            # The tail works on the unpadded stack; re-tile its real
            # blocks into the kernel's padded layout.
            wt128 = -(-w_true // 128) * 128
            code_t, counts_t = _tail_rows(d_orig, ts, h, w_true, wt128,
                                          dog_threshold)
            rows_t = code_t.shape[1]
            code_t = jnp.pad(code_t, ((0, 0), (0, 0),
                                      (0, wp - wt128)))
            counts_t = jnp.pad(
                counts_t, ((0, 0), (0, 0),
                           (0, ncols * cblk - wt128 // 128)))
            counts_t = jnp.pad(
                counts_t.reshape(rows_t, s_layers, ncols, cblk),
                ((0, hr - ts - rows_t), (0, 0), (0, 0), (0, 128 - cblk))
            ).reshape(hr - ts, s_layers, ncols * 128)
            code = jax.lax.dynamic_update_slice(code, code_t, (0, ts, 0))
            counts = jax.lax.dynamic_update_slice(counts, counts_t,
                                                  (ts, 0, 0))
        w = wp

    # Three-level rank select: rank -> (layer, row) via a tiny row-total
    # cumsum; row rank -> 128-lane block via the kernel's per-block counts;
    # block rank -> lane via one 128-byte code-block gather per candidate.
    # (The previous two-level scheme gathered FULL image rows per candidate
    # and cumsummed (capacity, W) — ~50M cells at octave 0, ~10 ms.)
    hr = nsteps * _BR
    nblk = w // 128
    row_tot = counts.sum(axis=2)                        # (hr, S)
    row_counts = row_tot.T.reshape(-1)                  # (S * hr,)
    cs_rows = jnp.cumsum(row_counts)
    total = jnp.minimum(cs_rows[-1], capacity)
    code_blocks = code.reshape(s_layers * hr, nblk, 128)

    def compact_at(kb):
        """Rank->(layer,row,lane) search for the first ``kb`` ranks, padded
        back to ``capacity``. Bucketed by the LIVE candidate count: every
        op below is rank-proportional (dense compare+reduce rows, block
        gathers), so running at the bucket size instead of the per-octave
        section capacity scales this glue with actual candidates."""

        def run():
            ranks = jnp.arange(1, kb + 1, dtype=jnp.int32)
            # searchsorted(a, v, "left") == count(a < v): a dense
            # compare+reduce beats the binary-search while loop for these
            # table sizes (the walk tables are ~12k rows / 24 blocks /
            # 128 lanes; the while op costs ~1 ms per level on v5e).
            row = jnp.sum(cs_rows[None, :] < ranks[:, None], axis=1,
                          dtype=jnp.int32)
            row = jnp.clip(row, 0, s_layers * hr - 1)
            base = jnp.where(row > 0, cs_rows[jnp.maximum(row - 1, 0)], 0)
            within = ranks - base                        # 1-based in row

            sc = row // hr                               # 0-based layer
            yy = row % hr                                # interior row idx

            # Row rank -> lane block (2-D indexing: no transpose
            # materialization). ``counts`` may be in the column-tiled
            # kernel's 128-lane-padded layout (zero pad lanes -> cumsum
            # plateaus, so the strict-less search still lands on the
            # real block; only the final index needs the remap below).
            cb = counts[yy, sc]                      # (kb, nblk | nc*128)
            cs_b = jnp.cumsum(cb, axis=1)
            blk = jnp.sum(cs_b < within[:, None], axis=1, dtype=jnp.int32)
            blk = jnp.clip(blk, 0, counts.shape[2] - 1)
            base_b = jnp.where(
                blk > 0,
                jnp.take_along_axis(cs_b, jnp.maximum(blk - 1, 0)[:, None],
                                    axis=1)[:, 0], 0)
            within_b = within - base_b
            if lane_tile is not None:
                # Padded block index (tile*128 + b) -> real (tile*cblk+b).
                blk = (blk // 128) * lane_tile + jax.lax.rem(blk, 128)
            blk = jnp.clip(blk, 0, nblk - 1)

            # Block rank -> lane.
            blk128 = code_blocks[row, blk]               # (kb, 128)
            cand_rows = (blk128 >= _CODE_CAND).astype(jnp.int32)
            cs_in = jnp.cumsum(cand_rows, axis=1)
            xin = jnp.sum(cs_in < within_b[:, None], axis=1,
                          dtype=jnp.int32)
            xinc = jnp.clip(xin, 0, 127)
            xx = blk * 128 + xinc
            xx = jnp.clip(xx, 0, w - 1)
            # The candidate's own walk code comes free from the block in
            # hand — saves the refinement walk's step-0 gather.
            c0 = jnp.take_along_axis(
                blk128, xinc[:, None], axis=1)[:, 0].astype(jnp.int32)
            c0 = jax.lax.rem(c0, _CODE_CAND)
            pad = (0, capacity - kb)
            return (jnp.pad(sc, pad), jnp.pad(yy, pad), jnp.pad(xx, pad),
                    jnp.pad(c0, pad))
        return run

    sizes = bucket_sizes(capacity, lo=2048)
    if len(sizes) == 1:
        sc, yy, xx, c0 = compact_at(capacity)()
    else:
        bi = sum((total > s).astype(jnp.int32) for s in sizes[:-1])
        sc, yy, xx, c0 = jax.lax.switch(bi, [compact_at(s) for s in sizes])

    live = jnp.arange(capacity) < total
    cand = Candidates(
        s=jnp.where(live, sc + 1, 1).astype(jnp.int32),
        y=jnp.where(live, yy + 1, 1).astype(jnp.int32),
        x=jnp.where(live, xx, 1).astype(jnp.int32),
        count=total.astype(jnp.int32),
        code0=jnp.where(live, c0, 0).astype(jnp.int32))
    # Full-width layout: code[s-1, y-1, x] (see extract.refine_candidates).
    return cand, code
