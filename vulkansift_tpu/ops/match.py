"""Brute-force 2-nearest-neighbor descriptor matching (MXU-tiled).

Replaces the reference's Get2NearestNeighbors shader (reference:
src/vulkansift/shaders/Get2NearestNeighbors.comp) — one thread per A-feature
serially scanning ALL of B (an O(N_A * N_B * 128) scalar loop) — with the
TPU-native formulation: the u8 descriptor L2 distances are

    d2(a, b) = |a|^2 + |b|^2 - 2 a.b

so each B-tile step is one (N_A x 128) @ (128 x T) matmul on the MXU plus a
vectorized top-2 merge, streamed over B tiles with a ``lax.scan`` so the
N_A x N_B distance matrix is never materialized.

Exactness: descriptors are integers in [0, 255]; products <= 255^2 and
row sums <= 128*255^2 = 8,323,200 < 2^24, so bfloat16 inputs (exact for
integers < 256) with float32 accumulation reproduce the reference's integer
distance arithmetic bit-exactly; the output is sqrt(d2) as float32, matching
Get2NearestNeighbors.comp:43-53.

Tie-breaking parity: the reference keeps the earliest B index on equal
distances (strict ``<`` updates, Get2NearestNeighbors.comp:85-95); the tile
argmin picks the first occurrence and merges preserve earlier tiles, so
indices agree.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..types import Matches2NN

# Plain Python float, NOT jnp.float32(...): a module-level device
# constant would initialize the JAX backend at import time, which
# breaks jax.distributed.initialize (must run before backend init).
_INF = float("inf")


def _top2_of_tile(d2: jax.Array, col_offset: jax.Array
                  ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-row (best, best_idx, second, second_idx) of a (N, T) tile."""
    i1 = jnp.argmin(d2, axis=1)
    d1 = jnp.take_along_axis(d2, i1[:, None], axis=1)[:, 0]
    # Dense compare instead of a row scatter: the scatter is per-element
    # latency-bound AND forces d2 to materialize; the compare fuses into
    # the second argmin's input.
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    masked = jnp.where(cols == i1[:, None].astype(jnp.int32), _INF, d2)
    i2 = jnp.argmin(masked, axis=1)
    d2nd = jnp.take_along_axis(masked, i2[:, None], axis=1)[:, 0]
    return (d1, i1.astype(jnp.int32) + col_offset,
            d2nd, i2.astype(jnp.int32) + col_offset)


def _lex_lt(da, ia, db, ib):
    """(distance, index) lexicographic less-than."""
    return (da < db) | ((da == db) & (ia < ib))


def _merge_top2(r, t):
    """Merge two per-row top-2 streams with (distance, index) lexicographic
    ordering. Smallest-index-wins tie-breaking matches the reference's
    earliest-index serial scan (strict ``<`` updates,
    Get2NearestNeighbors.comp:85-95) and — unlike order-dependent
    tie-breaking — is associative/commutative, so the same merge serves the
    sequential tile scan and the multi-chip ``ppermute`` ring
    (:mod:`vulkansift_tpu.parallel.ring_match`), where B shards arrive out
    of global column order.

    Within each stream (d1, i1) <= (d2, i2) lexicographically (tile top-2
    picks the earliest index first), so this is a merge of two sorted pairs:
    best = min(r1, t1); second = min(loser-of-best-contest, winner's own
    second) — the loser stream's second can never place.
    """
    rd1, ri1, rd2, ri2 = r
    td1, ti1, td2, ti2 = t
    take_t1 = _lex_lt(td1, ti1, rd1, ri1)
    nd1 = jnp.where(take_t1, td1, rd1)
    ni1 = jnp.where(take_t1, ti1, ri1)
    loser_d = jnp.where(take_t1, rd1, td1)
    loser_i = jnp.where(take_t1, ri1, ti1)
    win2_d = jnp.where(take_t1, td2, rd2)
    win2_i = jnp.where(take_t1, ti2, ri2)
    take_loser = _lex_lt(loser_d, loser_i, win2_d, win2_i)
    nd2 = jnp.where(take_loser, loser_d, win2_d)
    ni2 = jnp.where(take_loser, loser_i, win2_i)
    return nd1, ni1, nd2, ni2


@functools.partial(jax.jit, static_argnames=("tile",))
def match_2nn(desc_a: jax.Array, count_a: jax.Array, desc_b: jax.Array,
              count_b: jax.Array, *, tile: int = 2048) -> Matches2NN:
    """2-NN of every valid A descriptor among valid B descriptors.

    Args:
      desc_a: u8 (NA, 128), valid rows first (packed).
      count_a: i32 number of valid A rows.
      desc_b: u8 (NB, 128), packed likewise.
      count_b: i32 number of valid B rows.
      tile: static B-tile width for the scan.

    Returns a Matches2NN with capacity NA and ``count = count_a``; rows at
    index >= count_a are meaningless. Invalid B columns are masked to +inf
    so they can never win (the reference assumes count_b >= 2,
    sift_matcher.c:408-486; with fewer the extra slots stay at +inf).
    """
    na, d = desc_a.shape
    nb = desc_b.shape[0]
    pad_b = (-nb) % tile
    if pad_b:
        desc_b = jnp.concatenate(
            [desc_b, jnp.zeros((pad_b, d), desc_b.dtype)], axis=0)
    nb_padded = nb + pad_b
    steps = nb_padded // tile

    a16 = desc_a.astype(jnp.bfloat16)
    b16 = desc_b.astype(jnp.bfloat16)
    a_sq = jnp.sum(jnp.square(desc_a.astype(jnp.float32)), axis=1)  # (NA,)
    b_sq = jnp.sum(jnp.square(desc_b.astype(jnp.float32)), axis=1)  # (NBp,)

    b_tiles = b16.reshape(steps, tile, d)
    bsq_tiles = b_sq.reshape(steps, tile)

    def step(carry, inp):
        b_t, bsq_t, offset = inp
        dots = jax.lax.dot_general(
            a16, b_t.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (NA, T)
        d2 = a_sq[:, None] + bsq_t[None, :] - 2.0 * dots
        col = offset + jnp.arange(tile)[None, :]
        d2 = jnp.where(col < count_b, d2, _INF)
        t = _top2_of_tile(d2, offset)
        return _merge_top2(carry, t), None

    init = (jnp.full((na,), _INF), jnp.zeros((na,), jnp.int32),
            jnp.full((na,), _INF), jnp.zeros((na,), jnp.int32))
    offsets = jnp.arange(steps, dtype=jnp.int32) * tile
    (d1, i1, d2_, i2), _ = jax.lax.scan(
        step, init, (b_tiles, bsq_tiles, offsets))

    # Distances can be -0.0-ish from cancellation only if exact 0; the math
    # above is exact integer arithmetic in f32, so clamping is just safety.
    d1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    d2_ = jnp.sqrt(jnp.maximum(d2_, 0.0))
    return Matches2NN(
        idx_a=jnp.arange(na, dtype=jnp.int32),
        idx_b1=i1, idx_b2=i2,
        dist_a_b1=d1, dist_a_b2=d2_,
        count=count_a.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("tile", "min_bucket"))
def match_2nn_auto(desc_a: jax.Array, count_a: jax.Array,
                   desc_b: jax.Array, count_b: jax.Array, *,
                   tile: int = 2048,
                   min_bucket: int = 2048) -> Matches2NN:
    """2-NN matching whose device work scales with the LIVE counts.

    ``match_2nn`` computes over the full static capacities, so callers had
    to host-sync the counts and slice before dispatch (one ~26 ms tunnel
    round-trip each on this environment). This variant keeps everything on
    device — the analogue of the reference reading counters from *mapped*
    memory at ~zero cost before recording the dispatch
    (sift_matcher.c:408-414, dispatch ceil(nb_A/64) workgroups):

    * A rows: a ``lax.switch`` over power-of-two size buckets — every
      bucket's matmul is compiled once, the branch matching ``count_a``
      executes, so compute scales with the bucketed live count.
    * B columns: a ``lax.while_loop`` over tiles with a data-dependent
      trip count ``ceil(count_b / tile)``.

    Results are bit-identical to ``match_2nn`` for rows < count_a (same
    tile order, same associative lexicographic merge).
    """
    na, d = desc_a.shape
    nb = desc_b.shape[0]
    with jax.named_scope("Matching"):
        pad_b = (-nb) % tile
        if pad_b:
            desc_b = jnp.concatenate(
                [desc_b, jnp.zeros((pad_b, d), desc_b.dtype)], axis=0)
        b16 = desc_b.astype(jnp.bfloat16)
        b_sq = jnp.sum(jnp.square(desc_b.astype(jnp.float32)), axis=1)
        a16_full = desc_a.astype(jnp.bfloat16)
        asq_full = jnp.sum(jnp.square(desc_a.astype(jnp.float32)), axis=1)
        nsteps_live = jax.lax.div(count_b + (tile - 1), tile)

        def match_k(k: int):
            def run():
                a16 = jax.lax.dynamic_slice(a16_full, (0, 0), (k, d))
                a_sq = jax.lax.dynamic_slice(asq_full, (0,), (k,))

                def cond(state):
                    return state[0] < nsteps_live

                def body(state):
                    step, carry = state
                    offset = step * tile
                    b_t = jax.lax.dynamic_slice(
                        b16, (offset, 0), (tile, d))
                    bsq_t = jax.lax.dynamic_slice(b_sq, (offset,), (tile,))
                    dots = jax.lax.dot_general(
                        a16, b_t.T, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    d2 = a_sq[:, None] + bsq_t[None, :] - 2.0 * dots
                    col = offset + jnp.arange(tile)[None, :]
                    d2 = jnp.where(col < count_b, d2, _INF)
                    t = _top2_of_tile(d2, offset)
                    return step + 1, _merge_top2(carry, t)

                init = (jnp.full((k,), _INF), jnp.zeros((k,), jnp.int32),
                        jnp.full((k,), _INF), jnp.zeros((k,), jnp.int32))
                _, (d1, i1, d2_, i2) = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), init))
                pad = na - k
                return tuple(jnp.pad(x, (0, pad)) for x in (d1, i1, d2_, i2))
            return run

        ks = []
        k = min(min_bucket, na)
        while k < na:
            ks.append(k)
            k *= 2
        ks.append(na)
        # Branch index: smallest bucket >= count_a.
        idx = jnp.sum(jnp.asarray(
            [count_a > kk for kk in ks[:-1]], jnp.int32)) \
            if len(ks) > 1 else jnp.int32(0)
        d1, i1, d2_, i2 = jax.lax.switch(idx, [match_k(kk) for kk in ks])

        d1 = jnp.sqrt(jnp.maximum(d1, 0.0))
        d2_ = jnp.sqrt(jnp.maximum(d2_, 0.0))
        return Matches2NN(
            idx_a=jnp.arange(na, dtype=jnp.int32),
            idx_b1=i1, idx_b2=i2,
            dist_a_b1=d1, dist_a_b2=d2_,
            count=count_a.astype(jnp.int32),
        )


def lowe_ratio_mask(m: Matches2NN, ratio: float = 0.75) -> jax.Array:
    """Lowe ratio-test mask (harness parity: src/perf/perf_matching.cpp:5,
    test_sift_match.cpp:90-107): keep matches with d1 < ratio * d2."""
    valid = jnp.arange(m.idx_a.shape[0]) < m.count
    return valid & (m.dist_a_b1 < ratio * m.dist_a_b2)


def cross_check_mask(m_ab: Matches2NN, m_ba: Matches2NN) -> jax.Array:
    """Mutual-nearest-neighbor mask: A->B best maps back B->A best."""
    back = m_ba.idx_b1[m_ab.idx_b1]
    valid = jnp.arange(m_ab.idx_a.shape[0]) < m_ab.count
    return valid & (back == m_ab.idx_a)
