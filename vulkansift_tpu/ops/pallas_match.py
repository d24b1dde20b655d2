"""Fused 2-NN matching kernel (Pallas): MXU distance tiles + packed-key
top-2, entirely on-chip.

The XLA formulation (:mod:`.match`) streams B tiles with a ``lax.scan``;
each step's (NA, T) distance tile and uint32 key tile materialize between
the matmul and the min-reductions, and the scan serializes against their
HBM round-trips — measured 4.4 ms at 16k x 16k on v5e where the dot
FLOPs alone are ~0.35 ms. This kernel keeps one (TA, TB) tile in VMEM
through matmul -> key -> two min-reductions -> carry merge, so the only
HBM traffic is the descriptor tiles themselves.

Exactness: u8-descriptor squared distances are integers
d2 <= 128*255^2 = 8,323,200 < 2^23, and every intermediate of

    S = 512*asq + (512*bsq - 1024*dots)

is a 512-multiple of an integer with magnitude < 2^24, hence f32-exact;
``key = S | col`` packs (distance, column) so one ``min`` reproduces the
reference's serial-scan semantics (smallest distance, earliest column on
ties — Get2NearestNeighbors.comp:85-95). Keys span [0, 2^32), which
neither fits int32 nor casts from f32 on Mosaic (f32->u32 is
unsupported), so the kernel stores BIASED keys ``key - 2^31`` as int32:
the bias is an order isomorphism (signed compare of biased == unsigned
compare of raw), biased values are exact 512-multiples of magnitude
<= 2^31 (f32-exact, i32-exact), and decode is an arithmetic shift plus
``+ 2^22``. Cross-tile merges use the associative (distance, index)
lexicographic merge of the XLA path; results are bit-identical to
``match_2nn`` (asserted in tests/test_match.py).

Column masking: invalid B columns (>= count_b, or pad rows) get
``bsq512 = 512 * 3*2^23``; since 2*dots <= asq + bsq_true (d2 >= 0),
their scaled distance stays >= 512*(3*2^23 - 2^23) > the clamp, so after
the float-side clamp at (2^23-1)*512 they can never beat a valid column
and decode back to "no neighbor" (d2 == 2^23 - 1 -> +inf).

Live-count scaling: tile steps wholly past ``count_a``/``count_b`` skip
the matmul/merge body (the analogue of the reference's
``ceil(nb_A/64)``-workgroup dispatch, sift_matcher.c:266); outputs for
dead rows are the scratch init markers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB_BITS = 9
_TB = 1 << _TB_BITS                  # 512 B columns per grid step
_TA = 1024                           # A rows per grid step
_D2_INVALID = (1 << 23) - 1          # decoded marker for "no neighbor"
_KEY_CLAMP_F = float(_D2_INVALID) * 512.0
_INVALID_BSQ = 512.0 * float(3 << 23)
_KEY_BIAS_F = float(1 << 31)         # biased-int32 key encoding (module doc)
_KEY_MAX = jnp.iinfo(jnp.int32).max  # biased encoding of the raw all-ones key
_D2_HALF = 1 << 22                   # decode: d2 = (key >> 9) + 2^22


def _make_kernel_t(nj: int):
    """Transposed-tile kernel: distances computed as (TB, TA) so every
    per-A-row quantity (top-2 carries, merge chain, outputs) is a
    lane-major (1, TA) row. The row-major variant kept them as (TA, 1)
    columns — sublane-major vectors that use 1 of 128 lanes per VPU op,
    which made the ~20-op carry merge cost ~2560 vregs/step instead of
    ~160 (measured 3.23 ms at 16k x 16k; this layout's bulk tile work is
    identical, only the reduction/merge layout changes)."""
    def kernel(cnt_ref, a_ref, asq_ref, b_ref, bsq_ref,
               od1_ref, oi1_ref, od2_ref, oi2_ref,
               sk1, sc1, sk2, sc2):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            sk1[:] = jnp.full_like(sk1, _KEY_MAX)
            sc1[:] = jnp.zeros_like(sc1)
            sk2[:] = jnp.full_like(sk2, _KEY_MAX)
            sc2[:] = jnp.zeros_like(sc2)

        count_a = cnt_ref[0]
        count_b = cnt_ref[1]

        @pl.when((i * _TA < count_a) & (j * _TB < count_b))
        def _():
            dots = jax.lax.dot_general(
                b_ref[:], a_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (TB, TA)
            # asq arrives pre-biased (asq*512 - 2^31, f32-exact); the
            # clamp bound is the biased encoding of the raw clamp.
            s = bsq_ref[:] + (asq_ref[:] - 1024.0 * dots)
            sb = jnp.minimum(s, _KEY_CLAMP_F - _KEY_BIAS_F)
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            key = sb.astype(jnp.int32) + rows
            k1 = jnp.min(key, axis=0, keepdims=True)     # (1, TA)
            key2 = jnp.where(key == k1, _KEY_MAX, key)
            k2 = jnp.min(key2, axis=0, keepdims=True)

            col0 = j * _TB

            def gcol(k):
                return (k & (_TB - 1)) + col0

            td1, ti1 = k1 >> _TB_BITS, gcol(k1)
            td2, ti2 = k2 >> _TB_BITS, gcol(k2)
            rd1, ri1 = sk1[:] >> _TB_BITS, sc1[:]
            rd2, ri2 = sk2[:] >> _TB_BITS, sc2[:]

            def lt(da, ia, db, ib):
                return (da < db) | ((da == db) & (ia < ib))

            take1 = lt(td1, ti1, rd1, ri1)
            nd1 = jnp.where(take1, td1, rd1)
            ni1 = jnp.where(take1, ti1, ri1)
            lose_d = jnp.where(take1, rd1, td1)
            lose_i = jnp.where(take1, ri1, ti1)
            win2_d = jnp.where(take1, td2, rd2)
            win2_i = jnp.where(take1, ti2, ri2)
            takeL = lt(lose_d, lose_i, win2_d, win2_i)
            nd2 = jnp.where(takeL, lose_d, win2_d)
            ni2 = jnp.where(takeL, lose_i, win2_i)

            sk1[:] = nd1 << _TB_BITS
            sc1[:] = ni1
            sk2[:] = nd2 << _TB_BITS
            sc2[:] = ni2

        @pl.when(j == nj - 1)
        def _():
            # Output blocks are (1, 8, TA) — a (1, TA) block would break
            # the 8-sublane minimum when ni > 1 — so broadcast the row
            # into all 8 sublanes; the host reads sublane 0.
            shp = od1_ref.shape

            def bc(v):
                return jnp.broadcast_to(v.reshape(1, 1, -1), shp)

            od1_ref[:] = bc((sk1[:] >> _TB_BITS) + _D2_HALF)
            oi1_ref[:] = bc(sc1[:])
            od2_ref[:] = bc((sk2[:] >> _TB_BITS) + _D2_HALF)
            oi2_ref[:] = bc(sc2[:])

    return kernel


def _make_kernel(nj: int):
    def kernel(cnt_ref, a_ref, asq_ref, b_ref, bsq_ref,
               od1_ref, oi1_ref, od2_ref, oi2_ref,
               sk1, sc1, sk2, sc2):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            sk1[:] = jnp.full_like(sk1, _KEY_MAX)
            sc1[:] = jnp.zeros_like(sc1)
            sk2[:] = jnp.full_like(sk2, _KEY_MAX)
            sc2[:] = jnp.zeros_like(sc2)

        count_a = cnt_ref[0]
        count_b = cnt_ref[1]

        @pl.when((i * _TA < count_a) & (j * _TB < count_b))
        def _():
            dots = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (TA, TB)
            s = asq_ref[:] + (bsq_ref[:] - 1024.0 * dots)
            # Biased-int32 keys (module doc): clamp, shift down by 2^31,
            # cast (exact: 512-multiples, |.| <= 2^31), add the column.
            sb = jnp.minimum(s, _KEY_CLAMP_F) - _KEY_BIAS_F
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            key = sb.astype(jnp.int32) + cols
            k1 = jnp.min(key, axis=1, keepdims=True)     # (TA, 1)
            key2 = jnp.where(key == k1, _KEY_MAX, key)
            k2 = jnp.min(key2, axis=1, keepdims=True)

            col0 = j * _TB

            def gcol(k):
                return (k & (_TB - 1)) + col0

            td1, ti1 = k1 >> _TB_BITS, gcol(k1)
            td2, ti2 = k2 >> _TB_BITS, gcol(k2)
            rd1, ri1 = sk1[:] >> _TB_BITS, sc1[:]
            rd2, ri2 = sk2[:] >> _TB_BITS, sc2[:]

            def lt(da, ia, db, ib):
                return (da < db) | ((da == db) & (ia < ib))

            take1 = lt(td1, ti1, rd1, ri1)
            nd1 = jnp.where(take1, td1, rd1)
            ni1 = jnp.where(take1, ti1, ri1)
            lose_d = jnp.where(take1, rd1, td1)
            lose_i = jnp.where(take1, ri1, ti1)
            win2_d = jnp.where(take1, td2, rd2)
            win2_i = jnp.where(take1, ti2, ri2)
            takeL = lt(lose_d, lose_i, win2_d, win2_i)
            nd2 = jnp.where(takeL, lose_d, win2_d)
            ni2 = jnp.where(takeL, lose_i, win2_i)

            sk1[:] = nd1 << _TB_BITS
            sc1[:] = ni1
            sk2[:] = nd2 << _TB_BITS
            sc2[:] = ni2

        @pl.when(j == nj - 1)
        def _():
            # Un-bias: biased (key >> 9) spans [-2^22, 2^22 - 1]; true
            # d2 = that + 2^22 (the init marker decodes to _D2_INVALID).
            od1_ref[:] = (sk1[:] >> _TB_BITS) + _D2_HALF
            oi1_ref[:] = sc1[:]
            od2_ref[:] = (sk2[:] >> _TB_BITS) + _D2_HALF
            oi2_ref[:] = sc2[:]

    return kernel


@functools.partial(jax.jit)
def match_2nn_tiles(desc_a: jax.Array, count_a: jax.Array,
                    desc_b: jax.Array, count_b: jax.Array):
    """Raw fused top-2 over the padded A rows (transposed-tile kernel).

    Returns (d2_1, i1, d2_2, i2) int32 arrays of shape (NA,) (caller's
    unpadded row count); d2 == 2^23 - 1 means "no valid neighbor" and
    rows >= count_a carry that marker too.
    """
    na, d = desc_a.shape
    nb = desc_b.shape[0]
    pad_a = (-na) % _TA
    pad_b = (-nb) % _TB
    if pad_a:
        desc_a = jnp.pad(desc_a, ((0, pad_a), (0, 0)))
    if pad_b:
        desc_b = jnp.pad(desc_b, ((0, pad_b), (0, 0)))
    nap, nbp = desc_a.shape[0], desc_b.shape[0]

    a16 = desc_a.astype(jnp.bfloat16)
    b16 = desc_b.astype(jnp.bfloat16)
    # Pre-biased A norms: 512*|a|^2 - 2^31 (both 512-multiples -> exact).
    asq = (512.0 * jnp.sum(jnp.square(desc_a.astype(jnp.float32)), axis=1)
           - _KEY_BIAS_F)[None, :]                        # (1, NAp)
    bsq = 512.0 * jnp.sum(jnp.square(desc_b.astype(jnp.float32)), axis=1)
    colv = jnp.arange(nbp) < count_b
    bsq = jnp.where(colv, bsq, _INVALID_BSQ)[:, None]     # (NBp, 1)
    cnts = jnp.stack([jnp.asarray(count_a, jnp.int32),
                      jnp.asarray(count_b, jnp.int32)])

    ni = nap // _TA
    nj = nbp // _TB
    out = pl.pallas_call(
        _make_kernel_t(nj),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_TA, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TA), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 8, _TA), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((ni, 8, _TA), jnp.int32)
            for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((1, _TA), jnp.int32),
            pltpu.VMEM((1, _TA), jnp.int32),
            pltpu.VMEM((1, _TA), jnp.int32),
            pltpu.VMEM((1, _TA), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(cnts, a16, asq, b16, bsq)
    d1, i1, d2_, i2 = (o[:, 0, :].reshape(nap)[:na] for o in out)
    return d1, i1, d2_, i2


@functools.partial(jax.jit)
def _match_2nn_tiles_rowmajor(desc_a: jax.Array, count_a: jax.Array,
                              desc_b: jax.Array, count_b: jax.Array):
    """Row-major (TA, TB) variant kept for the hardware A/B; the
    transposed kernel above is the default."""
    na, d = desc_a.shape
    nb = desc_b.shape[0]
    pad_a = (-na) % _TA
    pad_b = (-nb) % _TB
    if pad_a:
        desc_a = jnp.pad(desc_a, ((0, pad_a), (0, 0)))
    if pad_b:
        desc_b = jnp.pad(desc_b, ((0, pad_b), (0, 0)))
    nap, nbp = desc_a.shape[0], desc_b.shape[0]

    a16 = desc_a.astype(jnp.bfloat16)
    b16 = desc_b.astype(jnp.bfloat16)
    asq = 512.0 * jnp.sum(jnp.square(desc_a.astype(jnp.float32)), axis=1,
                          keepdims=True)                  # (NAp, 1)
    bsq = 512.0 * jnp.sum(jnp.square(desc_b.astype(jnp.float32)), axis=1)
    colv = jnp.arange(nbp) < count_b
    bsq = jnp.where(colv, bsq, _INVALID_BSQ)[None, :]     # (1, NBp)
    cnts = jnp.stack([jnp.asarray(count_a, jnp.int32),
                      jnp.asarray(count_b, jnp.int32)])

    ni = nap // _TA
    nj = nbp // _TB
    out = pl.pallas_call(
        _make_kernel(nj),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_TA, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TA, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((_TA, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nap, 1), jnp.int32) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((_TA, 1), jnp.int32),
            pltpu.VMEM((_TA, 1), jnp.int32),
            pltpu.VMEM((_TA, 1), jnp.int32),
            pltpu.VMEM((_TA, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(cnts, a16, asq, b16, bsq)
    d1, i1, d2_, i2 = (o[:na, 0] for o in out)
    return d1, i1, d2_, i2
