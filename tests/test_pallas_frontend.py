"""Interpret-mode parity tests for the Pallas dense frontend kernel
(runs on CPU; real-TPU parity is exercised by the pipeline on hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vulkansift_tpu.ops.extract as extract
import vulkansift_tpu.ops.pallas_frontend as pf


@pytest.fixture()
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pf.pl, "pallas_call", patched)


def _rand_dog(shape, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


@pytest.mark.parametrize("shape", [(5, 64, 128), (5, 48, 200)])
def test_frontend_matches_xla(interpret_mode, shape):
    dog = _rand_dog(shape)
    thr = 0.04 / 3
    ref_c, ref_code = extract.dense_frontend(dog, thr, 512)
    new_c, new_code = pf.frontend_tpu(dog, dog_threshold=thr, capacity=512)
    n_r, n_n = int(ref_c.count), int(new_c.count)
    assert n_r == n_n and n_r > 0

    def tuples(c, n):
        return sorted(zip(np.asarray(c.s)[:n].tolist(),
                          np.asarray(c.y)[:n].tolist(),
                          np.asarray(c.x)[:n].tolist()))

    assert tuples(ref_c, n_r) == tuples(new_c, n_n)
    # Walk codes agree on the interior (new layout: code[s-1, y-1, x]).
    s, h, w = shape
    rc = np.asarray(ref_code).astype(np.int32)
    nc = np.asarray(new_code)[:, :h - 2, 1:w - 1].astype(np.int32) % 128
    np.testing.assert_array_equal(rc, nc)


def test_frontend_capacity_clamp(interpret_mode):
    dog = _rand_dog((5, 64, 128), seed=1)
    thr = 0.001  # very low threshold -> many candidates
    full_c, _ = pf.frontend_tpu(dog, dog_threshold=thr, capacity=4096)
    n = int(full_c.count)
    assert n > 64
    cap = n // 2
    c, _ = pf.frontend_tpu(dog, dog_threshold=thr, capacity=cap)
    assert int(c.count) == cap
    # Raster-order prefix.
    np.testing.assert_array_equal(np.asarray(c.s)[:cap],
                                  np.asarray(full_c.s)[:cap])
    np.testing.assert_array_equal(np.asarray(c.x)[:cap],
                                  np.asarray(full_c.x)[:cap])


def test_frontend_column_tiled_matches_single(interpret_mode):
    """Column-tiled path (wide images) vs the single-tile kernel: same
    candidates, same interior walk codes."""
    dog = _rand_dog((5, 40, 640), seed=4)
    thr = 0.04 / 3
    ref_c, ref_code = pf.frontend_tpu(dog, dog_threshold=thr, capacity=2048)
    new_c, new_code = pf.frontend_tpu(dog, dog_threshold=thr, capacity=2048,
                                      max_single_w=256, col_tile=256)
    n_r, n_n = int(ref_c.count), int(new_c.count)
    assert n_r == n_n and n_r > 0

    def tuples(c, n):
        return sorted(zip(np.asarray(c.s)[:n].tolist(),
                          np.asarray(c.y)[:n].tolist(),
                          np.asarray(c.x)[:n].tolist()))

    assert tuples(ref_c, n_r) == tuples(new_c, n_n)
    s, h, w = dog.shape
    rc = np.asarray(ref_code)[:, :h - 2, 1:w - 1].astype(np.int32)
    nc = np.asarray(new_code)[:, :h - 2, 1:w - 1].astype(np.int32)
    np.testing.assert_array_equal(rc % 128, nc % 128)


@pytest.mark.heavy
def test_refine_accepts_frontend_code(interpret_mode):
    dog = _rand_dog((5, 64, 128), seed=2)
    thr = 0.04 / 3
    cand, code = pf.frontend_tpu(dog, dog_threshold=thr, capacity=256)
    kw = dict(nb_scales=3, width=128, height=64, dog_threshold=thr,
              edge_threshold=10.0, seed_sigma=1.6, octave_idx=0)
    r_new = extract.refine_candidates(dog, cand, code=code, **kw)
    r_ref = extract.refine_candidates(dog, cand, **kw)
    np.testing.assert_array_equal(np.asarray(r_new.valid),
                                  np.asarray(r_ref.valid))
    n = int(cand.count)
    np.testing.assert_allclose(np.asarray(r_new.scale_x)[:n],
                               np.asarray(r_ref.scale_x)[:n], atol=1e-6)
