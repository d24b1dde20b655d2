"""Interpret-mode parity tests for the fused blur+DoG kernel
(ops/pallas_blur) against the XLA formulation (ops/scale_space):
identical mirror-boundary semantics and accumulation order, so the
comparison is exact (bitwise up to float re-association inside one tap
sum, which both paths share)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vulkansift_tpu.ops.pallas_blur as pb
from vulkansift_tpu.ops import gaussian, scale_space


@pytest.fixture()
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pb.pl, "pallas_call", patched)


def _rand(h, w, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).random((h, w)).astype(np.float32))


@pytest.mark.parametrize("h,w", [(96, 256), (128, 384), (104, 512),
                                 (96, 1664), (96, 2048)])
@pytest.mark.parametrize("sigma", [1.226, 3.09])
def test_blur_dog_matches_xla(interpret_mode, h, w, sigma):
    x = _rand(h, w)
    taps = tuple(float(t) for t in gaussian.half_kernel(sigma))
    y, dog = pb.blur_dog_tpu(x, taps, with_dog=True)
    ref = scale_space.blur_separable(x, np.array(taps))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dog), np.asarray(ref - x),
                               rtol=0, atol=1e-6)


def test_blur_borders_exact(interpret_mode):
    # Border columns/rows are where the mirror corrections act: compare
    # ONLY the outer k-band, exactly.
    h, w = 96, 256
    x = _rand(h, w, seed=3)
    taps = tuple(float(t) for t in gaussian.half_kernel(3.09))  # k=13
    k = len(taps) - 1
    y, _ = pb.blur_dog_tpu(x, taps, with_dog=True)
    ref = scale_space.blur_separable(x, np.array(taps))
    y, ref = np.asarray(y), np.asarray(ref)
    band = np.zeros((h, w), bool)
    band[:k + 1], band[-k - 1:], band[:, :k + 1], band[:, -k - 1:] = (
        True, True, True, True)
    np.testing.assert_allclose(y[band], ref[band], rtol=0, atol=1e-6)


def test_blur_no_dog(interpret_mode):
    x = _rand(96, 256, seed=5)
    taps = tuple(float(t) for t in gaussian.half_kernel(1.545))
    y, dog = pb.blur_dog_tpu(x, taps, with_dog=False)
    assert dog is None
    ref = scale_space.blur_separable(x, np.array(taps))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=0, atol=1e-6)


@pytest.mark.heavy
def test_build_pyramid_kernel_path_matches_xla(interpret_mode, monkeypatch):
    # Force the TPU formulation switches on so build_pyramid routes the
    # eligible octaves through the kernel (interpret mode), then compare
    # against the pure-XLA pyramid. The MXU one-hot up/downsample paths
    # also activate; they are exact (unit selectors), so the comparison
    # stays tight.
    from vulkansift_tpu.config import SiftConfig

    h, w = 96, 384
    img = _rand(h, w, seed=7)
    cfg = SiftConfig(use_input_upsampling=True,
                     max_nb_sift_per_buffer=4096,
                     input_image_max_size=h * w)
    from vulkansift_tpu.pipeline import octave_plan
    shapes = tuple((hh, ww) for (ww, hh) in octave_plan(cfg, w, h, 1))

    g_ref, d_ref = scale_space.build_pyramid(img, cfg, shapes)
    monkeypatch.setenv("VKSIFT_ASSUME_TPU", "1")
    g_k, d_k = scale_space.build_pyramid(img, cfg, shapes)
    for o in range(len(shapes)):
        np.testing.assert_allclose(np.asarray(g_k[o]), np.asarray(g_ref[o]),
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(d_k[o]), np.asarray(d_ref[o]),
                                   rtol=0, atol=2e-6)


def test_eligibility_gate():
    assert pb.eligible(1024, 1536, jnp.float32)
    assert not pb.eligible(1024, 1536, jnp.float16)   # fp16 -> XLA path
    assert not pb.eligible(60, 256, jnp.float32)      # too short
    assert not pb.eligible(1024, 192, jnp.float32)    # W not 128-multiple
    assert not pb.eligible(1020, 1536, jnp.float32)   # H not 8-multiple
