"""Tests for the monolithic jitted pipeline and multi-chip sharding paths,
run on the 8-device virtual CPU mesh (conftest XLA_FLAGS)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vulkansift_tpu as vs
from vulkansift_tpu.detector import SiftDetector
from vulkansift_tpu.golden import reference as gold
from vulkansift_tpu.ops.match import match_2nn
from vulkansift_tpu.parallel import (make_dp_detect_fn, make_mesh,
                                     make_ring_match_fn, shard_batch)
from vulkansift_tpu.pipeline import make_detect_batched, make_detect_fn

from conftest import make_blob_image

CFG = vs.SiftConfig(use_input_upsampling=False, max_nb_sift_per_buffer=2048,
                    sift_buffer_count=1)


def _sorted_feature_tuples(feats, n):
    cols = [np.asarray(getattr(feats, f))[:n] for f in
            ("x", "y", "sigma", "orientation")]
    rows = list(zip(*[c.tolist() for c in cols]))
    return sorted(rows)


@pytest.mark.heavy
def test_monolithic_matches_staged(small_image):
    h, w = small_image.shape
    detect = jax.jit(make_detect_fn(CFG, w, h))
    out = detect(jnp.asarray(small_image))
    n_mono = int(out.features.count)
    assert int(out.lost) == 0

    staged = SiftDetector(CFG)
    feats_s, _, _, per_oct = staged.detect(small_image, w, h)
    n_staged = int(feats_s.count)
    assert n_mono == n_staged
    np.testing.assert_allclose(
        np.asarray(_sorted_feature_tuples(out.features, n_mono)),
        np.asarray(_sorted_feature_tuples(feats_s, n_staged)), atol=1e-5)
    # Descriptors agree row-for-row after sorting by (x, y, orientation).
    def key_order(feats, n):
        k = np.lexsort((np.asarray(feats.orientation)[:n],
                        np.asarray(feats.y)[:n], np.asarray(feats.x)[:n]))
        return np.asarray(feats.descriptor)[:n][k]
    np.testing.assert_array_equal(key_order(out.features, n_mono),
                                  key_order(feats_s, n_staged))


@pytest.mark.heavy
def test_batched_detect_consistent(small_image):
    h, w = small_image.shape
    img2 = make_blob_image(h, w, seed=9)
    batch = jnp.stack([jnp.asarray(small_image), jnp.asarray(img2)])
    detect_b = jax.jit(make_detect_batched(CFG, w, h))
    out = detect_b(batch)
    detect1 = jax.jit(make_detect_fn(CFG, w, h))
    for i, img in enumerate((small_image, img2)):
        single = detect1(jnp.asarray(img))
        n = int(single.features.count)
        assert int(out.features.count[i]) == n
        np.testing.assert_allclose(
            np.asarray(out.features.x[i])[:n],
            np.asarray(single.features.x)[:n], atol=1e-5)


@pytest.mark.heavy
def test_dp_detect_on_mesh(small_image):
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    h, w = small_image.shape
    images = np.stack([make_blob_image(h, w, seed=s) for s in range(8)])
    dp_fn = make_dp_detect_fn(CFG, w, h, mesh)
    out = dp_fn(shard_batch(images, mesh))
    assert out.features.x.shape == (8, CFG.max_nb_sift_per_buffer)
    detect1 = jax.jit(make_detect_fn(CFG, w, h))
    for i in (0, 3, 7):
        single = detect1(jnp.asarray(images[i]))
        n = int(single.features.count)
        assert int(out.features.count[i]) == n
        # shard_map + lax.map reassociates fusions slightly differently
        # from the bare single-image program: keypoint positions agree to
        # ~1e-4 px (subpixel refinement amplifies 1-ulp DoG differences).
        np.testing.assert_allclose(np.asarray(out.features.x[i])[:n],
                                   np.asarray(single.features.x)[:n],
                                   atol=1e-3)


def test_ring_match_exact_vs_single_chip():
    rng = np.random.default_rng(21)
    na, nb = 256, 512  # divisible by 8
    a = rng.integers(0, 256, (na, 128), dtype=np.uint8)
    b = rng.integers(0, 256, (nb, 128), dtype=np.uint8)
    ca, cb = 250, 505  # non-full counts to exercise masking
    mesh = make_mesh(8)
    ring = make_ring_match_fn(mesh)
    m = ring(jnp.asarray(a), ca, jnp.asarray(b), cb)
    ref = gold.match_2nn_np(a[:na], b[:cb])
    np.testing.assert_array_equal(np.asarray(m.idx_a), np.arange(na))
    np.testing.assert_array_equal(np.asarray(m.idx_b1)[:ca], ref[:ca, 0])
    np.testing.assert_array_equal(np.asarray(m.idx_b2)[:ca], ref[:ca, 1])
    np.testing.assert_allclose(np.asarray(m.dist_a_b1)[:ca], ref[:ca, 2],
                               rtol=1e-6)
    # Also exactly equal to the single-chip tiled matcher.
    m1 = match_2nn(jnp.asarray(a), jnp.asarray(ca), jnp.asarray(b),
                   jnp.asarray(cb))
    np.testing.assert_array_equal(np.asarray(m.idx_b1)[:ca],
                                  np.asarray(m1.idx_b1)[:ca])
    np.testing.assert_array_equal(np.asarray(m.idx_b2)[:ca],
                                  np.asarray(m1.idx_b2)[:ca])


def test_ring_match_arbitrary_counts():
    """Raw detect outputs have counts NOT divisible by the mesh size; the
    ring matcher must pad internally and agree with the single-chip tiled
    matcher (same contract as match_2nn)."""
    rng = np.random.default_rng(23)
    na, nb = 250, 505  # neither divisible by 8
    a = rng.integers(0, 256, (na, 128), dtype=np.uint8)
    b = rng.integers(0, 256, (nb, 128), dtype=np.uint8)
    ca, cb = 247, 501
    mesh = make_mesh(8)
    ring = make_ring_match_fn(mesh)
    m = ring(jnp.asarray(a), ca, jnp.asarray(b), cb)
    assert int(m.count) == ca
    m1 = match_2nn(jnp.asarray(a), jnp.asarray(ca), jnp.asarray(b),
                   jnp.asarray(cb))
    np.testing.assert_array_equal(np.asarray(m.idx_b1)[:ca],
                                  np.asarray(m1.idx_b1)[:ca])
    np.testing.assert_array_equal(np.asarray(m.idx_b2)[:ca],
                                  np.asarray(m1.idx_b2)[:ca])
    np.testing.assert_allclose(np.asarray(m.dist_a_b1)[:ca],
                               np.asarray(m1.dist_a_b1)[:ca], rtol=1e-6)


def test_ring_match_tie_breaking_across_shards():
    # Identical descriptors placed in different shards: earliest global
    # index must win regardless of ring visit order.
    rng = np.random.default_rng(22)
    a = rng.integers(0, 256, (8, 128), dtype=np.uint8)
    b = np.zeros((64, 128), np.uint8)
    b[:] = a[0]  # every B row identical to A row 0
    mesh = make_mesh(8)
    ring = make_ring_match_fn(mesh)
    m = ring(jnp.asarray(a), 8, jnp.asarray(b), 64)
    assert int(m.idx_b1[0]) == 0
    assert int(m.idx_b2[0]) == 1


@pytest.mark.heavy
def test_scaling_measurement_runs():
    from vulkansift_tpu.parallel.scaling import measure_dp_scaling
    cfg = vs.SiftConfig(use_input_upsampling=False,
                        max_nb_sift_per_buffer=512, sift_buffer_count=1)
    res = measure_dp_scaling(cfg, 128, 96, per_device_batch=1,
                             device_counts=[1, 4, 8], iters=2)
    assert [p["devices"] for p in res["points"]] == [1, 4, 8]
    assert res["points"][0]["efficiency"] == 1.0
    for p in res["points"]:
        assert p["fps"] > 0


@pytest.mark.heavy
def test_vlfeat_and_bf16_modes(small_image):
    import dataclasses
    from vulkansift_tpu.config import DescriptorFormat, PyramidPrecision
    h, w = small_image.shape
    img = jnp.asarray(small_image)
    base = vs.SiftConfig(use_input_upsampling=False,
                         max_nb_sift_per_buffer=1024, sift_buffer_count=1)
    out_ubc = jax.jit(make_detect_fn(base, w, h))(img)
    # VLFeat layout: same keypoints, different descriptor bin order.
    cfg_vl = dataclasses.replace(base,
                                 descriptor_format=DescriptorFormat.VLFEAT)
    out_vl = jax.jit(make_detect_fn(cfg_vl, w, h))(img)
    n = int(out_ubc.features.count)
    assert int(out_vl.features.count) == n
    np.testing.assert_allclose(np.asarray(out_vl.features.x)[:n],
                               np.asarray(out_ubc.features.x)[:n], atol=1e-5)
    assert (np.asarray(out_vl.features.descriptor)[:n]
            != np.asarray(out_ubc.features.descriptor)[:n]).any()
    # bf16 pyramid: runs end-to-end, finds a (possibly smaller) feature set.
    cfg16 = dataclasses.replace(base,
                                pyramid_precision=PyramidPrecision.FLOAT16)
    out16 = jax.jit(make_detect_fn(cfg16, w, h))(img)
    assert int(out16.features.count) > 0
