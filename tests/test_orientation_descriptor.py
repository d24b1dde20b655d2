"""Golden tests for orientation assignment and descriptor computation
(reference semantics: shaders/ComputeOrientation.comp,
shaders/ComputeDescriptors.comp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vulkansift_tpu import SiftConfig
from vulkansift_tpu.golden import reference as gold
from vulkansift_tpu.detector import SiftDetector
from vulkansift_tpu.ops import extract, scale_space
from vulkansift_tpu.ops.descriptor import compute_descriptors
from vulkansift_tpu.ops.orientation import compute_orientations
from vulkansift_tpu.ops.patches import (PatchSet, gather_patches,
                                        max_descriptor_radius,
                                        max_orientation_radius, patch_size)


@pytest.fixture(scope="module")
def pipeline_state(small_image):
    """Run the front of the pipeline once; yields keypoints on octave 0."""
    c = SiftConfig(use_input_upsampling=False)
    img = small_image.astype(np.float32) / 255.0
    h, w = img.shape
    shapes = tuple((hh, ww) for (ww, hh) in c.octave_resolutions(w, h))
    gaussians, dogs = scale_space.build_pyramid(jnp.asarray(img), c, shapes)
    ow, oh = c.octave_resolutions(w, h)[0]
    cand = extract.extremum_candidates(dogs[0], c.dog_threshold, 1024)
    refined = extract.refine_candidates(
        dogs[0], cand, nb_scales=c.nb_scales_per_octave, width=ow, height=oh,
        dog_threshold=c.dog_threshold, edge_threshold=c.edge_threshold,
        seed_sigma=c.seed_scale_sigma, octave_idx=0)
    valid = np.asarray(refined.valid)
    idx = np.nonzero(valid)[0]
    assert len(idx) >= 3
    return c, gaussians, refined, idx, (ow, oh)


def _make_patchset(c, gaussians, refined, idx, ow, oh):
    pe = patch_size(c)
    cx = jnp.clip(jnp.round(refined.scale_x[idx]), 0, ow).astype(jnp.int32)
    cy = jnp.clip(jnp.round(refined.scale_y[idx]), 0, oh).astype(jnp.int32)
    sigma_oct = c.seed_scale_sigma * jnp.exp2(
        refined.subpix_s[idx] / c.nb_scales_per_octave)
    patches = gather_patches(gaussians[0], refined.scale_idx[idx], cx, cy,
                             patch_edge=pe)
    k = len(idx)
    return PatchSet(
        patches=patches, cx=cx, cy=cy,
        scale_x=refined.scale_x[idx], scale_y=refined.scale_y[idx],
        sigma_oct=sigma_oct,
        width=jnp.full((k,), ow, jnp.int32),
        height=jnp.full((k,), oh, jnp.int32))


def test_orientations_match_golden(pipeline_state):
    c, gaussians, refined, idx, (ow, oh) = pipeline_state
    ps = _make_patchset(c, gaussians, refined, idx, ow, oh)
    ori = compute_orientations(ps, ori_radius=max_orientation_radius(c),
                               capacity=c.orientation_capacity)
    angles = np.asarray(ori.angles)
    valid = np.asarray(ori.valid)
    for row, i in enumerate(idx):
        layer = np.asarray(gaussians[0][int(refined.scale_idx[i])], np.float64)
        ref = gold.orientations_np(
            layer, float(refined.scale_x[i]), float(refined.scale_y[i]),
            float(ps.sigma_oct[row]), c.orientation_capacity)
        got = sorted(angles[row][valid[row]].tolist())
        want = sorted(a for a, _ in ref)
        assert len(got) == len(want), f"kp {i}"
        np.testing.assert_allclose(got, want, atol=1e-3)
        assert len(got) >= 1
        # Principal orientation (strongest peak) first.
        assert angles[row][0] == pytest.approx(ref[0][0], abs=1e-3)


@pytest.mark.parametrize("use_vlfeat", [False, True])
def test_descriptors_match_golden(pipeline_state, use_vlfeat):
    c, gaussians, refined, idx, (ow, oh) = pipeline_state
    idx = idx[:6]
    ps = _make_patchset(c, gaussians, refined, idx, ow, oh)
    ori = compute_orientations(ps, ori_radius=max_orientation_radius(c),
                               capacity=c.orientation_capacity)
    principal = ori.angles[:, 0]
    desc = np.asarray(compute_descriptors(
        ps, principal, desc_radius=max_descriptor_radius(c),
        use_vlfeat=use_vlfeat))
    for row, i in enumerate(idx):
        layer = np.asarray(gaussians[0][int(refined.scale_idx[i])], np.float64)
        ref = gold.descriptor_np(
            layer, float(refined.scale_x[i]), float(refined.scale_y[i]),
            float(ps.sigma_oct[row]), float(principal[row]), use_vlfeat)
        # Quantization at *512/floor can flip a bin by 1 on float noise.
        diff = np.abs(desc[row].astype(int) - ref.astype(int))
        assert (diff <= 1).all(), f"kp {i}: max diff {diff.max()}"
        assert diff.mean() < 0.2


def test_descriptor_formats_differ(pipeline_state):
    c, gaussians, refined, idx, (ow, oh) = pipeline_state
    idx = idx[:4]
    ps = _make_patchset(c, gaussians, refined, idx, ow, oh)
    ori = compute_orientations(ps, ori_radius=max_orientation_radius(c),
                               capacity=c.orientation_capacity)
    d_ubc = np.asarray(compute_descriptors(
        ps, ori.angles[:, 0], desc_radius=max_descriptor_radius(c),
        use_vlfeat=False))
    d_vl = np.asarray(compute_descriptors(
        ps, ori.angles[:, 0], desc_radius=max_descriptor_radius(c),
        use_vlfeat=True))
    assert (d_ubc != d_vl).any()
    # VLFeat layout = UBC with orientation bins reversed within each cell
    # (bin 0 fixed): descriptor energy per spatial cell must agree.
    e_ubc = d_ubc.reshape(-1, 16, 8).astype(np.int64).sum(-1)
    e_vl = d_vl.reshape(-1, 16, 8).astype(np.int64).sum(-1)
    np.testing.assert_allclose(e_ubc, e_vl, atol=40)


@pytest.mark.heavy
def test_full_detector_end_to_end(blob_image):
    c = SiftConfig(use_input_upsampling=False, max_nb_sift_per_buffer=8192,
                   input_image_max_size=640 * 480)
    det = SiftDetector(c)
    h, w = blob_image.shape
    feats, gaussians, dogs, per_octave = det.detect(blob_image, w, h)
    n = int(feats.count)
    assert n == sum(per_octave)
    assert n > 20
    x = np.asarray(feats.x)[:n]
    y = np.asarray(feats.y)[:n]
    assert (x >= 0).all() and (x < w).all()
    assert (y >= 0).all() and (y < h).all()
    sig = np.asarray(feats.sigma)[:n]
    assert (sig > 0).all()
    desc = np.asarray(feats.descriptor)[:n]
    assert desc.any(axis=1).all()  # no empty descriptors


def test_orientation_peak_capacity_boundary():
    """A histogram with 6 strong peaks must clamp to the configured
    orientation capacity (config.py orientation_capacity: explicit cap, or
    8 for 'unlimited') — the XLA analogue of the reference's
    max_nb_orientation atomic-append cap (ComputeOrientation.comp:170-184)."""
    import jax.numpy as jnp
    from vulkansift_tpu.ops.orientation import peaks_from_histograms

    hist = np.zeros((1, 36), np.float32)
    hist[0, ::6] = 1.0  # 6 equally strong, well-separated peaks
    # cap=4 (the default config): exactly 4 survive, strongest-first.
    out4 = peaks_from_histograms(jnp.asarray(hist), 4)
    assert int(np.asarray(out4.valid).sum()) == 4
    # "unlimited" (cap 8): all 6 peaks survive, 2 slots stay invalid.
    out8 = peaks_from_histograms(jnp.asarray(hist), 8)
    assert int(np.asarray(out8.valid).sum()) == 6
    angles = np.sort(np.asarray(out8.angles)[0][np.asarray(out8.valid)[0]])
    expected = (np.arange(0, 36, 6) + 0.5) * (2 * np.pi / 36)
    np.testing.assert_allclose(angles, expected, atol=1e-5)
    # Config mapping: explicit cap passes through; 0 = unlimited -> 8.
    assert SiftConfig(max_nb_orientation_per_keypoint=6).orientation_capacity == 6
    assert SiftConfig(max_nb_orientation_per_keypoint=0).orientation_capacity == 8
