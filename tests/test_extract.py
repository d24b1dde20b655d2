"""Golden tests for DoG extremum detection and subpixel refinement
(reference semantics: shaders/ExtractKeypoints.comp)."""

import pytest
import numpy as np
import jax.numpy as jnp

from vulkansift_tpu import SiftConfig
from vulkansift_tpu.golden import reference as gold
from vulkansift_tpu.ops import extract, scale_space


def _dog_for(img_u8, config):
    img = img_u8.astype(np.float32) / 255.0
    h, w = img.shape
    shapes = tuple((hh, ww) for (ww, hh) in config.octave_resolutions(w, h))
    gaussians, dogs = scale_space.build_pyramid(jnp.asarray(img), config, shapes)
    return gaussians, dogs, config.octave_resolutions(w, h)


@pytest.mark.heavy
def test_extremum_candidates_match_golden(small_image):
    c = SiftConfig(use_input_upsampling=False)
    _, dogs, _ = _dog_for(small_image, c)
    total = 0
    for o in (0, 1):
        dog_np = np.asarray(dogs[o], np.float64)
        ref = gold.extrema_np(dog_np, c.dog_threshold)
        cand = extract.extremum_candidates(dogs[o], c.dog_threshold, 4096)
        n = int(cand.count)
        got = sorted(zip(np.asarray(cand.s)[:n].tolist(),
                         np.asarray(cand.y)[:n].tolist(),
                         np.asarray(cand.x)[:n].tolist()))
        assert got == sorted(ref)
        total += n
    assert total > 0  # the test image must actually produce extrema


def test_candidate_capacity_clamp(small_image):
    c = SiftConfig(use_input_upsampling=False)
    _, dogs, _ = _dog_for(small_image, c)
    cand_full = extract.extremum_candidates(dogs[0], c.dog_threshold, 4096)
    n = int(cand_full.count)
    assert n > 4
    cap = max(n // 2, 1)
    cand = extract.extremum_candidates(dogs[0], c.dog_threshold, cap)
    assert int(cand.count) == cap
    # Raster-order prefix of the full set.
    np.testing.assert_array_equal(np.asarray(cand.s)[:cap],
                                  np.asarray(cand_full.s)[:cap])


def test_refinement_matches_golden(small_image):
    c = SiftConfig(use_input_upsampling=False)
    _, dogs, oct_res = _dog_for(small_image, c)
    s = c.nb_scales_per_octave
    o = 0
    ow, oh = oct_res[o]
    dog_np = np.asarray(dogs[o], np.float64)
    cand = extract.extremum_candidates(dogs[o], c.dog_threshold, 2048)
    n = int(cand.count)
    refined = extract.refine_candidates(
        dogs[o], cand, nb_scales=s, width=ow, height=oh,
        dog_threshold=c.dog_threshold, edge_threshold=c.edge_threshold,
        seed_sigma=c.seed_scale_sigma, octave_idx=o)

    n_checked = n_valid = 0
    for i in range(n):
        ref = gold.refine_np(
            dog_np, int(cand.s[i]), int(cand.y[i]), int(cand.x[i]),
            nb_scales=s, width=ow, height=oh, dog_threshold=c.dog_threshold,
            edge_threshold=c.edge_threshold, seed_sigma=c.seed_scale_sigma,
            octave_idx=o)
        ours_valid = bool(refined.valid[i])
        assert ours_valid == (ref is not None), f"candidate {i}"
        n_checked += 1
        if ref is None:
            continue
        n_valid += 1
        assert float(refined.scale_x[i]) == np.float32(ref["scale_x"]) or \
            abs(float(refined.scale_x[i]) - ref["scale_x"]) < 1e-3
        assert abs(float(refined.scale_y[i]) - ref["scale_y"]) < 1e-3
        assert abs(float(refined.subpix_s[i]) - ref["subpix_s"]) < 1e-3
        assert abs(float(refined.sigma[i]) - ref["sigma"]) < 1e-3
        assert abs(float(refined.intensity[i]) - ref["intensity"]) < 1e-4
        assert int(refined.scale_idx[i]) == ref["scale_idx"]
    assert n_checked > 0 and n_valid > 0


def test_refinement_masks_padding(small_image):
    c = SiftConfig(use_input_upsampling=False)
    _, dogs, oct_res = _dog_for(small_image, c)
    ow, oh = oct_res[0]
    cand = extract.extremum_candidates(dogs[0], c.dog_threshold, 2048)
    refined = extract.refine_candidates(
        dogs[0], cand, nb_scales=c.nb_scales_per_octave, width=ow, height=oh,
        dog_threshold=c.dog_threshold, edge_threshold=c.edge_threshold,
        seed_sigma=c.seed_scale_sigma, octave_idx=0)
    n = int(cand.count)
    assert not np.asarray(refined.valid)[n:].any()
