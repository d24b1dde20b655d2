"""Interpret-mode parity tests for the Pallas back-half kernels
(ops/pallas_backhalf): histogram + descriptor kernels vs the pure-XLA
back-half on identical refined keypoints.

These run the REAL kernel code (DMA machinery, dynamic grids, window
masks) through the Pallas interpreter on CPU, so a Mosaic-visible logic
regression fails CI instead of shipping silently (VERDICT round 1, #3).
Runs eagerly (no jit) so the dynamic grid sizes are concrete.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vulkansift_tpu.ops.pallas_backhalf as pb
from vulkansift_tpu.config import SiftConfig
from vulkansift_tpu.pipeline import make_detect_fn

from conftest import make_blob_image


@pytest.fixture()
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pb.pl, "pallas_call", patched)


def _detect(cfg, img, backhalf):
    h, w = img.shape
    fn = make_detect_fn(cfg, w, h, backhalf=backhalf)
    return fn(jnp.asarray(img))  # eager: concrete dynamic grid sizes


def _key(out, n):
    f = out.features
    return list(zip(np.asarray(f.x)[:n].round(2).tolist(),
                    np.asarray(f.y)[:n].round(2).tolist(),
                    np.asarray(f.orientation)[:n].round(2).tolist()))


def _match_pairs(out_a, n_a, out_b, n_b, ang_tol=0.02):
    """Pairs (i, j) with identical position and |delta angle| < tol.

    The two paths compute histograms with different float orderings
    (polynomial atan2 + row-sum reduction vs XLA atan2 + tree reduction),
    so borderline 0.8*max peaks can flip; match primarily on position."""
    fa, fb = out_a.features, out_b.features
    pos_b = {}
    for j in range(n_b):
        pos_b.setdefault((round(float(fb.x[j]), 2),
                          round(float(fb.y[j]), 2)), []).append(j)
    pairs = []
    pos_hit = 0
    for i in range(n_a):
        cands = pos_b.get((round(float(fa.x[i]), 2),
                           round(float(fa.y[i]), 2)), [])
        if cands:
            pos_hit += 1
        da = [(abs(((float(fa.orientation[i])
                     - float(fb.orientation[j]) + np.pi)
                    % (2 * np.pi)) - np.pi), j) for j in cands]
        if da:
            d, j = min(da)
            if d < ang_tol:
                pairs.append((i, j))
    return pairs, pos_hit


@pytest.mark.heavy
def test_backhalf_matches_xla(interpret_mode):
    img = make_blob_image(96, 128, seed=5, nb_blobs=14)
    cfg = SiftConfig(use_input_upsampling=False,
                     max_nb_sift_per_buffer=512,
                     input_image_max_size=128 * 96)
    out_p = _detect(cfg, img, "pallas")
    out_x = _detect(cfg, img, "xla")
    n_p, n_x = int(out_p.features.count), int(out_x.features.count)
    assert n_p > 10

    # Same refined keypoints feed both paths; positions must agree for
    # nearly all, orientations within tolerance for the overwhelming
    # majority (borderline 0.8*max peaks may flip between float paths).
    pairs, pos_hit = _match_pairs(out_p, n_p, out_x, n_x)
    assert pos_hit >= 0.95 * n_p
    assert len(pairs) >= 0.85 * max(n_p, n_x)

    # Descriptors for angle-matched pairs: the kernel's bf16 MXU
    # accumulation vs XLA f32 einsum is bounded by ~1 u8 bin after
    # normalization (same bound as the reference's fixed-point
    # approximation, ComputeDescriptors.comp:40-77); allow rare outliers.
    dp = np.asarray(out_p.features.descriptor, np.int32)
    dx = np.asarray(out_x.features.descriptor, np.int32)
    tight = [(i, j) for (i, j) in pairs
             if abs(float(out_p.features.orientation[i])
                    - float(out_x.features.orientation[j])) < 1e-3]
    assert len(tight) >= 0.8 * len(pairs)
    diffs = np.concatenate([np.abs(dp[i] - dx[j]) for i, j in tight])
    assert np.mean(diffs <= 1) > 0.995
    assert diffs.max() <= 8


@pytest.mark.heavy
def test_backhalf_small_octave_atlas_bounds(interpret_mode):
    # Atlas shorter than the largest kernel window: exercises the padded
    # atlas + per-kernel row clamp (round-1 ADVICE: OOB window DMA).
    img = make_blob_image(56, 80, seed=9, nb_blobs=25)
    cfg = SiftConfig(use_input_upsampling=False,
                     max_nb_sift_per_buffer=256,
                     input_image_max_size=80 * 56)
    # Premise: the whole atlas (1 octave, 56 rows) is shorter than the
    # largest descriptor kernel window.
    assert pb.min_octave_rows(cfg) > 56
    out_p = _detect(cfg, img, "pallas")
    out_x = _detect(cfg, img, "xla")
    n_p, n_x = int(out_p.features.count), int(out_x.features.count)
    assert n_p > 0
    pairs, pos_hit = _match_pairs(out_p, n_p, out_x, n_x)
    assert pos_hit >= 0.9 * n_p
    assert len(pairs) >= 0.8 * max(n_p, n_x)


@pytest.mark.heavy
def test_backhalf_border_clamps(interpret_mode):
    """Keypoints near the left/right image edges exercise the window-start
    clamps and the packed kernels' repositioning-roll wrap masking (the
    correctness argument in _make_desc_kernel_packed's docstring): a wide
    image makes the right-edge clamp regime reachable, and blob clusters
    at both edges put keypoints inside it."""
    import numpy as np
    rng = np.random.default_rng(11)
    h, w = 96, 1280
    ys_, xs_ = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 0.08 * rng.standard_normal((h, w))
    for _ in range(30):
        cy = rng.uniform(8, h - 8)
        # Clusters hugging both vertical edges (incl. within one window
        # radius of x=0 and x=w-1).
        cx = rng.choice([rng.uniform(2, 40), rng.uniform(w - 40, w - 2)])
        s = rng.uniform(1.5, 4.0)
        img += rng.uniform(0.4, 1.0) * np.exp(
            -((ys_ - cy) ** 2 + (xs_ - cx) ** 2) / (2 * s * s))
    img -= img.min()
    img = (255.0 * img / img.max()).astype(np.uint8)

    cfg = SiftConfig(use_input_upsampling=False,
                     max_nb_sift_per_buffer=512,
                     input_image_max_size=w * h)
    out_p = _detect(cfg, img, "pallas")
    out_x = _detect(cfg, img, "xla")
    n_p, n_x = int(out_p.features.count), int(out_x.features.count)
    assert n_p > 5
    # Must include edge-hugging keypoints for the test premise to hold.
    xs_det = np.asarray(out_p.features.x)[:n_p]
    assert (xs_det < 64).any() and (xs_det > w - 64).any()
    pairs, pos_hit = _match_pairs(out_p, n_p, out_x, n_x)
    assert pos_hit >= 0.9 * n_p
    assert len(pairs) >= 0.8 * max(n_p, n_x)
    dp = np.asarray(out_p.features.descriptor, np.int32)
    dx = np.asarray(out_x.features.descriptor, np.int32)
    tight = [(i, j) for (i, j) in pairs
             if abs(float(out_p.features.orientation[i])
                    - float(out_x.features.orientation[j])) < 1e-3]
    diffs = np.concatenate([np.abs(dp[i] - dx[j]) for i, j in tight])
    assert np.mean(diffs <= 1) > 0.995
    assert diffs.max() <= 8


@pytest.mark.heavy
def test_hybrid_refine_split_matches_global(interpret_mode, monkeypatch):
    """The hybrid refine split (big octaves per-octave, small-octave tail
    in one global walk) must produce the same features as the all-global
    path; exercised on a small image by lowering the split thresholds."""
    import vulkansift_tpu.pipeline as pipeline
    img = make_blob_image(96, 160, seed=7, nb_blobs=16)
    cfg = SiftConfig(use_input_upsampling=True,
                     max_nb_sift_per_buffer=512,
                     input_image_max_size=160 * 96)
    out_g = _detect(cfg, img, "pallas")
    monkeypatch.setattr(pipeline, "_GLOBAL_REFINE_MAX_CELLS", 0)
    monkeypatch.setattr(pipeline, "_PER_OCTAVE_REFINE_MIN_W", 128)
    out_h = _detect(cfg, img, "pallas")
    n_g, n_h = int(out_g.features.count), int(out_h.features.count)
    assert n_g > 10 and n_h == n_g
    for name in ("x", "y", "scale_x", "scale_y", "sigma", "orientation",
                 "octave_idx"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_h.features, name))[:n_g],
            np.asarray(getattr(out_g.features, name))[:n_g],
            rtol=0, atol=1e-5, err_msg=name)
    np.testing.assert_array_equal(
        np.asarray(out_h.features.descriptor)[:n_g],
        np.asarray(out_g.features.descriptor)[:n_g])


@pytest.mark.heavy
def test_backhalf_capacity_clamp_and_lost(interpret_mode):
    img = make_blob_image(96, 128, seed=5, nb_blobs=14)
    big = SiftConfig(use_input_upsampling=False,
                     max_nb_sift_per_buffer=512,
                     input_image_max_size=128 * 96)
    out_full = _detect(big, img, "pallas")
    n = int(out_full.features.count)
    assert n > 8
    cap = max(n // 2, 1)
    small = SiftConfig(use_input_upsampling=False,
                       max_nb_sift_per_buffer=cap,
                       input_image_max_size=128 * 96)
    out_c = _detect(small, img, "pallas")
    n_c = int(out_c.features.count)
    assert n_c <= cap
    # Features beyond capacity are either counted lost (pair-stage clamp)
    # or dropped earlier at the per-octave candidate sections; both must
    # leave the output strictly smaller than the uncapped run.
    assert int(out_c.lost) > 0 or n_c < n
