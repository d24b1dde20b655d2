"""Quality-envelope regression tests for the two lossy approximations.

The reference treats pyramid precision as first-class config
(reference: include/vulkansift/vulkansift_types.h:142-146 — FP16 mode is
documented as "faster but slightly less accurate/stable"); sigma-scaled
sampling (ops/patches.build_patchset) is this repo's own approximation
with no reference analogue. Both regressed silently in earlier rounds
(round 3's fp16 recall-parity hit 0.79 with only dtype assertions in the
suite), so these tests enforce the MATCH-LEVEL quality envelope on the
CPU tier: detect on a homography pair, Lowe-filter 2-NN matches, count
matches within 2.5 px of ground truth (the reference oracle's protocol,
src/perf/perf_matching.cpp:30-79), and assert each approximation keeps a
fixed fraction of the exact path's correct matches.

Not marked heavy: the mid tier (-m "not heavy") must enforce this
forever.
"""

import os

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

import vulkansift_tpu as vs
from vulkansift_tpu.ops.match import lowe_ratio_mask, match_2nn

PIXEL_THR = 2.5
LOWE = 0.75
W, H = 320, 240


def _textured_image(h=H, w=W, seed=7):
    rng = np.random.default_rng(seed)
    img = cv2.resize(rng.random((h // 8, w // 8)), (w, h),
                     interpolation=cv2.INTER_CUBIC)
    img += 0.5 * cv2.resize(rng.random((h // 24, w // 24)), (w, h),
                            interpolation=cv2.INTER_CUBIC)
    img = cv2.GaussianBlur(img, (0, 0), 1.0)
    img -= img.min()
    return (255 * img / img.max()).astype(np.uint8)


def _homography(angle_deg=15.0, scale=0.85):
    c, s = np.cos(np.radians(angle_deg)), np.sin(np.radians(angle_deg))
    cx, cy = W / 2, H / 2
    T1 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]])
    R = np.array([[scale * c, -scale * s, 0],
                  [scale * s, scale * c, 0], [0, 0, 1]])
    T2 = np.array([[1, 0, cx + 6], [0, 1, cy - 4], [0, 0, 1]])
    return (T2 @ R @ T1).astype(np.float64)


@pytest.fixture(scope="module")
def pair():
    img1 = _textured_image()
    Hm = _homography()
    img2 = cv2.warpPerspective(img1, Hm, (W, H))
    return img1, img2, Hm


def _detect_both(pair, *, precision="f32", sigma_remap=True):
    img1, img2, _ = pair
    prev = os.environ.get("VKSIFT_NO_SIGMA_REMAP")
    try:
        if sigma_remap:
            os.environ.pop("VKSIFT_NO_SIGMA_REMAP", None)
        else:
            os.environ["VKSIFT_NO_SIGMA_REMAP"] = "1"
        cfg = vs.SiftConfig(
            use_input_upsampling=True,
            max_nb_sift_per_buffer=8192,
            sift_buffer_count=2,
            input_image_max_size=W * H,
            pyramid_precision=(vs.PyramidPrecision.FLOAT16
                               if precision == "fp16"
                               else vs.PyramidPrecision.FLOAT32))
        with vs.SiftInstance(cfg) as inst:
            inst.detect_features(img1, 0)
            inst.detect_features(img2, 1)
            return inst.download_features(0), inst.download_features(1)
    finally:
        if prev is None:
            os.environ.pop("VKSIFT_NO_SIGMA_REMAP", None)
        else:
            os.environ["VKSIFT_NO_SIGMA_REMAP"] = prev


def _correct_matches(f1, f2, Hm):
    """(correct, visible): Lowe-filtered matches within PIXEL_THR, and
    img1 keypoints whose projection lands inside img2."""
    xy1 = np.stack([f1["x"], f1["y"]], axis=1)
    xy2 = np.stack([f2["x"], f2["y"]], axis=1)
    p = np.concatenate([xy1, np.ones((len(xy1), 1))], axis=1) @ Hm.T
    proj = p[:, :2] / p[:, 2:3]
    visible = int(((proj[:, 0] >= 0) & (proj[:, 0] < W)
                   & (proj[:, 1] >= 0) & (proj[:, 1] < H)).sum())
    m = match_2nn(jnp.asarray(f1["descriptor"]), jnp.asarray(len(xy1)),
                  jnp.asarray(f2["descriptor"]), jnp.asarray(len(xy2)))
    keep = np.asarray(lowe_ratio_mask(m, LOWE))
    ia, ib = np.asarray(m.idx_a)[keep], np.asarray(m.idx_b1)[keep]
    if len(ia) == 0:
        return 0, visible
    err = np.linalg.norm(proj[ia] - xy2[ib], axis=1)
    return int((err < PIXEL_THR).sum()), visible


@pytest.fixture(scope="module")
def f32_baseline(pair):
    f1, f2 = _detect_both(pair, precision="f32", sigma_remap=True)
    correct, visible = _correct_matches(f1, f2, pair[2])
    assert correct > 30, (correct, visible)  # protocol must have signal
    return correct, visible


def test_fp16_match_recall_envelope(pair, f32_baseline):
    """FP16 pyramids must keep >= 90% of the f32 path's correct matches
    (round 3 shipped at ~0.79x and only dtype asserts existed; the
    hardware bar is >= 0.95 OpenCV parity, enforced by perf/parity.py)."""
    correct_f32, vis_f32 = f32_baseline
    f1, f2 = _detect_both(pair, precision="fp16", sigma_remap=True)
    correct, vis = _correct_matches(f1, f2, pair[2])
    recall_f32 = correct_f32 / max(vis_f32, 1)
    recall = correct / max(vis, 1)
    assert recall >= 0.90 * recall_f32, (
        f"fp16 recall {recall:.4f} < 0.90 * f32 recall {recall_f32:.4f} "
        f"({correct}/{vis} vs {correct_f32}/{vis_f32})")


def test_sigma_remap_match_recall_envelope(pair, f32_baseline):
    """Sigma-scaled sampling (ON by default) must keep >= 95% of the
    remap-OFF correct-match recall — it only re-samples top-scale
    keypoints at the next octave's half resolution, so any larger drop is
    a regression (the reference always samples full resolution,
    ComputeDescriptors.comp:131-143)."""
    correct_on, vis_on = f32_baseline  # default = remap on
    f1, f2 = _detect_both(pair, precision="f32", sigma_remap=False)
    correct_off, vis_off = _correct_matches(f1, f2, pair[2])
    recall_on = correct_on / max(vis_on, 1)
    recall_off = correct_off / max(vis_off, 1)
    assert recall_on >= 0.95 * recall_off, (
        f"remap-on recall {recall_on:.4f} < 0.95 * remap-off recall "
        f"{recall_off:.4f} ({correct_on}/{vis_on} vs "
        f"{correct_off}/{vis_off})")
