"""Differential tests vs OpenCV SIFT — the UBC-format oracle.

Mirrors the reference's quality strategy: cross-implementation benchmarking
on homography-ground-truth pairs (reference: src/perf/perf_matching.cpp:5,
:30-79 — correct match = within 2.5 px of the homography-projected point,
Lowe ratio 0.75). The Oxford dataset is not available offline, so pairs are
synthesized with cv2.warpPerspective, which preserves the protocol.
"""

import cv2
import numpy as np
import pytest

import vulkansift_tpu as vs
from vulkansift_tpu.ops.match import lowe_ratio_mask, match_2nn

import jax.numpy as jnp

PIXEL_THR = 2.5
LOWE = 0.75


def _textured_image(h=480, w=640, seed=42):
    rng = np.random.default_rng(seed)
    img = rng.random((h // 8, w // 8))
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    img += 0.5 * cv2.resize(rng.random((h // 32, w // 32)), (w, h),
                            interpolation=cv2.INTER_CUBIC)
    img = cv2.GaussianBlur(img, (0, 0), 1.0)
    img -= img.min()
    return (255 * img / img.max()).astype(np.uint8)


def _homography(angle_deg=12.0, scale=0.9, tx=18.0, ty=-10.0, w=640, h=480):
    c, s = np.cos(np.radians(angle_deg)), np.sin(np.radians(angle_deg))
    cx, cy = w / 2, h / 2
    T1 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]])
    R = np.array([[scale * c, -scale * s, 0],
                  [scale * s, scale * c, 0], [0, 0, 1]])
    T2 = np.array([[1, 0, cx + tx], [0, 1, cy + ty], [0, 0, 1]])
    return (T2 @ R @ T1).astype(np.float64)


def _project(H, xy):
    p = np.concatenate([xy, np.ones((len(xy), 1))], axis=1) @ H.T
    return p[:, :2] / p[:, 2:3]


@pytest.fixture(scope="module")
def pair():
    img1 = _textured_image()
    H = _homography()
    img2 = cv2.warpPerspective(img1, H, (640, 480))
    return img1, img2, H


def _our_features(img, inst, buf):
    inst.detect_features(img, buf)
    return inst.download_features(buf)


def _match_precision(xy_a, xy_b, desc_a, desc_b, H):
    """Fraction of Lowe-filtered matches within PIXEL_THR of ground truth."""
    m = match_2nn(jnp.asarray(desc_a), jnp.asarray(len(desc_a)),
                  jnp.asarray(desc_b), jnp.asarray(len(desc_b)))
    keep = np.asarray(lowe_ratio_mask(m, LOWE))
    ia = np.asarray(m.idx_a)[keep]
    ib = np.asarray(m.idx_b1)[keep]
    if len(ia) == 0:
        return 0.0, 0
    proj = _project(H, xy_a[ia])
    err = np.linalg.norm(proj - xy_b[ib], axis=1)
    return float((err < PIXEL_THR).mean()), int(len(ia))


@pytest.fixture(scope="module")
def instance():
    cfg = vs.SiftConfig(use_input_upsampling=True,
                        max_nb_sift_per_buffer=16384,
                        sift_buffer_count=2)
    with vs.SiftInstance(cfg) as inst:
        yield inst


@pytest.mark.heavy
def test_keypoint_repeatability_vs_opencv(pair, instance):
    """Our keypoints on a warped pair must be as repeatable as OpenCV's."""
    img1, img2, H = pair

    def repeatability(xy1, xy2):
        proj = _project(H, xy1)
        inb = ((proj[:, 0] >= 0) & (proj[:, 0] < 640)
               & (proj[:, 1] >= 0) & (proj[:, 1] < 480))
        proj = proj[inb]
        if len(proj) == 0 or len(xy2) == 0:
            return 0.0
        d = np.linalg.norm(proj[:, None, :] - xy2[None, :, :], axis=2)
        return float((d.min(axis=1) < PIXEL_THR).mean())

    f1 = _our_features(img1, instance, 0)
    f2 = _our_features(img2, instance, 1)
    ours1 = np.stack([f1["x"], f1["y"]], axis=1)
    ours2 = np.stack([f2["x"], f2["y"]], axis=1)
    rep_ours = repeatability(ours1, ours2)

    sift = cv2.SIFT_create()
    kp1 = sift.detect(img1, None)
    kp2 = sift.detect(img2, None)
    cv1 = np.array([k.pt for k in kp1])
    cv2_pts = np.array([k.pt for k in kp2])
    rep_cv = repeatability(cv1, cv2_pts)

    assert len(ours1) > 100
    assert rep_ours >= 0.9 * rep_cv, (rep_ours, rep_cv)


@pytest.mark.heavy
def test_match_precision_vs_opencv(pair, instance):
    """Lowe-filtered match precision >= 95% of OpenCV's on the same pair."""
    img1, img2, H = pair
    f1 = _our_features(img1, instance, 0)
    f2 = _our_features(img2, instance, 1)
    prec_ours, n_ours = _match_precision(
        np.stack([f1["x"], f1["y"]], 1), np.stack([f2["x"], f2["y"]], 1),
        f1["descriptor"], f2["descriptor"], H)

    sift = cv2.SIFT_create()
    kp1, d1 = sift.detectAndCompute(img1, None)
    kp2, d2 = sift.detectAndCompute(img2, None)
    d1u = np.clip(d1, 0, 255).astype(np.uint8)
    d2u = np.clip(d2, 0, 255).astype(np.uint8)
    prec_cv, n_cv = _match_precision(
        np.array([k.pt for k in kp1]), np.array([k.pt for k in kp2]),
        d1u, d2u, H)

    assert n_ours > 50
    assert prec_ours >= 0.95 * prec_cv, (prec_ours, prec_cv, n_ours, n_cv)


@pytest.mark.heavy
def test_cross_matching_with_opencv_descriptors(pair, instance):
    """UBC-format parity: OUR descriptors on img1 matched against OPENCV
    descriptors on img2 must still produce geometrically-correct matches —
    the strongest test that the descriptor layout/semantics line up."""
    img1, img2, H = pair
    f1 = _our_features(img1, instance, 0)
    sift = cv2.SIFT_create()
    kp2, d2 = sift.detectAndCompute(img2, None)
    d2u = np.clip(d2, 0, 255).astype(np.uint8)
    prec, n = _match_precision(
        np.stack([f1["x"], f1["y"]], 1), np.array([k.pt for k in kp2]),
        f1["descriptor"], d2u, H)
    assert n > 30
    assert prec > 0.5, (prec, n)
