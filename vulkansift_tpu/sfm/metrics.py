"""Trajectory evaluation metrics for the SfM back-end.

The BASELINE north star asks for "trajectory ATE within bound" on the
synthetic sequences. ATE (absolute trajectory error) follows the standard
TUM-RGBD protocol: align the estimated camera centers to ground truth
with a closed-form similarity transform (Umeyama alignment — monocular
reconstructions are defined up to Sim(3)), then report the RMSE of the
residual center distances.

No reference equivalent (the reference has no SfM); protocol follows
Umeyama 1991 / Sturm et al. 2012.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp

from .geometry import SE3


def camera_centers(pose_tangents: np.ndarray) -> np.ndarray:
    """(C, 6) world->cam SE(3) tangents -> (C, 3) camera centers."""
    centers = []
    for t in np.asarray(pose_tangents):
        se3 = SE3.from_tangent(jnp.asarray(t))
        r = np.asarray(se3.r)
        tt = np.asarray(se3.t)
        centers.append(-r.T @ tt)
    return np.stack(centers)


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = True
                      ) -> Tuple[float, np.ndarray, np.ndarray]:
    """Closed-form similarity (s, R, t) minimizing ||dst - (s R src + t)||.

    Umeyama (1991), eq. 34-43. src/dst are (N, 3), N >= 3 non-degenerate.
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    u, d, vt = np.linalg.svd(cov)
    s_fix = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s_fix[2, 2] = -1.0
    rot = u @ s_fix @ vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        scale = float(np.trace(np.diag(d) @ s_fix) / max(var_s, 1e-18))
    else:
        scale = 1.0
    trans = mu_d - scale * rot @ mu_s
    return scale, rot, trans


def absolute_trajectory_error(est_pose_tangents: np.ndarray,
                              gt_pose_tangents: np.ndarray,
                              with_scale: bool = True) -> float:
    """ATE RMSE (in ground-truth units) after Sim(3) (or SE(3)) alignment
    of the estimated camera-center trajectory to ground truth."""
    est = camera_centers(est_pose_tangents)
    gt = camera_centers(gt_pose_tangents)
    if len(est) != len(gt):
        raise ValueError("trajectory length mismatch")
    s, r, t = umeyama_alignment(est, gt, with_scale=with_scale)
    aligned = (s * (r @ est.T)).T + t
    return float(np.sqrt(((aligned - gt) ** 2).sum(axis=1).mean()))
