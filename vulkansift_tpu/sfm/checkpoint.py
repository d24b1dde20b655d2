"""SfM state checkpointing (SURVEY.md §5.4).

The reference's only persistence surface is the feature round-trip
(vksift_download/uploadFeatures); feature files are handled by the native
IO runtime (utils/native_io.py). The NEW SfM state (poses, landmarks,
costs) checkpoints as a self-contained directory (npz arrays + json
metadata) that :func:`load_reconstruction` restores exactly. The arrays
are tiny (poses + points), so a plain npz is the whole design — no
checkpointing framework needed.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from .reconstruction import Reconstruction

_META = "sfm_meta.json"
_ARRAYS = "sfm_arrays.npz"


def save_reconstruction(path: str, rec: Reconstruction) -> None:
    """Checkpoint a reconstruction into directory ``path``."""
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, _ARRAYS),
             poses=rec.poses, points=rec.points,
             point_valid=rec.point_valid)
    with open(os.path.join(path, _META), "w") as f:
        json.dump({"initial_cost": rec.initial_cost,
                   "final_cost": rec.final_cost,
                   "nb_cameras": int(rec.poses.shape[0]),
                   "nb_points": int(rec.points.shape[0]),
                   "format": 1}, f)


def load_reconstruction(path: str) -> Reconstruction:
    """Restore a reconstruction checkpointed by :func:`save_reconstruction`."""
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    if meta.get("format") != 1:
        raise ValueError(f"unsupported checkpoint format in {path}")
    arrays = np.load(os.path.join(path, _ARRAYS))
    return Reconstruction(
        poses=arrays["poses"], points=arrays["points"],
        point_valid=arrays["point_valid"],
        initial_cost=float(meta["initial_cost"]),
        final_cost=float(meta["final_cost"]))
