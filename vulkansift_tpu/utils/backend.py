"""Backend identification helpers.

The TPU may be reached through a PJRT plugin whose registered platform
name is not the canonical ``"tpu"`` (e.g. development tunnels register
under their own name and alias it to the TPU lowering rules).  Every
"am I on a TPU?" formulation switch in the package must go through
:func:`is_tpu_backend` so a plugin name never silently demotes the
pipeline to the generic XLA paths (Pallas kernels, MXU one-hot selects).
"""

from __future__ import annotations

import os

import jax

# Platform names that lower through the TPU (Mosaic) compile path.
_TPU_PLATFORM_NAMES = ("tpu", "axon")


def is_tpu_backend() -> bool:
    """True when the default JAX backend compiles for TPU hardware.

    ``VKSIFT_ASSUME_TPU=1`` forces True: used when AOT-compiling for a
    TPU topology from a CPU host (deviceless compile via
    ``jax.experimental.topologies``), where the *default* backend is CPU
    but the lowering target is the TPU — the formulation switches must
    pick the TPU paths for the compiled program to match hardware runs.
    """
    if os.environ.get("VKSIFT_ASSUME_TPU") == "1":
        return True
    try:
        name = jax.default_backend()
    except RuntimeError:
        return False
    return name.lower() in _TPU_PLATFORM_NAMES
