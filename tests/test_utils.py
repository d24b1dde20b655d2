"""Utility coverage: backend identification + parity photo texture."""

import numpy as np

from vulkansift_tpu.utils import backend as backend_mod


def test_is_tpu_backend_false_on_cpu():
    assert backend_mod.is_tpu_backend() is False


def test_is_tpu_backend_accepts_plugin_names(monkeypatch):
    # TPU plugins may register under a non-canonical platform name; the
    # helper must recognize both so "auto" never demotes the pipeline to
    # the generic XLA paths on real hardware.
    for name in ("tpu", "axon", "TPU"):
        monkeypatch.setattr(backend_mod.jax, "default_backend",
                            lambda name=name: name)
        assert backend_mod.is_tpu_backend() is True
    monkeypatch.setattr(backend_mod.jax, "default_backend", lambda: "gpu")
    assert backend_mod.is_tpu_backend() is False


def test_is_tpu_backend_env_override(monkeypatch):
    # Deviceless AOT compiles (scripts/aotcheck.py) force the TPU
    # formulations from a CPU host via VKSIFT_ASSUME_TPU=1.
    monkeypatch.setenv("VKSIFT_ASSUME_TPU", "1")
    assert backend_mod.is_tpu_backend() is True


def test_photo_texture_real_image():
    from vulkansift_tpu.perf.parity import _photo

    img = _photo(480, 640, seed=3)
    assert img.shape == (480, 640)
    assert img.dtype == np.uint8
    # A real photograph: substantial dynamic range and local structure.
    assert img.std() > 20
    a = _photo(480, 640, seed=1)
    b = _photo(480, 640, seed=2)
    assert not np.array_equal(a, b)  # seed varies the crop
