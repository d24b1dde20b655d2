"""Native IO runtime tests (native/vksift_io.cpp via ctypes).

Builds the shared library on demand (g++); skips if no toolchain.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def nio():
    lib = os.path.join(REPO, "native", "libvksift_io.so")
    if not os.path.exists(lib):
        if shutil.which("g++") is None:
            pytest.skip("no g++ toolchain")
        subprocess.run([os.path.join(REPO, "native", "build.sh")],
                       check=True)
    from vulkansift_tpu.utils import native_io
    assert native_io.available()
    return native_io


def _write_pgm(path, img):
    with open(path, "wb") as f:
        f.write(b"P5\n# comment\n%d %d\n255\n" % (img.shape[1],
                                                  img.shape[0]))
        f.write(img.tobytes())


def _write_ppm(path, rgb):
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (rgb.shape[1], rgb.shape[0]))
        f.write(rgb.tobytes())


def test_pgm_roundtrip(nio, tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64), np.uint8)
    p = str(tmp_path / "a.pgm")
    _write_pgm(p, img)
    out = nio.read_image_gray(p)
    np.testing.assert_array_equal(out, img)


def test_ppm_grayscale_conversion(nio, tmp_path):
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (24, 32, 3), np.uint8)
    p = str(tmp_path / "a.ppm")
    _write_ppm(p, rgb)
    out = nio.read_image_gray(p)
    r64 = rgb.astype(np.int64)
    ref = (299 * r64[..., 0] + 587 * r64[..., 1] + 114 * r64[..., 2]) // 1000
    assert np.abs(out.astype(int) - ref).max() <= 1


def test_decode_failure_raises(nio, tmp_path):
    p = str(tmp_path / "bad.pgm")
    with open(p, "wb") as f:
        f.write(b"NOTPNM")
    with pytest.raises(IOError):
        nio.read_image_gray(p)


def test_prefetch_loader_order_and_content(nio, tmp_path):
    paths = []
    for i in range(16):
        img = np.full((8, 8), i * 3, np.uint8)
        p = str(tmp_path / f"i{i:02d}.pgm")
        _write_pgm(p, img)
        paths.append(p)
    loader = nio.ImageLoader(paths, nb_threads=3, prefetch=5)
    vals = [int(im[0, 0]) for im in loader]
    loader.close()
    assert vals == [i * 3 for i in range(16)]


def test_feature_file_roundtrip(nio, tmp_path):
    from vulkansift_tpu.types import FEATURE_DTYPE
    rng = np.random.default_rng(2)
    f = np.zeros(7, FEATURE_DTYPE)
    f["x"] = rng.random(7).astype(np.float32)
    f["octave_idx"] = rng.integers(-1, 5, 7)
    f["descriptor"] = rng.integers(0, 256, (7, 128))
    p = str(tmp_path / "f.vft")
    nio.save_features(p, f)
    out = nio.load_features(p)
    assert (out == f).all()
    # Empty set round-trips too.
    nio.save_features(p, np.zeros(0, FEATURE_DTYPE))
    assert len(nio.load_features(p)) == 0


def test_python_fallback_matches_native(nio, tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (20, 30), np.uint8)
    p = str(tmp_path / "a.pgm")
    _write_pgm(p, img)
    native = nio.read_image_gray(p)
    fallback = nio._read_pnm_python(p)
    np.testing.assert_array_equal(native, fallback)
