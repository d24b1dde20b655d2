"""Instance API tests: lifecycle, error contract, buffer management,
feature/match round-trips (reference: vulkansift.c, test_sift_error_handling
.cpp semantics)."""

import dataclasses
import numpy as np
import pytest

import vulkansift_tpu as vs


@pytest.fixture(scope="module")
def instance():
    cfg = vs.SiftConfig(use_input_upsampling=False,
                        max_nb_sift_per_buffer=8192,
                        sift_buffer_count=3,
                        input_image_max_size=1920 * 1080)
    with vs.SiftInstance(cfg) as inst:
        yield inst


def test_runtime_probe():
    assert vs.load_runtime() == vs.Result.SUCCESS
    assert len(vs.get_available_devices()) >= 1
    vs.unload_runtime()


@pytest.mark.heavy
def test_error_callback_and_invalid_inputs(instance, blob_image):
    seen = []
    inst = vs.SiftInstance(
        vs.SiftConfig(use_input_upsampling=False, sift_buffer_count=1,
                      max_nb_sift_per_buffer=1024),
        on_error=lambda r: seen.append(r))
    # Invalid buffer index (parity: test_sift_error_handling.cpp:49-69).
    with pytest.raises(vs.InvalidInputError):
        inst.detect_features(blob_image, 5)
    assert seen[-1] == vs.Result.INVALID_INPUT_ERROR
    # Bad dtype / shape.
    with pytest.raises(vs.InvalidInputError):
        inst.detect_features(blob_image.astype(np.float32), 0)
    with pytest.raises(vs.InvalidInputError):
        inst.detect_features(np.zeros((8, 8), np.uint8), 0)
    # Over max size.
    big = np.zeros((2000, 2000), np.uint8)
    with pytest.raises(vs.InvalidInputError):
        inst.detect_features(big, 0)
    # Instance remains usable after INVALID_INPUT errors.
    inst.detect_features(blob_image[:128, :128].copy(), 0)
    assert inst.get_features_number(0) >= 0
    inst.close()
    with pytest.raises(vs.InvalidInputError):
        inst.get_features_number(0)


def test_invalid_config_rejected():
    with pytest.raises(vs.InvalidConfigError):
        vs.SiftInstance(vs.SiftConfig(sift_buffer_count=0))


@pytest.mark.heavy
def test_detect_download_roundtrip(instance, blob_image):
    instance.detect_features(blob_image, 0)
    n = instance.get_features_number(0)
    assert n > 10
    feats = instance.download_features(0)
    assert feats.dtype == vs.FEATURE_DTYPE
    assert feats.shape == (n,)
    # Upload into another buffer and match: identical sets self-match.
    instance.upload_features(feats, 1)
    assert instance.get_features_number(1) == n
    instance.match_features(0, 1)
    assert instance.get_matches_number() == n
    m = instance.download_matches()
    assert m.dtype == vs.MATCH_DTYPE
    np.testing.assert_array_equal(m["idx_b1"], m["idx_a"])
    np.testing.assert_allclose(m["dist_a_b1"], 0.0)
    assert (m["dist_a_b2"] >= m["dist_a_b1"]).all()


@pytest.mark.heavy
def test_multi_buffer_independence(instance, blob_image):
    img2 = blob_image[::-1].copy()
    instance.detect_features(blob_image, 0)
    n0 = instance.get_features_number(0)
    instance.detect_features(img2, 2)
    assert instance.get_features_number(0) == n0  # buffer 0 untouched
    # is_buffer_available is a non-blocking poll; a blocking download acts
    # as the fence wait after which it must report available.
    instance.download_features(0)
    assert instance.is_buffer_available(0)


def test_scale_space_access(instance, blob_image):
    instance.detect_features(blob_image, 0)
    nb_oct = instance.get_scale_space_nb_octaves(0)
    assert nb_oct >= 3
    h, w = blob_image.shape
    res0 = instance.get_scale_space_octave_resolution(0, 0)
    assert res0 == (w, h)  # no upsampling in this config
    img = instance.download_scale_space_image(0, 0, 0)
    assert img.shape == (h, w) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    dog = instance.download_dog_image(0, 0, 0)
    assert dog.shape == (h, w)
    with pytest.raises(vs.InvalidInputError):
        instance.download_scale_space_image(nb_oct + 1, 0, 0)
    with pytest.raises(vs.InvalidInputError):
        instance.download_dog_image(0, 99, 0)


@pytest.mark.heavy
def test_match_count_snapshot_immune_to_redetect(instance, blob_image):
    """Multi-buffer pipelining: the match count is a snapshot of buffer A's
    count at match dispatch; re-detecting into A before the download must
    NOT change it (regression: stale-source count resync)."""
    instance.detect_features(blob_image, 0)
    n_a = instance.get_features_number(0)
    instance.detect_features(blob_image[::-1].copy(), 1)
    instance.match_features(0, 1)
    # Overwrite buffer A with a much smaller image before reading matches.
    instance.detect_features(blob_image[:128, :128].copy(), 0)
    assert instance.get_features_number(0) != n_a  # precondition
    assert instance.get_matches_number() == n_a
    m = instance.download_matches()
    assert m.shape == (n_a,)


def test_upload_invalidates_scale_space_metadata(instance, blob_image):
    """After upload_features the buffer holds no scale-space: the octave
    debug APIs must not answer for the previously-detected image."""
    instance.detect_features(blob_image, 0)
    assert instance.get_scale_space_nb_octaves(0) >= 3
    feats = instance.download_features(0)
    instance.upload_features(feats, 0)
    assert instance.get_features_number(0) == len(feats)
    assert instance.get_scale_space_nb_octaves(0) == 0
    with pytest.raises(vs.InvalidInputError):
        instance.get_scale_space_octave_resolution(0, 0)
    with pytest.raises(vs.InvalidInputError):
        instance.download_scale_space_image(0, 0, 0)


@pytest.mark.heavy
def test_bucketed_octave_reporting_consistent(blob_image):
    """Under resolution bucketing the debug APIs report the octave plan the
    pipeline actually ran (== len(per_octave_counts)), not a recompute from
    the exact resolution (which can be one octave more)."""
    cfg = vs.SiftConfig(use_input_upsampling=False,
                        max_nb_sift_per_buffer=2048, sift_buffer_count=1,
                        resolution_bucket=64, retain_pyramid=False)
    inst = vs.SiftInstance(cfg)
    img = blob_image[:452, :610]  # pads up to 512 x 640
    inst.detect_features(img, 0)
    inst.get_features_number(0)  # sync
    buf = inst._buffers[0]
    nb = inst.get_scale_space_nb_octaves(0)
    assert nb == len(buf.per_octave_counts)
    for o in range(nb):
        w, h = inst.get_scale_space_octave_resolution(o, 0)
        assert w >= 1 and h >= 1
    with pytest.raises(vs.InvalidInputError):
        inst.get_scale_space_octave_resolution(nb, 0)
    inst.close()


def test_feature_numpy_layout_bit_compat():
    # vksift_Feature: 9 x 4-byte header fields + 128 descriptor bytes = 164
    # (reference: include/vulkansift/vulkansift_types.h:17-31).
    assert vs.FEATURE_DTYPE.itemsize == 164
    assert vs.MATCH_DTYPE.itemsize == 20  # 3 u32 + 2 f32


@pytest.mark.heavy
def test_auto_bucketing_default(blob_image):
    """resolution_bucket=0 (the default): the first two distinct
    resolutions compile exact programs; a third NEW resolution switches to
    a bucket-64 program, bounding compiles for mixed-resolution sweeps."""
    cfg = vs.SiftConfig(use_input_upsampling=False,
                        max_nb_sift_per_buffer=2048,
                        sift_buffer_count=1,
                        input_image_max_size=1 << 22)
    assert cfg.resolution_bucket == 0
    inst = vs.SiftInstance(cfg)
    imgs = [blob_image[:128, :160], blob_image[:120, :150],
            blob_image[:110, :140], blob_image[:105, :130]]
    for img in imgs:
        inst.detect_features(img, 0)
        assert inst.get_features_number(0) >= 0
    keys = list(inst._detect_cache)
    # Two exact programs + ONE shared bucketed program (all later
    # resolutions pad to the same 192x128 bucket).
    assert [k[2] for k in keys] == [False, False, True]
    assert keys[2][:2] == (192, 128)
    # Exact resolutions keep hitting their exact programs.
    inst.detect_features(imgs[0], 0)
    assert len(inst._detect_cache) == 3
    inst.close()


@pytest.mark.heavy
def test_resolution_bucketing_bounds_compiles(blob_image):
    """resolution_bucket > 1: images in the same bucket share one compiled
    pipeline; detected keypoints stay inside the true image region and
    roughly agree with exact-resolution detection."""
    cfg = vs.SiftConfig(use_input_upsampling=False,
                        max_nb_sift_per_buffer=4096,
                        sift_buffer_count=2,
                        input_image_max_size=1 << 22,
                        resolution_bucket=64)
    inst = vs.SiftInstance(cfg)
    img1 = blob_image                       # 480 x 640 -> bucket 512 x 640
    img2 = blob_image[:452, :610]           # same bucket
    inst.detect_features(img1, 0)
    inst.detect_features(img2, 1)
    assert len(inst._detect_cache) == 1     # one executable for the bucket

    f1 = inst.download_features(0)
    f2 = inst.download_features(1)
    assert len(f1) > 20
    assert float(f1["x"].max()) < 640 and float(f1["y"].max()) < 480
    assert float(f2["x"].max()) < 610 and float(f2["y"].max()) < 452

    exact = vs.SiftInstance(dataclasses.replace(cfg, resolution_bucket=1))
    exact.detect_features(img1, 0)
    fe = exact.download_features(0)
    # Padding only perturbs detection near the replicated border; interior
    # content matches, so counts should agree within ~15%.
    assert abs(len(f1) - len(fe)) <= max(0.15 * len(fe), 8)
    inst.close()
    exact.close()
