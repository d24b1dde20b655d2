"""Config parity tests (reference: vulkansift.c:550-584, sift_memory.c:15-87)."""

import dataclasses
import math

import pytest

from vulkansift_tpu import InvalidConfigError, SiftConfig, get_default_config
from vulkansift_tpu.config import DescriptorFormat, PyramidPrecision


def test_defaults_match_reference():
    # Parity: vksift_getDefaultConfig (vulkansift.c:47-64).
    c = get_default_config()
    assert c.input_image_max_size == 1920 * 1080
    assert c.sift_buffer_count == 2
    assert c.max_nb_sift_per_buffer == 100_000
    assert c.use_input_upsampling is True
    assert c.nb_octaves == 0
    assert c.nb_scales_per_octave == 3
    assert c.input_image_blur_level == 0.5
    assert c.seed_scale_sigma == 1.6
    assert c.intensity_threshold == 0.04
    assert c.edge_threshold == 10.0
    assert c.max_nb_orientation_per_keypoint == 4
    assert c.descriptor_format == DescriptorFormat.UBC
    assert c.pyramid_precision == PyramidPrecision.FLOAT32
    c.validate()


@pytest.mark.parametrize("field,value", [
    ("input_image_max_size", 512),
    ("sift_buffer_count", 0),
    ("max_nb_sift_per_buffer", 0),
    ("nb_scales_per_octave", 0),
    ("input_image_blur_level", -0.1),
    ("seed_scale_sigma", -1.0),
    ("intensity_threshold", -0.01),
    ("edge_threshold", -1.0),
])
def test_validation_rejects(field, value):
    c = dataclasses.replace(get_default_config(), **{field: value})
    with pytest.raises(InvalidConfigError):
        c.validate()


def test_cross_field_seed_constraint():
    # (2x if upsampling) * input_blur <= seed_sigma (vulkansift.c:553).
    c = SiftConfig(use_input_upsampling=True, input_image_blur_level=0.9,
                   seed_scale_sigma=1.6)
    with pytest.raises(InvalidConfigError):
        c.validate()
    SiftConfig(use_input_upsampling=False, input_image_blur_level=0.9,
               seed_scale_sigma=1.6).validate()


def test_octave_count():
    # log2(min_dim) - 4 (+1 when upsampling) (sift_memory.c:15-27).
    c = SiftConfig(use_input_upsampling=False)
    assert c.max_octaves_for(640, 480) == int(math.log2(480)) - 4
    cu = SiftConfig(use_input_upsampling=True)
    assert cu.max_octaves_for(640, 480) == int(math.log2(480)) - 4 + 1
    # nb_octaves caps it
    c8 = SiftConfig(nb_octaves=2)
    assert c8.max_octaves_for(640, 480) == 2
    # never below 1
    assert SiftConfig(use_input_upsampling=False).max_octaves_for(33, 33) >= 1


def test_octave_resolutions():
    c = SiftConfig(use_input_upsampling=True)
    res = c.octave_resolutions(640, 480)
    assert res[0] == (1280, 960)
    assert res[1] == (640, 480)
    for (w0, h0), (w1, h1) in zip(res, res[1:]):
        assert w1 == w0 // 2 and h1 == h0 // 2


def test_section_capacities_sum():
    # Geometric halves, sum == max_nb_sift (sift_memory.c:40-87).
    c = SiftConfig(max_nb_sift_per_buffer=10_000)
    caps = c.octave_section_capacities(5)
    assert len(caps) == 5
    assert all(caps[i] >= caps[i + 1] for i in range(4))
    assert abs(sum(caps) - 10_000) <= 5  # floor rounding slack
    assert sum(caps) <= 10_000


def test_dog_threshold_division():
    # Threshold divided by nb_scales at use (sift_detector.c:1136).
    c = SiftConfig(intensity_threshold=0.06, nb_scales_per_octave=3)
    assert c.dog_threshold == pytest.approx(0.02)
