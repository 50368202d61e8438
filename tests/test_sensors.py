"""Per-sensor normalization / channel handling tests (SURVEY.md §2.2;
reference st_water_seg/datasets/floodplanet.py:288-527)."""

import numpy as np
import pytest

from floodplanet_code_tpu.data.sensors import (
    L8_MAX_REFLECTANCE,
    ensure_chw,
    get_n_channels,
    make_to_rgb_fn,
    normalize_sensor_range,
    select_channels,
    sensor_n_channels,
    to_rgb,
)

pytestmark = pytest.mark.smoke  # sub-minute tier: pure functions, no jit-heavy fits


class TestRangeNormalization:
    def test_s1_maps_minus50_to_zero(self):
        img = np.array([[[-50.0, 0.0, 50.0, 60.0, -70.0]]], dtype=np.float32)
        out = normalize_sensor_range(img, "S1")
        np.testing.assert_allclose(out[0, 0], [0.0, 0.5, 1.0, 1.0, 0.0])

    def test_s1_nan_scrub(self):
        img = np.array([[[np.nan, 10.0]]], dtype=np.float32)
        out = normalize_sensor_range(img, "S1")
        assert np.isfinite(out).all()
        assert out[0, 0, 0] == 0.0

    def test_s2_divides_by_2_12(self):
        img = np.array([[[0, 2048, 4096, 8192]]], dtype=np.uint16)
        out = normalize_sensor_range(img, "S2")
        np.testing.assert_allclose(out[0, 0], [0.0, 0.5, 1.0, 1.0])

    def test_ps_uint16_scales(self):
        img = np.full((4, 2, 2), 2**15, dtype=np.uint16)
        out = normalize_sensor_range(img, "PS")
        np.testing.assert_allclose(out, 0.5)

    def test_ps_float_passthrough(self):
        img = np.full((4, 2, 2), 0.25, dtype=np.float32)
        out = normalize_sensor_range(img, "PS")
        np.testing.assert_allclose(out, 0.25)

    def test_l8_empirical_ceiling(self):
        img = np.array([[[0.0, L8_MAX_REFLECTANCE, 30000.0]]], dtype=np.float32)
        out = normalize_sensor_range(img, "L8")
        np.testing.assert_allclose(out[0, 0], [0.0, 1.0, 1.0])

    def test_unknown_sensor(self):
        with pytest.raises(NotImplementedError):
            normalize_sensor_range(np.zeros((1, 2, 2)), "MODIS")


class TestChannelSelection:
    def test_s2_rgb_band_order(self):
        img = np.arange(10, dtype=np.float32).reshape(10, 1, 1)
        out = select_channels(img, "S2", "RGB")
        assert out[:, 0, 0].tolist() == [3, 2, 1]

    def test_s2_rgb_nir(self):
        img = np.arange(10, dtype=np.float32).reshape(10, 1, 1)
        out = select_channels(img, "S2", "RGB_NIR")
        assert out[:, 0, 0].tolist() == [3, 2, 1, 7]

    def test_ps_rgb_nir(self):
        img = np.arange(4, dtype=np.float32).reshape(4, 1, 1)
        out = select_channels(img, "PS", "RGB_NIR")
        assert out[:, 0, 0].tolist() == [2, 1, 0, 3]

    def test_ps_all_trims_extra_bands(self):
        img = np.arange(6, dtype=np.float32).reshape(6, 1, 1)
        out = select_channels(img, "PS", "ALL")
        assert out.shape[0] == 4

    def test_s1_all_trims_to_two(self):
        img = np.arange(3, dtype=np.float32).reshape(3, 1, 1)
        out = select_channels(img, "S1", "ALL")
        assert out.shape[0] == 2

    def test_s1_subset_unsupported(self):
        with pytest.raises(NotImplementedError):
            select_channels(np.zeros((2, 1, 1)), "S1", "RGB")


class TestChannelCounts:
    @pytest.mark.parametrize(
        "sensor,channels,expected",
        [
            ("S2", "RGB", 3),
            ("S2", "RGB_NIR", 4),
            ("S2", "ALL", 10),
            ("PS", "RGB", 3),
            ("PS", "ALL", 4),
            ("S1", "ALL", 2),
            ("L8", "ALL", 7),
        ],
    )
    def test_table(self, sensor, channels, expected):
        assert sensor_n_channels(sensor, channels) == expected

    def test_invalid(self):
        with pytest.raises(NotImplementedError):
            sensor_n_channels("S1", "RGB")

    def test_aux_features(self):
        n = get_n_channels("PS", "ALL", dem=True, slope=True, hand=True)
        assert n == {"ms_image": 4, "dem": 1, "slope": 1, "hand": 1}
        n = get_n_channels("S1", "ALL", preflood=True, pre_post_difference=True)
        assert n == {
            "ms_image": 2,
            "preflood": 2,
            "pre_post_difference": 2,
        }


class TestLayout:
    def test_ensure_chw_transposes_hwc(self):
        hwc = np.zeros((100, 120, 4), dtype=np.float32)
        out = ensure_chw(hwc)
        assert out.shape == (4, 100, 120)

    def test_ensure_chw_keeps_chw(self):
        chw = np.zeros((4, 100, 120), dtype=np.float32)
        assert ensure_chw(chw).shape == (4, 100, 120)

    def test_ensure_chw_2d(self):
        assert ensure_chw(np.zeros((10, 12))).shape == (1, 10, 12)


class TestToRGB:
    def test_ps_all_band_order_and_gamma(self):
        img = np.zeros((4, 2, 2), dtype=np.float32)
        img[2] = 0.25  # red channel for PS/ALL
        rgb = to_rgb(img, "PS", "ALL")
        assert rgb.shape == (2, 2, 3)
        np.testing.assert_allclose(rgb[..., 0], 0.25**0.6)
        np.testing.assert_allclose(rgb[..., 1], 0.0)

    def test_s1_duplicates_vh(self):
        img = np.stack([np.full((2, 2), 0.3), np.full((2, 2), 0.7)])
        rgb = to_rgb(img.astype(np.float32), "S1", "ALL")
        np.testing.assert_allclose(rgb[..., 1], rgb[..., 2])

    def test_bound_fn(self):
        fn = make_to_rgb_fn("S2", "ALL")
        rgb = fn(np.random.rand(10, 4, 4).astype(np.float32))
        assert rgb.shape == (4, 4, 3)
