"""Tiling math tests — behavior contract from SURVEY.md §2.2 (reference
st_water_seg/datasets/utils.py:86-212)."""

import numpy as np
import pytest

from floodplanet_code_tpu.data.tiling import (
    CropParams,
    crop_params_for_scene,
    generate_image_slice_object,
    get_crop_slices,
)

pytestmark = pytest.mark.smoke  # sub-minute tier: pure functions, no jit-heavy fits


def coverage_mask(height, width, slices):
    mask = np.zeros((height, width), dtype=np.int32)
    for h0, w0, h, w in slices:
        mask[h0 : min(h0 + h, height), w0 : min(w0 + w, width)] += 1
    return mask


class TestExactMode:
    def test_perfect_fit_no_remainders(self):
        slices = get_crop_slices(100, 100, 50, 50, step=50, mode="exact")
        assert len(slices) == 4
        assert all(s[2] == 50 and s[3] == 50 for s in slices)

    def test_remainder_tiles_cover_edges(self):
        # 110x130 with 50x50 crops, stride 50: 2x2 interior + right/bottom
        # remainders + corner.
        slices = get_crop_slices(110, 130, 50, 50, step=50, mode="exact")
        interior = [s for s in slices if s[2] == 50 and s[3] == 50]
        assert len(interior) == 4
        # Width remainder tiles: full crop height, ragged width 30.
        right = [s for s in slices if s[3] == 30 and s[2] == 50]
        assert len(right) == 2
        # Height remainder tiles: ragged height 10.
        bottom = [s for s in slices if s[2] == 10 and s[3] == 50]
        assert len(bottom) == 2
        corner = [s for s in slices if s[2] == 10 and s[3] == 30]
        assert len(corner) == 1
        # Full coverage, no overrun.
        mask = coverage_mask(110, 130, slices)
        assert (mask > 0).all()
        for h0, w0, h, w in slices:
            assert h0 + h <= 110 and w0 + w <= 130

    def test_overlap_stride(self):
        # Reference training config: 300x300 crops, stride 150 => 50% overlap.
        slices = get_crop_slices(600, 600, 300, 300, step=150, mode="exact")
        mask = coverage_mask(600, 600, slices)
        assert (mask > 0).all()
        assert mask.max() >= 4  # interior points covered by 4 tiles

    def test_scene_smaller_than_crop(self):
        # Whole scene becomes a single ragged remainder tile.
        slices = get_crop_slices(40, 45, 64, 64, step=None, mode="exact")
        assert slices == [[0, 0, 40, 45]]


class TestOverUnderModes:
    def test_over_covers_with_fixed_size(self):
        slices = get_crop_slices(110, 130, 50, 50, step=50, mode="over")
        assert all(s[2] == 50 and s[3] == 50 for s in slices)
        assert len(slices) == 3 * 3
        mask = coverage_mask(110, 130, slices)
        assert (mask > 0).all()

    def test_under_drops_remainders(self):
        slices = get_crop_slices(110, 130, 50, 50, step=50, mode="under")
        assert all(s[2] == 50 and s[3] == 50 for s in slices)
        assert len(slices) == 2 * 2

    def test_invalid_mode_raises(self):
        with pytest.raises(NotImplementedError):
            get_crop_slices(100, 100, 50, 50, mode="bogus")


class TestStepValidation:
    def test_step_too_large(self):
        with pytest.raises(ValueError):
            get_crop_slices(100, 100, 50, 50, step=200)

    def test_step_nonpositive(self):
        with pytest.raises(ValueError):
            get_crop_slices(100, 100, 50, 50, step=0)

    def test_tuple_step(self):
        slices = get_crop_slices(100, 100, 50, 50, step=(50, 25), mode="under")
        assert len(slices) == 2 * 3

    def test_bad_step_type(self):
        with pytest.raises(TypeError):
            get_crop_slices(100, 100, 50, 50, step=1.5)


class TestCropParams:
    def test_end_coordinates(self):
        cp = CropParams(10, 20, 30, 40, 100, 200, 64, 64)
        assert cp.hE == 40 and cp.wE == 60
        assert cp.og_height == 100 and cp.og_width == 200

    def test_crop_params_for_scene(self):
        sl = generate_image_slice_object(64, stride=32)
        params = crop_params_for_scene(100, 100, sl)
        assert all(p.max_crop_height == 64 for p in params)
        assert all(p.og_height == 100 and p.og_width == 100 for p in params)
        # Edge tiles are smaller than the fixed crop size.
        assert any(p.height < 64 or p.width < 64 for p in params)


class TestImageSlice:
    def test_defaults(self):
        sl = generate_image_slice_object(300)
        assert sl.width == 300 and sl.stride == 300 and sl.scale == 1.0

    def test_explicit(self):
        sl = generate_image_slice_object(300, 200, 150)
        assert (sl.height, sl.width, sl.stride) == (300, 200, 150)
