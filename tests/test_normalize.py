"""Statistical normalization + label binarization tests (SURVEY.md §2.2;
reference base_dataset.py:77-113, floodplanet.py:584-597)."""

import numpy as np
import pytest

from floodplanet_code_tpu.data.normalize import (
    binarize_label,
    load_global_norm_params,
    normalize_stats,
    pad_to_shape,
    save_global_norm_params,
)

pytestmark = pytest.mark.smoke  # sub-minute tier: pure functions, no jit-heavy fits


class TestNormalizeStats:
    def test_none_mode_identity(self):
        img = np.random.rand(3, 8, 8).astype(np.float32)
        out, mean, std = normalize_stats(img, None)
        np.testing.assert_allclose(out, img)
        np.testing.assert_allclose(mean, 0)
        np.testing.assert_allclose(std, 1)
        assert mean.shape == (3, 1, 1) and std.shape == (3, 1, 1)

    def test_local_mode_zero_mean_unit_std(self):
        img = (np.random.rand(3, 16, 16) * 10 + 5).astype(np.float32)
        out, mean, std = normalize_stats(img, "local")
        np.testing.assert_allclose(out.mean(axis=(1, 2)), 0, atol=1e-4)
        np.testing.assert_allclose(out.std(axis=(1, 2)), 1, atol=1e-3)
        # Invertibility: mean/std ride along for un-normalization
        # (predict.py:321-322).
        np.testing.assert_allclose(out * std + mean, img, atol=1e-4)

    def test_does_not_mutate_input(self):
        # The reference mutates in place (base_dataset.py:109-111, quirk §7.10).
        img = np.ones((2, 4, 4), dtype=np.float32)
        snapshot = img.copy()
        normalize_stats(img, "local")
        np.testing.assert_array_equal(img, snapshot)

    def test_global_mode(self):
        params = {"S1": {"mean": [0.5, 0.25], "std": [2.0, 4.0]}}
        img = np.ones((2, 4, 4), dtype=np.float32)
        out, mean, std = normalize_stats(
            img, "global", global_params=params, input_type="S1"
        )
        np.testing.assert_allclose(out[0], (1 - 0.5) / 2.0)
        np.testing.assert_allclose(out[1], (1 - 0.25) / 4.0)

    def test_global_requires_params(self):
        with pytest.raises(ValueError):
            normalize_stats(np.ones((1, 2, 2)), "global")

    def test_unknown_mode(self):
        with pytest.raises(NotImplementedError):
            normalize_stats(np.ones((1, 2, 2)), "zscore")


class TestBinarizeLabel:
    def test_value_mapping(self):
        raw = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
        out = binarize_label(raw, ignore_index=255)
        np.testing.assert_array_equal(out, [[255, 0, 1], [1, 0, 255]])

    def test_ignore_zero_conflates_nodata_and_dry(self):
        # The reference default config uses ignore_index=0 (config.yaml:26),
        # conflating nodata with dry land — preserved for parity.
        raw = np.array([[0, 1, 2]], dtype=np.uint8)
        out = binarize_label(raw, ignore_index=0)
        np.testing.assert_array_equal(out, [[0, 0, 1]])

    def test_negative_ignore_survives(self):
        raw = np.array([[0, 1, 2]], dtype=np.uint8)
        out = binarize_label(raw, ignore_index=-1)
        np.testing.assert_array_equal(out, [[-1, 0, 1]])
        assert out.dtype == np.int16


class TestPadToShape:
    def test_pads_2d_with_value(self):
        img = np.ones((3, 4), dtype=np.float32)
        out = pad_to_shape(img, 6, 8, constant_value=-1)
        assert out.shape == (6, 8)
        np.testing.assert_array_equal(out[:3, :4], 1)
        assert (out[3:] == -1).all() and (out[:, 4:] == -1).all()

    def test_pads_3d(self):
        img = np.ones((2, 3, 4), dtype=np.float32)
        out = pad_to_shape(img, 5, 5)
        assert out.shape == (2, 5, 5)
        assert out[:, 3:, :].sum() == 0

    def test_noop_when_large_enough(self):
        img = np.ones((5, 6))
        assert pad_to_shape(img, 3, 3) is img

    def test_bad_ndim(self):
        with pytest.raises(NotImplementedError):
            pad_to_shape(np.ones((1, 1, 1, 1)), 2, 2)


class TestGlobalParamsIO:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "norm.json")
        save_global_norm_params(
            "floodplanet",
            {"S1": {"mean": [1.0, 2.0], "std": [3.0, 4.0]}},
            norm_param_path=path,
        )
        params = load_global_norm_params("floodplanet", norm_param_path=path)
        assert params["S1"]["mean"] == [1.0, 2.0]

    def test_missing_dataset(self, tmp_path):
        path = str(tmp_path / "norm.json")
        save_global_norm_params("other", {}, norm_param_path=path)
        with pytest.raises(KeyError):
            load_global_norm_params("floodplanet", norm_param_path=path)

    def test_reference_pickle_migration(self, tmp_path):
        """The reference's dataset_norm_params.p pickles (ndarray values,
        datasets/utils.py:215-230) load transparently."""
        import pickle

        path = str(tmp_path / "dataset_norm_params.p")
        ref_style = {
            "floodplanet": {
                "PS": {
                    "mean": np.asarray([0.1, 0.2, 0.3, 0.4]),
                    "std": np.asarray([1.0, 1.1, 1.2, 1.3]),
                }
            }
        }
        with open(path, "wb") as handle:
            pickle.dump(ref_style, handle)
        params = load_global_norm_params("floodplanet", norm_param_path=path)
        np.testing.assert_allclose(params["PS"]["mean"], [0.1, 0.2, 0.3, 0.4])
        # Values feed normalize() arithmetic directly.
        image = np.ones((4, 8, 8), np.float32)
        out, mean, std = normalize_stats(
            image, "global", global_params=params, input_type="PS"
        )
        assert out.shape == image.shape
        np.testing.assert_allclose(np.asarray(mean).ravel(), params["PS"]["mean"])
