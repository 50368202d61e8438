"""Offline tooling tests (floodplanet_code_tpu/tools — reference misc/)."""

import os

import numpy as np
import pytest

from floodplanet_code_tpu.tools.compute_feature_stats import compute_feature_stats
from floodplanet_code_tpu.tools.compute_norm_params import compute_norm_params
from floodplanet_code_tpu.tools.delete_failed_experiments import (
    delete_failed_experiments,
)
from floodplanet_code_tpu.tools.generate_dataset_visualizations import (
    generate_dataset_visualizations,
)

pytestmark = pytest.mark.smoke  # sub-minute tier: pure functions, no jit-heavy fits


class TestNormParams:
    def test_compute_and_save(self, synthetic_csdap_root, tmp_path):
        params = compute_norm_params(
            "floodplanet",
            "PS",
            root_dir=synthetic_csdap_root,
            pct_sample=1.0,
        )
        assert len(params["mean"]) == 4
        assert len(params["std"]) == 4
        assert all(s > 0 for s in params["std"])
        assert params["n_scenes"] == 6

    def test_global_norm_flows_into_dataset(self, synthetic_csdap_root, tmp_path):
        from floodplanet_code_tpu.data import (
            FloodPlanetDataset,
            generate_image_slice_object,
        )
        from floodplanet_code_tpu.data.normalize import save_global_norm_params

        params = compute_norm_params(
            "floodplanet", "PS", root_dir=synthetic_csdap_root, pct_sample=1.0
        )
        path = str(tmp_path / "norm.json")
        save_global_norm_params(
            "floodplanet",
            {"PS": {"mean": params["mean"], "std": params["std"]}},
            norm_param_path=path,
        )
        ds = FloodPlanetDataset(
            synthetic_csdap_root,
            "train",
            generate_image_slice_object(64, stride=64),
            sensor="PS",
            norm_mode="global",
            norm_param_path=path,
            ignore_index=0,
        )
        ex = ds.load_example(0)
        np.testing.assert_allclose(
            ex["mean"][0, 0], np.asarray(params["mean"]), rtol=1e-5
        )


class TestFeatureStats:
    def test_stats_keys(self, synthetic_csdap_root):
        stats = compute_feature_stats(
            "floodplanet", "S1", root_dir=synthetic_csdap_root, max_examples=8
        )
        assert "image" in stats
        for key in ("min", "max", "pct_5", "pct_95", "mean", "std"):
            assert key in stats["image"]
        assert stats["image"]["min"] <= stats["image"]["pct_5"]
        assert stats["image"]["pct_95"] <= stats["image"]["max"]


class TestVisualizations:
    def test_gifs_written(self, synthetic_csdap_root, tmp_path):
        written = generate_dataset_visualizations(
            "floodplanet",
            "PS",
            str(tmp_path / "viz"),
            root_dir=synthetic_csdap_root,
        )
        assert len(written) == 6
        assert all(os.path.exists(p) for p in written)


class TestExperimentGC:
    def test_deletes_empty_runs_keeps_healthy(self, tmp_path):
        outputs = tmp_path / "outputs" / "2026-01-01"
        failed = outputs / "failed_run"
        failed.mkdir(parents=True)
        (failed / "hydra").mkdir()
        healthy = outputs / "healthy_run"
        (healthy / "checkpoints" / "model-x").mkdir(parents=True)
        (healthy / "hydra").mkdir()
        (healthy / "tensorboard_logs").mkdir()
        deleted = delete_failed_experiments(str(tmp_path / "outputs"))
        assert str(failed) in deleted
        assert not failed.exists()
        assert healthy.exists()

    def test_dry_run(self, tmp_path):
        outputs = tmp_path / "outputs" / "d"
        failed = outputs / "r"
        failed.mkdir(parents=True)
        deleted = delete_failed_experiments(
            str(tmp_path / "outputs"), dry_run=True
        )
        assert deleted and failed.exists()
