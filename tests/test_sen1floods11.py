"""Sen1Floods11 dataset tests (data/sen1floods11.py).

The reference's S1F11 cross-validation experiments (BASELINE.md rows 5-6)
used this dataset; its loader code is absent from the snapshot, so these
tests pin the public v1.1 hand-labeled layout and the {-1, 0, 1} label
convention against synthetic chips.
"""

import numpy as np
import pytest

from floodplanet_code_tpu.data import build_dataset, generate_image_slice_object


def make(split, root, **kw):
    sl = generate_image_slice_object(64, stride=64)
    kw.setdefault("sensor", "S1")
    kw.setdefault("ignore_index", -1)
    return build_dataset("sen1floods11", split, sl, root_dir=root, **kw)


@pytest.mark.slow
def test_fit_and_predict_end_to_end(synthetic_s1f11_root, tmp_path):
    """Full leave-region-out fit + predict on the S1F11 layout — the
    pipeline RESULTS.md documents as ready-to-run for the reference's
    Sen1Floods11 cross-validation (blocked only on real chips)."""
    import os

    from floodplanet_code_tpu.config import compose
    from floodplanet_code_tpu.inference.predict import main as predict_main
    from floodplanet_code_tpu.train.fit import fit_model

    cfg = compose(
        overrides=[
            "dataset=sen1floods11",
            "dataset.sensor=S1",
            "eval_region=Bolivia",
            "ignore_index=-1",
            "crop_height=64",
            "crop_width=64",
            "crop_stride=64",
            "batch_size=8",
            "n_epochs=1",
            "n_workers=2",
            "limit_train_batches=2",
            "limit_val_batches=2",
            "tpu.compute_dtype=float32",
            "transforms.rotate.active=false",
        ]
    )
    cfg.dataset["dataset_kwargs"] = {"root_dir": synthetic_s1f11_root}
    exp_dir = str(tmp_path / "s1f11_exp")
    best = fit_model(cfg, overwrite_exp_dir=exp_dir)
    assert best and os.path.exists(best)
    metrics = predict_main(
        [best, "--eval_dataset_split", "test", "--no-predict_images"]
    )
    assert "test_MulticlassJaccardIndex" in metrics
    assert np.isfinite(metrics["test_MulticlassJaccardIndex"])


class TestDiscoveryAndSplits:
    def test_regions_from_filenames(self, synthetic_s1f11_root):
        ds = make("all", synthetic_s1f11_root)
        regions = {e.region_name for e in ds.dataset}
        assert regions == {"Bolivia", "Ghana", "Mekong"}

    def test_leave_region_out(self, synthetic_s1f11_root):
        train = make("train", synthetic_s1f11_root, eval_region="Bolivia")
        valid = make("valid", synthetic_s1f11_root, eval_region="Bolivia")
        assert {e.region_name for e in train.dataset} == {"Ghana", "Mekong"}
        assert {e.region_name for e in valid.dataset} == {"Bolivia"}

    def test_unknown_region_raises(self, synthetic_s1f11_root):
        with pytest.raises(ValueError, match="not found"):
            make("train", synthetic_s1f11_root, eval_region="Atlantis")

    def test_random_split_partitions(self, synthetic_s1f11_root):
        train = make("train", synthetic_s1f11_root, train_split_pct=0.5)
        valid = make("valid", synthetic_s1f11_root, train_split_pct=0.5)
        train_scenes = {e.image_path for e in train.dataset}
        valid_scenes = {e.image_path for e in valid.dataset}
        assert not train_scenes & valid_scenes
        assert len(train_scenes | valid_scenes) == 6


class TestLoading:
    def test_example_shapes_s1(self, synthetic_s1f11_root):
        ds = make("all", synthetic_s1f11_root)
        ex = ds.load_example(0)
        assert ex["image"].shape == (64, 64, 2)
        assert ex["target"].shape == (64, 64)
        assert ds.n_channels == {"ms_image": 2}

    def test_s2_has_13_bands(self, synthetic_s1f11_root):
        ds = make("all", synthetic_s1f11_root, sensor="S2")
        assert ds.n_channels == {"ms_image": 13}
        ex = ds.load_example(0)
        assert ex["image"].shape == (64, 64, 13)

    def test_label_convention(self, synthetic_s1f11_root):
        """Raw {-1, 0, 1} -> {ignore, 0, 1}; -1 nodata never becomes dry."""
        ds = make("all", synthetic_s1f11_root, ignore_index=-1)
        targets = np.concatenate(
            [ds.load_example(i)["target"].ravel() for i in range(len(ds))]
        )
        assert set(np.unique(targets)) <= {-1, 0, 1}
        assert (targets == -1).any()  # nodata present and preserved as ignore

    def test_s1_normalization_range(self, synthetic_s1f11_root):
        ds = make("all", synthetic_s1f11_root)
        img = ds.load_example(0)["image"]
        assert img.min() >= 0.0 and img.max() <= 1.0

    def test_batch_loader_roundtrip(self, synthetic_s1f11_root):
        from floodplanet_code_tpu.data import BatchLoader

        ds = make("all", synthetic_s1f11_root)
        batch = next(iter(BatchLoader(ds, batch_size=4)))
        assert batch["image"].shape == (4, 64, 64, 2)
        # load_batch (native batched reads) must agree with load_example.
        per_example = ds.load_example(0)
        via_batch = ds.load_batch([0])[0]
        np.testing.assert_array_equal(per_example["image"], via_batch["image"])
        np.testing.assert_array_equal(per_example["target"], via_batch["target"])

    def test_multi_sensor_stack(self, synthetic_s1f11_root):
        ds = make("all", synthetic_s1f11_root, sensor="S1+S2")
        assert ds.n_channels == {"ms_image": 15}
        ex = ds.load_example(0)
        assert ex["image"].shape == (64, 64, 15)

    def test_to_rgb(self, synthetic_s1f11_root):
        ds = make("all", synthetic_s1f11_root)
        ex = ds.load_example(0)
        rgb = ds.to_RGB(np.transpose(ex["image"], (2, 0, 1)))
        assert rgb.shape == (64, 64, 3)
