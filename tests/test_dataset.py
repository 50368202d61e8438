"""Dataset + loader tests over the synthetic CSDAP-layout tree
(reference behaviors: floodplanet.py:19-658; SURVEY.md §2.2)."""

import numpy as np
import pytest

from floodplanet_code_tpu.data import (
    BatchLoader,
    FloodPlanetDataset,
    generate_image_slice_object,
)


def make_dataset(root, split="train", **kwargs):
    defaults = dict(
        slice_params=generate_image_slice_object(64, stride=32),
        sensor="PS",
        channels="ALL",
        ignore_index=0,
        seed_num=0,
    )
    defaults.update(kwargs)
    return FloodPlanetDataset(root, split, **defaults)


class TestSplits:
    def test_leave_region_out(self, synthetic_csdap_root):
        train = make_dataset(
            synthetic_csdap_root, "train", eval_region="RegionA"
        )
        valid = make_dataset(
            synthetic_csdap_root, "valid", eval_region="RegionA"
        )
        train_regions = {e.region_name for e in train.dataset}
        valid_regions = {e.region_name for e in valid.dataset}
        assert "RegionA" not in train_regions
        assert valid_regions == {"RegionA"}

    def test_leave_multiple_regions_out(self, synthetic_csdap_root):
        train = make_dataset(
            synthetic_csdap_root, "train", eval_region=["RegionA", "RegionB"]
        )
        assert {e.region_name for e in train.dataset} == {"RegionC"}

    def test_unknown_eval_region_raises_for_train(self, synthetic_csdap_root):
        with pytest.raises(ValueError):
            make_dataset(synthetic_csdap_root, "train", eval_region="Nowhere")

    def test_random_split_is_seeded_and_disjoint(self, synthetic_csdap_root):
        train1 = make_dataset(synthetic_csdap_root, "train", eval_region=None)
        train2 = make_dataset(synthetic_csdap_root, "train", eval_region=None)
        valid = make_dataset(synthetic_csdap_root, "valid", eval_region=None)
        assert train1.image_paths == train2.image_paths
        train_set = {p for p, _ in train1.image_paths}
        valid_set = {p for p, _ in valid.image_paths}
        assert train_set.isdisjoint(valid_set)
        # 3 regions x 2 scenes, 80/20 -> 4 train + 2 valid
        assert len(train_set) == 4 and len(valid_set) == 2

    def test_all_split_takes_everything(self, synthetic_csdap_root):
        ds = make_dataset(synthetic_csdap_root, "all", eval_region=None)
        assert len({p for p, _ in ds.image_paths}) == 6

    def test_bad_split_pct(self, synthetic_csdap_root):
        with pytest.raises(ValueError):
            make_dataset(synthetic_csdap_root, "train", train_split_pct=1.5)


class TestExamples:
    def test_fixed_shapes_nhwc(self, synthetic_csdap_root):
        ds = make_dataset(synthetic_csdap_root, "train", eval_region="RegionA")
        ex = ds.load_example(0)
        assert ex["image"].shape == (64, 64, 4)
        assert ex["image"].dtype == np.float32
        assert ex["target"].shape == (64, 64)
        assert ex["target"].dtype == np.int32
        assert ex["mean"].shape == (1, 1, 4)
        assert ex["std"].shape == (1, 1, 4)

    def test_edge_tiles_padded(self, synthetic_csdap_root):
        # Scenes are 96x128 with 64x64 crops, stride 32 -> ragged edge tiles
        # exist; every loaded example must still be 64x64.
        ds = make_dataset(synthetic_csdap_root, "train", eval_region="RegionA")
        ragged = [
            i
            for i, e in enumerate(ds.dataset)
            if e.crop_params.height < 64 or e.crop_params.width < 64
        ]
        assert ragged
        ex = ds.load_example(ragged[0])
        assert ex["image"].shape == (64, 64, 4)
        cp = ds.dataset[ragged[0]].crop_params
        # Padded label region carries ignore_index.
        if cp.height < 64:
            assert (ex["target"][cp.height :, :] == ds.ignore_index).all()

    def test_label_values_binary_plus_ignore(self, synthetic_csdap_root):
        ds = make_dataset(synthetic_csdap_root, "train", eval_region="RegionA")
        ex = ds.load_example(0)
        assert set(np.unique(ex["target"])) <= {0, 1, ds.ignore_index}

    def test_metadata(self, synthetic_csdap_root):
        ds = make_dataset(
            synthetic_csdap_root,
            "valid",
            eval_region="RegionA",
            output_metadata=True,
        )
        ex = ds.load_example(0)
        md = ex["metadata"]
        assert md["region_name"] == "RegionA"
        assert md["crop_params"].og_height == 96

    def test_local_norm_rides_along(self, synthetic_csdap_root):
        ds = make_dataset(
            synthetic_csdap_root, "train", eval_region="RegionA", norm_mode="local"
        )
        ex = ds.load_example(0)
        # un-normalization must reconstruct the range-normalized image
        restored = ex["image"] * ex["std"] + ex["mean"]
        assert np.isfinite(restored).all()

    def test_s1_sensor_resize_path(self, synthetic_csdap_root):
        # Synthetic S1 scenes share label dims, so force the resize path by
        # requesting a dataset whose scenes match labels — then check the S1
        # range normalization landed in [0, 1].
        ds = make_dataset(
            synthetic_csdap_root, "train", eval_region="RegionA", sensor="S1"
        )
        ex = ds.load_example(0)
        assert ex["image"].shape == (64, 64, 2)
        assert 0 <= ex["image"].min() and ex["image"].max() <= 1

    def test_windowed_read_matches_full_read(self, synthetic_csdap_root):
        ds = make_dataset(synthetic_csdap_root, "train", eval_region="RegionA")
        from floodplanet_code_tpu.data.sensors import (
            normalize_sensor_range,
            select_channels,
        )
        from floodplanet_code_tpu.geo import tiff

        e = ds.dataset[0]
        cp = e.crop_params
        full = tiff.imread(e.image_path)
        full = select_channels(full, "PS", "ALL")
        full = normalize_sensor_range(full, "PS")
        expected = full[:, cp.h0 : cp.hE, cp.w0 : cp.wE]
        got = ds._load_crop_norm_image(e.image_path, cp)
        np.testing.assert_allclose(got, expected, rtol=1e-6)


class TestBatchLoader:
    def test_fixed_batches_drop_last(self, synthetic_csdap_root):
        ds = make_dataset(synthetic_csdap_root, "train", eval_region="RegionA")
        loader = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=True)
        batches = list(loader)
        assert len(batches) == len(ds) // 4
        for batch in batches:
            assert batch["image"].shape == (4, 64, 64, 4)
            assert batch["target"].shape == (4, 64, 64)
            assert batch["valid"].all()

    def test_final_batch_padded_with_mask(self, synthetic_csdap_root):
        ds = make_dataset(synthetic_csdap_root, "valid", eval_region="RegionA")
        bs = 7
        loader = BatchLoader(ds, batch_size=bs, shuffle=False, drop_last=False)
        batches = list(loader)
        total_valid = sum(int(b["valid"].sum()) for b in batches)
        assert total_valid == len(ds)
        last = batches[-1]
        assert last["image"].shape[0] == bs

    def test_shuffle_is_seeded(self, synthetic_csdap_root):
        ds = make_dataset(synthetic_csdap_root, "train", eval_region="RegionA")
        l1 = BatchLoader(ds, batch_size=4, shuffle=True, seed=7)
        l2 = BatchLoader(ds, batch_size=4, shuffle=True, seed=7)
        b1 = next(iter(l1))
        b2 = next(iter(l2))
        np.testing.assert_array_equal(b1["image"], b2["image"])

    def test_metadata_stays_listlike(self, synthetic_csdap_root):
        ds = make_dataset(
            synthetic_csdap_root,
            "valid",
            eval_region="RegionA",
            output_metadata=True,
        )
        loader = BatchLoader(
            ds, batch_size=3, shuffle=False, output_metadata=True
        )
        batch = next(iter(loader))
        assert isinstance(batch["metadata"], list)
        assert len(batch["metadata"]) == 3
        assert batch["metadata"][0]["region_name"] == "RegionA"

    def test_device_prefetch_shards_batch(self, synthetic_csdap_root):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from floodplanet_code_tpu.data.loader import device_prefetch

        ds = make_dataset(synthetic_csdap_root, "train", eval_region="RegionA")
        devices = jax.devices()
        mesh = Mesh(np.array(devices), ("data",))
        sharding = NamedSharding(mesh, P("data"))
        loader = BatchLoader(
            ds, batch_size=len(devices) * 2, shuffle=True, drop_last=True
        )
        for batch in device_prefetch(iter(loader), sharding=sharding):
            assert batch["image"].sharding == sharding
            break
