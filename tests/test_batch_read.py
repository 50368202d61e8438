"""Native batch windowed-read path tests."""

import numpy as np

from floodplanet_code_tpu.data import (
    BatchLoader,
    FloodPlanetDataset,
    generate_image_slice_object,
)
from floodplanet_code_tpu.geo import tiff


class TestBatchRead:
    def test_batch_matches_single(self, tmp_path, rng):
        paths, windows = [], []
        for i in range(5):
            arr = rng.integers(0, 255, (3, 100, 120)).astype(np.uint8)
            p = str(tmp_path / f"s{i}.tif")
            tiff.imwrite(p, arr)
            paths.append(p)
            windows.append((i, 2 * i, 40, 50))
        batch = tiff.read_windows_batch(paths, windows)
        for p, w, got in zip(paths, windows, batch):
            np.testing.assert_array_equal(got, tiff.read_window(p, *w))

    def test_dataset_load_batch_matches_load_example(self, synthetic_csdap_root):
        ds = FloodPlanetDataset(
            synthetic_csdap_root,
            "train",
            generate_image_slice_object(64, stride=32),
            sensor="PS",
            eval_region="RegionA",
            ignore_index=0,
            norm_mode="local",
        )
        indices = list(range(min(6, len(ds))))
        batch = ds.load_batch(indices, output_metadata=True)
        for i, got in zip(indices, batch):
            want = ds.load_example(i, output_metadata=True)
            np.testing.assert_allclose(got["image"], want["image"], rtol=1e-6)
            np.testing.assert_array_equal(got["target"], want["target"])
            assert got["metadata"]["region_name"] == want["metadata"]["region_name"]

    def test_loader_uses_batch_api(self, synthetic_csdap_root):
        ds = FloodPlanetDataset(
            synthetic_csdap_root,
            "valid",
            generate_image_slice_object(64, stride=64),
            sensor="S1",
            eval_region="RegionB",
            ignore_index=0,
        )
        loader = BatchLoader(ds, batch_size=4, shuffle=False, drop_last=False)
        total = sum(int(b["valid"].sum()) for b in loader)
        assert total == len(ds)
