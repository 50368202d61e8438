"""Device-resident dataset cache (data/device_cache.py) vs the host path.

The device batch builder must reproduce load_example exactly: same crops,
same ragged-edge masking, same normalize_stats semantics.
"""

import numpy as np
import pytest

from floodplanet_code_tpu.data import build_dataset, generate_image_slice_object
from floodplanet_code_tpu.data.device_cache import (
    build_device_cache,
    make_batch_builder,
)


@pytest.fixture(scope="module")
def s1_dataset(synthetic_csdap_root):
    # 96x128 scenes with 64/64 crops -> includes ragged remainder tiles.
    sp = generate_image_slice_object(64, 64, 64)
    return build_dataset(
        "floodplanet",
        "train",
        sp,
        root_dir=synthetic_csdap_root,
        sensor="S1",
        eval_region="RegionB",
        ignore_index=2,
    )


def _compare_indices(dataset, norm_mode, indices):
    import jax.numpy as jnp

    dataset.norm_mode = norm_mode
    cache = build_device_cache(dataset)
    assert cache is not None
    builder = make_batch_builder(cache)
    rows = cache.index_rows(dataset, indices)
    batch = builder(jnp.asarray(rows))
    for pos, index in enumerate(indices):
        want = dataset.load_example(index)
        np.testing.assert_allclose(
            np.asarray(batch["image"][pos]), want["image"], atol=1e-4,
            err_msg=f"image mismatch at example {index} ({norm_mode})",
        )
        np.testing.assert_array_equal(
            np.asarray(batch["target"][pos]), want["target"]
        )
        np.testing.assert_allclose(
            np.asarray(batch["mean"][pos]), want["mean"], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(batch["std"][pos]), want["std"], atol=1e-4
        )


def test_matches_host_path_null_norm(s1_dataset):
    indices = list(range(min(len(s1_dataset), 8)))
    _compare_indices(s1_dataset, None, indices)


def test_matches_host_path_local_norm(s1_dataset):
    indices = list(range(min(len(s1_dataset), 8)))
    _compare_indices(s1_dataset, "local", indices)


def test_edge_crops_are_masked(s1_dataset):
    """Remainder tiles: image zero-padded, target ignore-padded."""
    import jax.numpy as jnp

    s1_dataset.norm_mode = None
    cache = build_device_cache(s1_dataset)
    builder = make_batch_builder(cache)
    edge = [
        i
        for i, ex in enumerate(s1_dataset.dataset)
        if ex.crop_params.height < 64 or ex.crop_params.width < 64
    ]
    assert edge, "synthetic layout should produce ragged remainder tiles"
    rows = cache.index_rows(s1_dataset, edge[:4])
    batch = builder(jnp.asarray(rows))
    for pos, index in enumerate(edge[:4]):
        cp = s1_dataset.dataset[index].crop_params
        img = np.asarray(batch["image"][pos])
        tgt = np.asarray(batch["target"][pos])
        assert (img[cp.height :, :, :] == 0).all()
        assert (tgt[cp.height :, :] == 2).all()
        assert (img[:, cp.width :, :] == 0).all()
        assert (tgt[:, cp.width :] == 2).all()


def test_byte_budget_fallback(s1_dataset):
    assert build_device_cache(s1_dataset, max_bytes=1000) is None


@pytest.mark.slow
def test_fit_uses_device_cache(tmp_path, synthetic_csdap_root, capsys):
    from floodplanet_code_tpu.config import compose
    from floodplanet_code_tpu.train.fit import fit_model

    cfg = compose(
        overrides=[
            "dataset.sensor=S1",
            "eval_region=RegionB",
            "n_epochs=1",
            "crop_height=32",
            "crop_width=32",
            "crop_stride=32",
            "batch_size=4",
            "n_workers=1",
            "transforms.hflip.active=false",
            "transforms.vflip.active=false",
            "transforms.rotate.active=false",
        ]
    )
    cfg.dataset["dataset_kwargs"] = {"root_dir": synthetic_csdap_root}
    best = fit_model(cfg, overwrite_exp_dir=str(tmp_path / "devcache"))
    out = capsys.readouterr().out
    assert "[fit] device data cache" in out
    assert best
