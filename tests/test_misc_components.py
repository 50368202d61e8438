"""Tests for the remaining inventory: TB image logging, transform viz
harness, example transformer, config-misc utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np

import pytest
pytestmark = pytest.mark.smoke  # sub-minute tier: pure functions, no jit-heavy fits


class TestExampleTransformer:
    def test_forward(self):
        from floodplanet_code_tpu.models.example_transformer import (
            ExampleTileTransformer,
        )

        model = ExampleTileTransformer(d_model=64, n_layers=1)
        x = jnp.zeros((2, 64, 64, 4))
        variables = model.init(jax.random.key(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 64)
        assert "special_token" in variables["params"]


class TestTransformViz:
    def test_writes_gifs(self, synthetic_csdap_root, tmp_path):
        from floodplanet_code_tpu.tools.test_image_transforms import (
            visualize_transforms,
        )

        written = visualize_transforms(
            "floodplanet",
            "PS",
            str(tmp_path / "aug"),
            root_dir=synthetic_csdap_root,
            n_examples=2,
            crop=64,
        )
        assert len(written) == 2
        assert all(os.path.exists(p) for p in written)


class TestImagePanelLogging:
    def test_panel_written(self, tmp_path):
        from tensorboardX import SummaryWriter

        from floodplanet_code_tpu.data.sensors import make_to_rgb_fn
        from floodplanet_code_tpu.train.logging import log_image_panel

        writer = SummaryWriter(str(tmp_path / "tb"))
        rng = np.random.default_rng(0)
        log_image_panel(
            writer,
            "test_panel",
            rng.random((32, 32, 4)).astype(np.float32),
            np.zeros((1, 1, 4), np.float32),
            np.ones((1, 1, 4), np.float32),
            rng.standard_normal((32, 32, 3)).astype(np.float32),
            rng.integers(0, 2, (32, 32)).astype(np.int32),
            make_to_rgb_fn("PS", "ALL"),
            global_step=0,
        )
        writer.close()
        event_files = [
            f
            for f in os.listdir(str(tmp_path / "tb"))
            if "tfevents" in f
        ]
        assert event_files


class TestMiscUtils:
    def test_config_save_load(self, tmp_path):
        from floodplanet_code_tpu.config import Config
        from floodplanet_code_tpu.utils.misc import load_config, save_config

        cfg = Config({"a": 1, "nested": {"b": [1, 2]}})
        path = str(tmp_path / "cfg.yaml")
        save_config(cfg, path)
        back = load_config(path)
        assert back.a == 1 and back.nested.b == [1, 2]
