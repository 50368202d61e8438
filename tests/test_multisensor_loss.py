"""Multi-sensor stacked-channel fusion + loss-config tests
(BASELINE.json configs[2] and [3])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from floodplanet_code_tpu.config import Config
from floodplanet_code_tpu.data import (
    FloodPlanetDataset,
    generate_image_slice_object,
)
from floodplanet_code_tpu.train.fit import make_loss_fn


class TestMultiSensor:
    def test_stacked_channels(self, synthetic_csdap_root):
        ds = FloodPlanetDataset(
            synthetic_csdap_root,
            "train",
            generate_image_slice_object(64, stride=64),
            sensor="PS+S1",
            eval_region="RegionA",
            ignore_index=0,
        )
        assert ds.n_channels["ms_image"] == 4 + 2
        ex = ds.load_example(0)
        assert ex["image"].shape == (64, 64, 6)
        # PS channels first (primary), then S1's [0,1]-normalized bands.
        assert np.isfinite(ex["image"]).all()

    def test_stack_matches_individual_sensors(self, synthetic_csdap_root):
        sl = generate_image_slice_object(64, stride=64)
        common = dict(eval_region="RegionA", ignore_index=0)
        fused = FloodPlanetDataset(
            synthetic_csdap_root, "train", sl, sensor="PS+S1", **common
        )
        ps = FloodPlanetDataset(
            synthetic_csdap_root, "train", sl, sensor="PS", **common
        )
        s1 = FloodPlanetDataset(
            synthetic_csdap_root, "train", sl, sensor="S1", **common
        )
        fx = fused.load_example(0)["image"]
        px = ps.load_example(0)["image"]
        sx = s1.load_example(0)["image"]
        np.testing.assert_allclose(fx[..., :4], px, rtol=1e-6)
        np.testing.assert_allclose(fx[..., 4:], sx, rtol=1e-6)

    def test_multisensor_training_step(self, synthetic_csdap_root, rng):
        from floodplanet_code_tpu.data.augment import TransformParams
        from floodplanet_code_tpu.models import build_model
        from floodplanet_code_tpu.train.fit import make_train_step
        from floodplanet_code_tpu.train.state import create_train_state

        ds = FloodPlanetDataset(
            synthetic_csdap_root,
            "train",
            generate_image_slice_object(32, stride=32),
            sensor="PS+S1",
            eval_region="RegionA",
            ignore_index=0,
        )
        examples = [ds.load_example(i) for i in range(4)]
        batch = {
            "image": jnp.asarray(np.stack([e["image"] for e in examples])),
            "target": jnp.asarray(np.stack([e["target"] for e in examples])),
        }
        model = build_model("ef_model", ds.n_channels, ds.n_classes)
        state = create_train_state(model, {k: np.asarray(v) for k, v in batch.items()}, lr=1e-3)
        step = make_train_step(
            model, 0, TransformParams(False, 0, False, 0, False, 0)
        )
        state, logs = step(state, batch, jax.random.key(0))
        assert np.isfinite(float(logs["loss"]))


class TestLossConfig:
    def _data(self, rng):
        logits = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
        target = jnp.asarray(rng.integers(0, 3, (2, 8, 8)).astype(np.int32))
        return logits, target

    def test_default_ce(self, rng):
        loss = make_loss_fn(None, 0)
        logits, target = self._data(rng)
        assert np.isfinite(float(loss(logits, target)))

    def test_weighted_ce(self, rng):
        cfg = Config({"name": "weighted_ce", "class_weights": [0.2, 1.0, 2.0]})
        loss = make_loss_fn(cfg, 0)
        logits, target = self._data(rng)
        assert np.isfinite(float(loss(logits, target)))

    def test_weighted_requires_weights(self):
        with pytest.raises(ValueError):
            make_loss_fn(Config({"name": "weighted_ce"}), 0)

    def test_ce_dice_combination(self, rng):
        cfg = Config({"name": "ce_dice", "dice_weight": 0.5})
        loss = make_loss_fn(cfg, 0)
        logits, target = self._data(rng)
        combined = float(loss(logits, target))
        ce_only = float(make_loss_fn(None, 0)(logits, target))
        assert combined > ce_only  # dice term adds a positive contribution

    def test_unknown_loss(self):
        with pytest.raises(NotImplementedError):
            make_loss_fn(Config({"name": "focal"}), 0)
