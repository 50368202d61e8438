"""Spatial partitioning tests: dp x sp mesh equivalence on virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from floodplanet_code_tpu.data.augment import TransformParams
from floodplanet_code_tpu.models import build_model
from floodplanet_code_tpu.parallel.mesh import (
    batch_shardings_for,
    make_mesh_2d,
    replicate_state,
)
from floodplanet_code_tpu.train.fit import make_eval_step, make_train_step
from floodplanet_code_tpu.train.state import create_train_state

NO_AUG = TransformParams(False, 0, False, 0, False, 0)


def tiny_batch(rng, b=4, hw=32, c=2):
    image = rng.standard_normal((b, hw, hw, c)).astype(np.float32)
    target = (image[..., 0] > 0).astype(np.int32)
    return {"image": image, "target": target, "valid": np.ones((b,), bool)}


class TestSpatialMesh:
    def test_mesh_shape(self):
        mesh = make_mesh_2d(4, 2)
        assert mesh.shape == {"data": 4, "space": 2}

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh_2d(8, 2)

    @pytest.mark.slow  # >80s on a contended 1-core box; sibling tests cover the surface in the fast lane
    def test_sp_step_matches_dp_step(self, rng):
        """A dp=2 x sp=4 sharded step must match the unsharded step
        (GSPMD conv halo exchange correctness)."""
        model = build_model("ms_model", {"ms_image": 2}, 3, dtype=jnp.float32)
        batch = tiny_batch(rng, b=4, hw=32)
        step = make_train_step(model, 0, NO_AUG)

        state_ref = create_train_state(model, batch, lr=1e-3, seed=0)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state_ref, logs_ref = step(state_ref, jb, jax.random.key(0))

        mesh = make_mesh_2d(2, 4)
        shardings = batch_shardings_for(mesh)
        state_sp = create_train_state(model, batch, lr=1e-3, seed=0)
        state_sp = replicate_state(state_sp, mesh)
        sb = {
            k: jax.device_put(jnp.asarray(v), shardings[k])
            for k, v in batch.items()
        }
        state_sp, logs_sp = step(state_sp, sb, jax.random.key(0))

        assert float(logs_ref["loss"]) == pytest.approx(
            float(logs_sp["loss"]), rel=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(logs_ref["confusion"]),
            np.asarray(logs_sp["confusion"]),
            atol=0.5,
        )

    @pytest.mark.slow  # >80s on a contended 1-core box; sibling tests cover the surface in the fast lane
    def test_hybrid_pod_mesh_matches_unsharded(self, rng):
        """Hierarchical ('pod','data','space') mesh — batch sharded jointly
        over pod x data (the DCN x ICI layout), height over space — must
        match the unsharded step."""
        from jax.sharding import Mesh

        model = build_model("ms_model", {"ms_image": 2}, 3, dtype=jnp.float32)
        batch = tiny_batch(rng, b=4, hw=32)
        step = make_train_step(model, 0, NO_AUG)

        state_ref = create_train_state(model, batch, lr=1e-3, seed=0)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state_ref, logs_ref = step(state_ref, jb, jax.random.key(0))

        mesh = Mesh(
            np.array(jax.devices()).reshape(2, 2, 2), ("pod", "data", "space")
        )
        shardings = batch_shardings_for(mesh)
        state_h = create_train_state(model, batch, lr=1e-3, seed=0)
        state_h = replicate_state(state_h, mesh)
        sb = {
            k: jax.device_put(jnp.asarray(v), shardings[k])
            for k, v in batch.items()
        }
        state_h, logs_h = step(state_h, sb, jax.random.key(0))

        assert float(logs_ref["loss"]) == pytest.approx(
            float(logs_h["loss"]), rel=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(logs_ref["confusion"]),
            np.asarray(logs_h["confusion"]),
            atol=0.5,
        )

    def test_hybrid_mesh_helpers(self):
        from floodplanet_code_tpu.parallel.mesh import (
            make_hybrid_mesh,
            n_batch_shards,
        )

        mesh = make_hybrid_mesh(2, 4)
        assert mesh.shape == {"pod": 2, "data": 4}
        assert n_batch_shards(mesh) == 8
        spec = batch_shardings_for(mesh)["image"].spec
        assert spec == jax.sharding.PartitionSpec(("pod", "data"))
        with pytest.raises(ValueError):
            make_hybrid_mesh(4, 4)

    def test_detect_n_pods(self):
        """Slice topology (multi-slice TPU pods) wins over process count;
        without it the process count is the DCN granule count."""
        from types import SimpleNamespace

        from floodplanet_code_tpu.parallel.mesh import detect_n_pods

        sliced = [
            SimpleNamespace(slice_index=i // 4, process_index=i // 2)
            for i in range(8)
        ]
        assert detect_n_pods(sliced) == 2  # 2 slices x 4 devices
        unsliced = [SimpleNamespace(process_index=0) for _ in range(8)]
        assert detect_n_pods(unsliced) == jax.process_count()

    def test_sp_eval_step(self, rng):
        model = build_model("ms_model", {"ms_image": 2}, 3, dtype=jnp.float32)
        batch = tiny_batch(rng, b=4, hw=32)
        state = create_train_state(model, batch, lr=1e-3)
        mesh = make_mesh_2d(2, 4)
        shardings = batch_shardings_for(mesh)
        state = replicate_state(state, mesh)
        sb = {
            k: jax.device_put(jnp.asarray(v), shardings[k])
            for k, v in batch.items()
        }
        eval_step = make_eval_step(model, 0)
        logs = eval_step(state, sb)
        assert np.isfinite(float(logs["loss"]))
