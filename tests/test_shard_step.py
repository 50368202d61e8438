"""Explicit-collective (shard_map) step vs the GSPMD step.

The shard_map variant (parallel/shard_step.py) is an executable spec of
the collectives GSPMD must derive: these tests prove step-for-step
numerical agreement between the two implementations on the 8-virtual-
device CPU mesh, including the hard cases — unequal ignored-pixel counts
per shard (global-mean CE) and cross-replica BN statistics (SyncBN).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from floodplanet_code_tpu.data.augment import TransformParams
from floodplanet_code_tpu.models import build_model
from floodplanet_code_tpu.parallel.mesh import make_mesh, make_mesh_2d
from floodplanet_code_tpu.parallel.shard_step import (
    make_shard_eval_step,
    make_shard_train_step,
)
from floodplanet_code_tpu.train.fit import make_eval_step, make_train_step
from floodplanet_code_tpu.train.state import create_train_state

NO_AUG = TransformParams(False, 0, False, 0, False, 0)


def tiny_batch(rng, b=8, hw=32, c=2):
    image = rng.standard_normal((b, hw, hw, c)).astype(np.float32)
    target = (image[..., 0] > 0).astype(np.int32)
    return {"image": image, "target": target, "valid": np.ones((b,), bool)}


def models_pair(c=2, n_classes=3):
    """Same architecture twice: GSPMD build (global BN comes free from
    sharded batch-axis reductions) and shard_map build (explicit pmean)."""
    kw = dict(dtype=jnp.float32)
    gspmd = build_model("ms_model", {"ms_image": c}, n_classes, **kw)
    sync = build_model(
        "ms_model", {"ms_image": c}, n_classes, bn_axis_name="data", **kw
    )
    return gspmd, sync


def assert_trees_close(a, b, rtol=1e-5, atol=1e-6):
    leaves_a, treedef_a = jax.tree.flatten(a)
    leaves_b, treedef_b = jax.tree.flatten(b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol
        )


def shard_ref_inputs(mesh, state, jb):
    """Place the GSPMD reference exactly like the shard_map step sees the
    world (replicated state, batch sharded on 'data') so the comparison
    isolates the implementation, not f32 partitioning reassociation."""
    state = jax.device_put(state, NamedSharding(mesh, P()))
    jb = {
        k: jax.device_put(v, NamedSharding(mesh, P("data")))
        for k, v in jb.items()
    }
    return state, jb


class TestShardTrainStep:
    @pytest.mark.slow  # >80s on a contended 1-core box; sibling tests cover the surface in the fast lane
    def test_matches_gspmd_three_chained_steps(self, rng):
        gspmd_model, sync_model = models_pair()
        batch = tiny_batch(rng)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        mesh = make_mesh()

        ref_step = make_train_step(gspmd_model, 0, NO_AUG)
        state_ref = create_train_state(gspmd_model, batch, lr=1e-3, seed=0)
        state_ref, jb = shard_ref_inputs(mesh, state_ref, jb)

        shard_step = make_shard_train_step(sync_model, mesh, 0)
        state_sh = create_train_state(sync_model, batch, lr=1e-3, seed=0)

        for i in range(3):
            key = jax.random.key(i)
            state_ref, logs_ref = ref_step(state_ref, jb, key)
            state_sh, logs_sh = shard_step(state_sh, jb, key)
            assert float(logs_ref["loss"]) == pytest.approx(
                float(logs_sh["loss"]), rel=1e-5
            )
            np.testing.assert_array_equal(
                np.asarray(logs_ref["confusion"]),
                np.asarray(logs_sh["confusion"]),
            )
        assert_trees_close(state_ref.params, state_sh.params)
        assert_trees_close(
            state_ref.batch_stats, state_sh.batch_stats, rtol=1e-5
        )

    @pytest.mark.slow  # >80s on a contended 1-core box; sibling tests cover the surface in the fast lane
    def test_uneven_ignored_pixels_across_shards(self, rng):
        """Shard 0 nearly all-ignored, others untouched: the global-mean CE
        (psum'd numerator/count) must still match the unsharded loss —
        a plain pmean-of-local-means would not."""
        gspmd_model, sync_model = models_pair()
        batch = tiny_batch(rng)
        # ignore_index=2: stamp most of sample 0 (shard 0) to the ignored
        # class; shards now carry very different valid-pixel counts.
        batch["target"][0, :, :24] = 2
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        mesh = make_mesh()

        ref_step = make_train_step(gspmd_model, 2, NO_AUG)
        state_ref = create_train_state(gspmd_model, batch, lr=1e-3, seed=0)
        state_ref, sjb = shard_ref_inputs(mesh, state_ref, jb)
        state_ref, logs_ref = ref_step(state_ref, sjb, jax.random.key(0))

        shard_step = make_shard_train_step(sync_model, mesh, 2)
        state_sh = create_train_state(sync_model, batch, lr=1e-3, seed=0)
        state_sh, logs_sh = shard_step(state_sh, jb, jax.random.key(0))

        assert float(logs_ref["loss"]) == pytest.approx(
            float(logs_sh["loss"]), rel=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(logs_ref["confusion"]), np.asarray(logs_sh["confusion"])
        )
        assert_trees_close(state_ref.params, state_sh.params)

    @pytest.mark.slow
    def test_augment_and_ema_smoke(self, rng):
        """Per-shard augmentation rng + EMA inside the sharded step.

        Slow lane: the heaviest single compile of the suite (~84s on a
        contended 1-CPU host). The step-parity guarantees stay in the
        fast lane via the other TestShardTrainStep/TestShardEvalStep
        cases; this adds the augment+EMA program variant only.
        """
        _, sync_model = models_pair()
        batch = tiny_batch(rng)
        mesh = make_mesh()
        step = make_shard_train_step(
            sync_model,
            mesh,
            0,
            transform_params=TransformParams(),
            ema_decay=0.9,
        )
        state = create_train_state(
            sync_model, batch, lr=1e-3, seed=0, ema=True
        )
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state, logs = step(state, jb, jax.random.key(0))
        assert np.isfinite(float(logs["loss"]))
        assert np.asarray(logs["confusion"]).sum() > 0
        # EMA moved toward (but is not equal to) the updated params.
        ema_leaf = jax.tree.leaves(state.ema_params)[0]
        p_leaf = jax.tree.leaves(state.params)[0]
        assert not np.allclose(np.asarray(ema_leaf), np.asarray(p_leaf))

    def test_spatial_mesh_rejected(self):
        _, sync_model = models_pair()
        with pytest.raises(ValueError):
            make_shard_train_step(sync_model, make_mesh_2d(4, 2), 0)


class TestShardEvalStep:
    def test_matches_gspmd_with_padded_rows(self, rng):
        gspmd_model, sync_model = models_pair()
        batch = tiny_batch(rng)
        batch["valid"][-3:] = False  # ragged final batch padding
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        mesh = make_mesh()

        state = create_train_state(gspmd_model, batch, lr=1e-3, seed=0)
        sstate, sjb = shard_ref_inputs(mesh, state, jb)
        logs_ref = make_eval_step(gspmd_model, 0)(sstate, sjb)

        logs_sh = make_shard_eval_step(sync_model, mesh, 0)(state, jb)

        assert float(logs_ref["loss"]) == pytest.approx(
            float(logs_sh["loss"]), rel=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(logs_ref["confusion"]), np.asarray(logs_sh["confusion"])
        )
