"""Fused BatchNorm+ReLU (ops/batchnorm.py) vs flax.linen.BatchNorm oracle.

The fused path must match flax in values, gradients, and running-statistic
updates — it is the default train-mode BN in the UNet (models/unet.py), so
checkpoints and training trajectories must be interchangeable with the
flax build.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from floodplanet_code_tpu.models.unet import FusedBatchNormReLU
from floodplanet_code_tpu.ops.batchnorm import bn_relu_train


def flax_bn_relu(x, scale, bias, eps=1e-5):
    """Oracle: flax BatchNorm (train mode, fast variance) + relu."""
    bn = nn.BatchNorm(
        use_running_average=False, momentum=0.9, epsilon=eps,
        dtype=x.dtype, param_dtype=jnp.float32,
    )
    variables = bn.init(jax.random.key(0), x)
    variables = {
        "params": {"scale": scale, "bias": bias},
        "batch_stats": variables["batch_stats"],
    }
    y, updates = bn.apply(variables, x, mutable=["batch_stats"])
    return nn.relu(y), updates["batch_stats"]


class TestBnReluTrain:
    def test_matches_flax_f32(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 16, 16, 8)).astype(np.float32) * 3 + 1)
        scale = jnp.asarray(rng.uniform(0.5, 2.0, 8).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(8).astype(np.float32))
        z, mean, var = bn_relu_train(x, scale, bias)
        want, _ = flax_bn_relu(x, scale, bias)
        np.testing.assert_allclose(np.asarray(z), np.asarray(want), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(mean), np.asarray(x.mean(axis=(0, 1, 2))), atol=1e-5
        )

    def test_matches_flax_bf16(self, rng):
        x = jnp.asarray(
            rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
        ).astype(jnp.bfloat16)
        scale = jnp.ones(4)
        bias = jnp.zeros(4)
        z, _, _ = bn_relu_train(x, scale, bias)
        want, _ = flax_bn_relu(x, scale, bias)
        assert z.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(z, np.float32), np.asarray(want, np.float32), atol=0.05
        )

    def test_gradients_match_flax(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
        scale = jnp.asarray(rng.uniform(0.5, 2.0, 4).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(4).astype(np.float32))
        t = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))

        def loss_fused(x, scale, bias):
            z, _, _ = bn_relu_train(x, scale, bias)
            return jnp.sum((z - t) ** 2)

        def loss_flax(x, scale, bias):
            z, _ = flax_bn_relu(x, scale, bias)
            return jnp.sum((z - t) ** 2)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
        g_flax = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
        for a, b in zip(g_fused, g_flax):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_variance_nonnegative_constant_input(self):
        x = jnp.full((2, 4, 4, 3), 5.0)
        z, mean, var = bn_relu_train(x, jnp.ones(3), jnp.zeros(3))
        assert (np.asarray(var) >= 0).all()
        assert np.isfinite(np.asarray(z)).all()


class TestFusedModule:
    def _run(self, fused, x, train, variables=None):
        mod = FusedBatchNormReLU(dtype=jnp.float32) if fused else None
        if fused:
            if variables is None:
                variables = mod.init(jax.random.key(0), x, train=False)
            return mod, *mod.apply(
                variables, x, train=train, mutable=["batch_stats"]
            ), variables
        raise NotImplementedError

    def test_variable_tree_matches_flax_bn(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
        fused_vars = FusedBatchNormReLU().init(jax.random.key(0), x)
        flax_vars = nn.BatchNorm(use_running_average=True).init(
            jax.random.key(0), x
        )
        assert jax.tree.structure(fused_vars) == jax.tree.structure(flax_vars)

    def test_running_stats_update_matches_flax(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32) * 2 + 3)
        fused = FusedBatchNormReLU(dtype=jnp.float32)
        variables = fused.init(jax.random.key(0), x, train=False)
        z, updates = fused.apply(variables, x, train=True, mutable=["batch_stats"])

        bn = nn.BatchNorm(
            use_running_average=False, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
        bn_vars = bn.init(jax.random.key(0), x)
        y, bn_updates = bn.apply(bn_vars, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(z), np.asarray(nn.relu(y)), atol=2e-5)
        for key in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(updates["batch_stats"][key]),
                np.asarray(bn_updates["batch_stats"][key]),
                atol=1e-5,
            )

    def test_eval_uses_running_stats(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
        fused = FusedBatchNormReLU(dtype=jnp.float32)
        variables = fused.init(jax.random.key(0), x, train=False)
        z = fused.apply(variables, x, train=False)
        # fresh stats: mean 0 var 1 -> eval == relu(x) (scale 1 bias 0)
        np.testing.assert_allclose(
            np.asarray(z), np.maximum(np.asarray(x) / np.sqrt(1 + 1e-5), 0),
            atol=1e-5,
        )


class TestUNetCheckpointInterop:
    def test_fused_and_flax_unet_share_param_tree(self, rng):
        from floodplanet_code_tpu.models import build_model

        x = {"image": jnp.asarray(rng.standard_normal((1, 32, 32, 2)).astype(np.float32))}
        m_fused = build_model("ms_model", {"ms_image": 2}, 3, fused_bn=True)
        m_flax = build_model("ms_model", {"ms_image": 2}, 3, fused_bn=False)
        v_fused = m_fused.init(jax.random.key(0), x)
        v_flax = m_flax.init(jax.random.key(0), x)
        assert jax.tree.structure(v_fused) == jax.tree.structure(v_flax)
        # Same init values => identical eval outputs across builds.
        out_fused = m_fused.apply(v_fused, x, train=False)
        out_flax = m_flax.apply(v_flax, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_flax), atol=1e-5
        )

    def test_train_steps_agree_across_builds(self, rng):
        """One full train step (loss+grads+BN updates) must match."""
        from floodplanet_code_tpu.data.augment import TransformParams
        from floodplanet_code_tpu.models import build_model
        from floodplanet_code_tpu.train.fit import make_train_step
        from floodplanet_code_tpu.train.state import create_train_state

        batch = {
            "image": rng.standard_normal((2, 32, 32, 2)).astype(np.float32),
            "target": rng.integers(0, 2, (2, 32, 32)).astype(np.int32),
        }
        no_aug = TransformParams(False, 0, False, 0, False, 0)
        losses = {}
        for fused in (True, False):
            model = build_model("ms_model", {"ms_image": 2}, 3, fused_bn=fused)
            state = create_train_state(model, batch, lr=1e-3, seed=0)
            step = make_train_step(model, 0, no_aug)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            state, logs = step(state, jb, jax.random.key(0))
            losses[fused] = (
                float(logs["loss"]),
                np.concatenate([
                    np.asarray(x).ravel() for x in jax.tree.leaves(state.params)
                ]),
            )
        assert losses[True][0] == pytest.approx(losses[False][0], rel=1e-5)
        # Adam's first update is +-lr elementwise and flips sign for
        # near-zero gradients under different reduction orders; bound by one
        # full step (2*lr) and require divergence to be rare.
        diff = np.abs(losses[True][1] - losses[False][1])
        np.testing.assert_allclose(losses[True][1], losses[False][1], atol=2.1e-3)
        assert (diff > 1e-4).mean() < 1e-4
