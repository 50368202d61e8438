"""Pallas fused BN+ReLU+conv3x3 block (ops/conv_fused.py).

Runs in interpreter mode on the CPU mesh; the TPU-compiled path is the
same kernel (head-to-head numbers in PERF.md round 3 /
outputs/perf_r3/pallas.jsonl).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from floodplanet_code_tpu.ops.conv_fused import (
    recommended,
    relu_affine_conv3x3,
    supported,
    xla_reference,
)


class TestKernel:
    @pytest.mark.parametrize(
        "shape,c2",
        [((2, 16, 16, 8), 16), ((1, 32, 24, 16), 8), ((2, 8, 40, 4), 4)],
    )
    def test_matches_xla_reference(self, rng, shape, c2):
        y = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        a = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
        w = jnp.asarray(
            (rng.standard_normal((3, 3, shape[-1], c2)) * 0.1).astype(np.float32)
        )
        assert supported(shape, c2)
        np.testing.assert_allclose(
            np.asarray(relu_affine_conv3x3(y, a, b, w, True)),
            np.asarray(xla_reference(y, a, b, w)),
            rtol=1e-5,
            atol=1e-5,
        )

    def test_gradients_match_unfused(self, rng):
        shape, c2 = (1, 16, 16, 8), 8
        y = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        a = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
        w = jnp.asarray(
            (rng.standard_normal((3, 3, shape[-1], c2)) * 0.1).astype(np.float32)
        )
        g1 = jax.grad(
            lambda *args: jnp.sum(relu_affine_conv3x3(*args, True) ** 2),
            argnums=(0, 1, 2, 3),
        )(y, a, b, w)
        g2 = jax.grad(
            lambda *args: jnp.sum(xla_reference(*args) ** 2),
            argnums=(0, 1, 2, 3),
        )(y, a, b, w)
        for got, want in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
            )

    def test_recommended_is_the_measured_win_set(self):
        # v5e head-to-head (outputs/perf_r3/pallas.jsonl): wins at C1>=256.
        assert recommended((8, 128, 128, 256), 256)
        assert recommended((8, 64, 64, 512), 512)
        assert not recommended((8, 512, 512, 64), 64)
        assert not recommended((8, 256, 256, 128), 128)


class TestModelIntegration:
    def _build(self, rng, conv_impl):
        from floodplanet_code_tpu.models import build_model

        # base 32 puts the two deepest levels at C1>=256 so the fused pair
        # engages there even at this small test size.
        model = build_model(
            "ms_model",
            {"ms_image": 4},
            3,
            base_feat_channels=32,
            conv_impl=conv_impl,
        )
        image = jnp.asarray(rng.standard_normal((2, 64, 64, 4)).astype(np.float32))
        return model, {"image": image}

    def test_fused_pairs_engage(self, rng):
        # At 64px/base-32 the UNet's deep DoubleConvs hit C1>=256.
        assert recommended((2, 16, 16, 256), 256)

    def test_variable_tree_and_forward_parity(self, rng):
        model_x, batch = self._build(rng, "xla")
        model_p, _ = self._build(rng, "pallas_fused")
        vars_x = model_x.init(jax.random.PRNGKey(0), batch, train=False)
        vars_p = model_p.init(jax.random.PRNGKey(0), batch, train=False)
        tx = jax.tree.structure(vars_x)
        tp = jax.tree.structure(vars_p)
        assert tx == tp, f"variable trees diverge:\n{tx}\nvs\n{tp}"

        # Same params -> same eval logits (both impls).
        out_x = model_x.apply(vars_x, batch, train=False)
        out_p = model_p.apply(vars_x, batch, train=False)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-4
        )

    def test_train_step_parity(self, rng):
        from floodplanet_code_tpu.ops.losses import cross_entropy_ignore

        model_x, batch = self._build(rng, "xla")
        model_p, _ = self._build(rng, "pallas_fused")
        variables = model_x.init(jax.random.PRNGKey(0), batch, train=False)
        target = jnp.asarray(
            (np.asarray(batch["image"][..., 0]) > 0).astype(np.int32)
        )

        def loss_fn(model):
            def inner(params):
                logits, upd = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    batch,
                    train=True,
                    mutable=["batch_stats"],
                )
                return cross_entropy_ignore(logits, target, 0), upd
            return inner

        (lx, upd_x), gx = jax.value_and_grad(loss_fn(model_x), has_aux=True)(
            variables["params"]
        )
        (lp, upd_p), gp = jax.value_and_grad(loss_fn(model_p), has_aux=True)(
            variables["params"]
        )
        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
        flat_x = jax.tree.leaves(gx)
        flat_p = jax.tree.leaves(gp)
        for got, want in zip(flat_p, flat_x):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
            )
        # Running-stat updates agree too.
        for got, want in zip(
            jax.tree.leaves(upd_p), jax.tree.leaves(upd_x)
        ):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
            )
