"""ops/pool.max_pool_2x2 and the stencil upsample vs their XLA references.

These are the round-3 bandwidth rewrites of the UNet's non-conv hot ops
(PERF.md): values must match exactly and gradients must match XLA's
semantics (including SelectAndScatter's first-match tie routing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from floodplanet_code_tpu.models.unet import _upsample2x, _upsample2x_stencil
from floodplanet_code_tpu.ops.pool import max_pool_2x2


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestQuadrantPool:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_forward_matches_max_pool(self, rng, dtype):
        x = jnp.asarray(
            rng.standard_normal((2, 16, 12, 5)).astype(np.float32)
        ).astype(dtype)
        np.testing.assert_array_equal(
            np.asarray(max_pool_2x2(x)),
            np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2))),
        )

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_gradient_matches_xla(self, rng, dtype):
        x = jnp.asarray(
            rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        ).astype(dtype)
        r = jnp.asarray(
            rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
        ).astype(dtype)
        g_ours = jax.grad(
            lambda v: jnp.sum((max_pool_2x2(v) * r).astype(jnp.float32))
        )(x)
        g_xla = jax.grad(
            lambda v: jnp.sum(
                (nn.max_pool(v, (2, 2), strides=(2, 2)) * r).astype(
                    jnp.float32
                )
            )
        )(x)
        np.testing.assert_array_equal(np.asarray(g_ours), np.asarray(g_xla))

    def test_gradient_tie_routing_matches_xla(self):
        # All-equal windows: SelectAndScatter routes the whole gradient to
        # the first (row-major) element; the quadrant backward must too.
        x = jnp.ones((1, 4, 4, 1), jnp.float32)
        g_ours = jax.grad(lambda v: jnp.sum(max_pool_2x2(v) * 2.0))(x)
        g_xla = jax.grad(
            lambda v: jnp.sum(nn.max_pool(v, (2, 2), strides=(2, 2)) * 2.0)
        )(x)
        np.testing.assert_array_equal(np.asarray(g_ours), np.asarray(g_xla))

    def test_odd_shape_raises(self):
        with pytest.raises(ValueError, match="even"):
            jax.grad(lambda v: jnp.sum(max_pool_2x2(v)))(
                jnp.ones((1, 5, 4, 1))
            )


class TestStencilUpsample:
    @pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 5, 7, 2)])
    def test_matches_resize(self, rng, shape):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        got = np.asarray(_upsample2x_stencil(x))
        want = np.asarray(
            jax.image.resize(
                x,
                (shape[0], 2 * shape[1], 2 * shape[2], shape[3]),
                method="linear",
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_gradient_matches_resize(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))
        r = jnp.asarray(rng.standard_normal((1, 12, 12, 2)).astype(np.float32))
        g_ours = jax.grad(lambda v: jnp.sum(_upsample2x_stencil(v) * r))(x)
        g_ref = jax.grad(
            lambda v: jnp.sum(
                jax.image.resize(v, (1, 12, 12, 2), method="linear") * r
            )
        )(x)
        np.testing.assert_allclose(
            np.asarray(g_ours), np.asarray(g_ref), rtol=1e-5, atol=1e-5
        )

    def test_default_impl_matches_resize(self, rng):
        # Production default is the dilated depthwise conv (fastest
        # measured in the full model); it must match resize numerically.
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(_upsample2x(x)),
            np.asarray(
                jax.image.resize(x, (1, 8, 8, 2), method="linear")
            ),
            rtol=1e-5,
            atol=1e-6,
        )

    @pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 5, 7, 2)])
    def test_conv_impl_matches_resize(self, rng, shape):
        from floodplanet_code_tpu.models.unet import _upsample2x_conv

        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        want = np.asarray(
            jax.image.resize(
                x,
                (shape[0], 2 * shape[1], 2 * shape[2], shape[3]),
                method="linear",
            )
        )
        got = np.asarray(_upsample2x_conv(x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
