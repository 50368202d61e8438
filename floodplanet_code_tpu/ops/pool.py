"""2x2/stride-2 max pooling with a hand-written VJP (negative result).

Motivation: in ISOLATION XLA's max_pool backward (SelectAndScatter)
measures ~4x its intrinsic HBM traffic at the UNet's L0 size
(8x512x512x64 bf16). This quadrant rewrite was built to beat it — but in
the FULL model it is SLOWER (whole-model fwd+bwd 102 vs 90 ms on v5e):
the stride-2 quadrant slices and stack+reshape interleaves cost more
than SelectAndScatter once XLA can schedule the pool among its
neighbors. Kept behind ``pool_impl='quadrant'`` as the documented
negative result (PERF.md round 3).

This implementation:
- forward: four strided quadrant views reduced with jnp.maximum — three
  elementwise max ops, no reduce_window;
- backward: routes dy to the FIRST maximal quadrant in row-major order
  (q00, q01, q10, q11) — exactly SelectAndScatter's tie order, so
  gradients match XLA's max_pool backward bit-for-bit — then interleaves
  the four quadrant gradients back with two stack+reshape steps.

Semantics identical to flax nn.max_pool(window=(2,2), strides=(2,2)) for
even H, W (the only shapes the UNet produces; odd inputs raise).

Used by models/unet.py Down when ``pool_impl='quadrant'``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _quadrants(x: jnp.ndarray):
    return (
        x[:, 0::2, 0::2, :],
        x[:, 0::2, 1::2, :],
        x[:, 1::2, 0::2, :],
        x[:, 1::2, 1::2, :],
    )


@jax.custom_vjp
def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Max pool [B, H, W, C] -> [B, H/2, W/2, C] (H, W even)."""
    q00, q01, q10, q11 = _quadrants(x)
    return jnp.maximum(jnp.maximum(q00, q01), jnp.maximum(q10, q11))


def _fwd(x):
    if x.shape[1] % 2 or x.shape[2] % 2:
        raise ValueError(f"max_pool_2x2 requires even H, W; got {x.shape}")
    y = max_pool_2x2(x)
    return y, (x, y)


def _bwd(res, dy):
    x, y = res
    q00, q01, q10, q11 = _quadrants(x)
    # First-match masks in SelectAndScatter's row-major window order: a
    # tie routes the whole gradient to the earliest position, matching
    # XLA's max_pool backward exactly.
    m00 = q00 == y
    m01 = (q01 == y) & ~m00
    m10 = (q10 == y) & ~(m00 | m01)
    m11 = ~(m00 | m01 | m10)
    zero = jnp.zeros((), dy.dtype)
    d00 = jnp.where(m00, dy, zero)
    d01 = jnp.where(m01, dy, zero)
    d10 = jnp.where(m10, dy, zero)
    d11 = jnp.where(m11, dy, zero)
    b, h2, w2, c = dy.shape
    # Interleave W then H: stack along a fresh minor-adjacent axis and
    # collapse it into the target dimension.
    top = jnp.stack([d00, d01], axis=3).reshape(b, h2, 2 * w2, c)
    bot = jnp.stack([d10, d11], axis=3).reshape(b, h2, 2 * w2, c)
    dx = jnp.stack([top, bot], axis=2).reshape(b, 2 * h2, 2 * w2, c)
    return (dx,)


max_pool_2x2.defvjp(_fwd, _bwd)
