"""Fused train-mode BatchNorm + ReLU with a hand-written VJP.

Why: train-mode BN is the UNet's single biggest non-conv cost on TPU
(PERF.md: +37 ms over the BN-folded eval forward at 512x512 b8). The convs
themselves run at ~99% MFU, so the win is cutting HBM passes around them.

What XLA does for flax's BN->ReLU in train mode (per instance):
  read y (stats reduction) ; read y, write z (normalize+relu)      [fwd]
  plus it saves the *normalized* tensor for the backward — an extra full
  HBM write on the forward and read on the backward.

This implementation:
- computes mean/E[x^2] in one multi-output fusion (single read of y);
- applies normalize+relu as a per-channel scale/shift epilogue (XLA fuses
  it with neighbors);
- a custom VJP that saves only (y, mean, inv) — NO normalized-tensor save —
  and recomputes xhat from y inside the backward fusion, where the two
  backward reductions (sum(dz), sum(dz*xhat)) share one read of (y, dz).

Semantics match flax.linen.BatchNorm(use_fast_variance=True) + relu up to
float reassociation: statistics in float32, output in the compute dtype.
Cross-replica statistics via ``axis_name`` pmean, matching the SyncBN the
SPMD step derives. Returns the batch (mean, var) alongside the activation
so callers can update running statistics without a second pass; their
cotangents are structurally zero (running stats are not differentiated).

Used by models/unet.py DoubleConv when ``fused_bn=True``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _stats(x: jnp.ndarray, axis_name: str | None):
    """mean, E[x^2] over (N, H, W) in f32 — one fused read of x."""
    m1 = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
    m2 = jnp.mean(
        jnp.square(x.astype(jnp.float32)), axis=(0, 1, 2), dtype=jnp.float32
    )
    if axis_name is not None:
        m1 = jax.lax.pmean(m1, axis_name)
        m2 = jax.lax.pmean(m2, axis_name)
    return m1, m2


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_relu_train(
    x: jnp.ndarray,      # [N, H, W, C] compute dtype
    scale: jnp.ndarray,  # [C] f32
    bias: jnp.ndarray,   # [C] f32
    eps: float = 1e-5,
    axis_name: str | None = None,
):
    """relu(normalize(x) * scale + bias) with batch statistics.

    Returns (z, mean, var); mean/var are f32 [C] for running-stat updates.
    """
    z, mean, var, _ = _fwd_impl(x, scale, bias, eps, axis_name)
    return z, mean, var


def _fwd_impl(x, scale, bias, eps, axis_name):
    mean, m2 = _stats(x, axis_name)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    # Per-channel epilogue: z = relu(x * a + b) with a, b precomputed in f32.
    a = (inv * scale).astype(x.dtype)
    b = (bias - mean * inv * scale).astype(x.dtype)
    z = jax.nn.relu(x * a + b)
    return z, mean, var, inv


def _fwd(x, scale, bias, eps, axis_name):
    z, mean, var, inv = _fwd_impl(x, scale, bias, eps, axis_name)
    return (z, mean, var), (x, scale, bias, mean, inv)


def _bwd(eps, axis_name, res, cotangents):
    dz, _dmean, _dvar = cotangents  # stats feed running averages: no grad
    x, scale, bias, mean, inv = res
    n = x.shape[0] * x.shape[1] * x.shape[2]
    # relu mask from the recomputed pre-activation sign: z > 0 <=> pre > 0.
    a = (inv * scale).astype(x.dtype)
    b = (bias - mean * inv * scale).astype(x.dtype)
    pre = x * a + b
    dz = jnp.where(pre > 0, dz, 0).astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * inv
    # Two reductions sharing one read of (x, dz).
    sum_dz = jnp.sum(dz, axis=(0, 1, 2))
    sum_dz_xhat = jnp.sum(dz * xhat, axis=(0, 1, 2))
    if axis_name is not None:
        n = n * jax.lax.psum(1, axis_name)
        sum_dz = jax.lax.psum(sum_dz, axis_name)
        sum_dz_xhat = jax.lax.psum(sum_dz_xhat, axis_name)
    # Global (all-reduced) dscale/dbias: under shard_map's typed-AD
    # (check_vma=True) replicated parameters require replicated
    # cotangents, which these are after the psum — matching what AD
    # derives for every other parameter (parallel/shard_step.py relies
    # on this; no second grad psum happens outside).
    dscale = sum_dz_xhat
    dbias = sum_dz
    # dx = (scale * inv) * (dz - sum_dz/n - xhat * sum_dz_xhat/n)
    g = (scale * inv).astype(jnp.float32)
    dx = g * (dz - sum_dz / n - xhat * (sum_dz_xhat / n))
    return dx.astype(x.dtype), dscale, dbias


bn_relu_train.defvjp(_fwd, _bwd)
