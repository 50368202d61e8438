"""Standalone example: a small ViT-style transformer for tile encoding.

Parity note: the reference carries ``models/example_transformer.py`` — a
never-imported scratch demo of nn.TransformerEncoder with sinusoidal feature
encoding and a learned special token (example_transformer.py:5-57). This is
the JAX analog, kept (like the reference's) as a standalone demo of how a
transformer tile encoder would slot into this framework: patchify ->
positional encoding -> pre-LN encoder blocks -> [CLS]-token readout.

Run: python -m floodplanet_code_tpu.models.example_transformer
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sinusoidal_positions(n_positions: int, d_model: int) -> jnp.ndarray:
    """Fixed sinusoidal positional features (reference feature_encoding:5)."""
    position = np.arange(n_positions)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-np.log(10000.0) / d_model))
    table = np.zeros((n_positions, d_model), np.float32)
    table[:, 0::2] = np.sin(position * div)
    table[:, 1::2] = np.cos(position * div)
    return jnp.asarray(table)


class EncoderBlock(nn.Module):
    d_model: int
    n_heads: int = 4
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.n_heads)(h, h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.d_model * self.mlp_ratio)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model)(h)
        return x + h


class ExampleTileTransformer(nn.Module):
    """Patchify a tile and encode it with a learned special token."""

    d_model: int = 128
    n_layers: int = 2
    patch: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, H, W, C] -> non-overlapping patch embedding.
        tokens = nn.Conv(
            self.d_model,
            kernel_size=(self.patch, self.patch),
            strides=(self.patch, self.patch),
        )(x)
        b, ph, pw, d = tokens.shape
        tokens = tokens.reshape(b, ph * pw, d)
        tokens = tokens + sinusoidal_positions(ph * pw, d)[None]
        # Learned special token (reference special_token:23).
        cls = self.param(
            "special_token", nn.initializers.normal(0.02), (1, 1, d)
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, d)), tokens], axis=1
        )
        for _ in range(self.n_layers):
            tokens = EncoderBlock(self.d_model)(tokens)
        return tokens[:, 0]  # special-token readout


if __name__ == "__main__":
    model = ExampleTileTransformer()
    x = jnp.zeros((2, 64, 64, 4))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    print(f"Input shape: {x.shape}")
    print(f"Output shape: {out.shape}")
