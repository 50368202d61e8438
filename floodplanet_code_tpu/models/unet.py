"""UNet backbone in flax.linen, NHWC, TPU-first.

Architecture contract from the reference (st_water_seg/models/unet.py:6-201):
DoubleConv (3x3 conv -> BN -> ReLU, twice), 4 maxpool downs to 1024//2
channels (bilinear variant), 4 bilinear-upsample ups with pad-to-match skip
concatenation, 1x1 output conv; plus the encoder/decoder split used by the
late-fusion model (UNetEncoder/UNetDecoder).

TPU-first choices (not a port):
- NHWC layout end-to-end: XLA's TPU conv emitter wants channels-last; this
  avoids every transpose the torch NCHW layout would induce.
- bf16 compute / f32 params via the ``dtype``/``param_dtype`` split; the
  final logits are cast back to f32.
- BatchNorm statistics can be reduced over the data mesh axis
  (``axis_name='data'``) giving cross-replica SyncBN — the reference is
  single-device and never faced the BN-under-DP question (SURVEY.md §8e).
- Bilinear upsample uses jax.image.resize(linear); pad-to-match mirrors
  unet.py:54-66 so odd input sizes reconcile with their skip connections.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FusedBatchNormReLU(nn.Module):
    """BatchNorm + ReLU with the hand-fused train path (ops/batchnorm.py).

    Variable tree is identical to ``nn.BatchNorm`` (params scale/bias,
    batch_stats mean/var), so checkpoints interoperate with the flax-BN
    build bit-for-bit.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from floodplanet_code_tpu.ops.batchnorm import bn_relu_train

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (c,), jnp.float32
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (c,), jnp.float32
        )
        if not train or self.is_initializing():
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            a = (inv * scale).astype(self.dtype)
            b = (bias - ra_mean.value * inv * scale).astype(self.dtype)
            return nn.relu(x.astype(self.dtype) * a + b)
        z, mean, var = bn_relu_train(
            x.astype(self.dtype), scale, bias, self.epsilon, self.axis_name
        )
        ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
        ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        return z


class DoubleConv(nn.Module):
    """(conv3x3 => BN => ReLU) * 2 (reference unet.py:6-20)."""

    out_channels: int
    mid_channels: int | None = None
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fused_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.mid_channels or self.out_channels
        for i, channels in enumerate((mid, self.out_channels)):
            x = nn.Conv(
                channels,
                kernel_size=(3, 3),
                padding="SAME",
                use_bias=False,  # BN immediately follows; bias is redundant
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
            if self.fused_bn:
                x = FusedBatchNormReLU(
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    axis_name=self.bn_axis_name if train else None,
                    name=f"BatchNorm_{i}",
                )(x, train)
            else:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    axis_name=self.bn_axis_name if train else None,
                    name=f"BatchNorm_{i}",
                )(x)
                x = nn.relu(x)
        return x


class Down(nn.Module):
    """maxpool(2) then DoubleConv (reference unet.py:23-32)."""

    out_channels: int
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fused_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return DoubleConv(
            self.out_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
        )(x, train)


def _upsample2x(x: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear 2x upsample (reference nn.Upsample(bilinear), unet.py:43-45).

    ``align_corners=False`` (default) is jax.image.resize's half-pixel
    convention — the fast path every model trained in this framework uses.
    ``align_corners=True`` reproduces torch's
    ``nn.Upsample(align_corners=True)`` exactly (needed for bit-faithful
    inference from checkpoints imported with
    tools/import_torch_checkpoint.py); implemented as two 1-D
    interpolation matmuls, which the MXU handles at negligible cost.
    """
    b, h, w, c = x.shape
    if not align_corners:
        return jax.image.resize(
            x, (b, 2 * h, 2 * w, c), method="linear"
        ).astype(x.dtype)
    ah = jnp.asarray(_align_corners_matrix(h, 2 * h), x.dtype)
    aw = jnp.asarray(_align_corners_matrix(w, 2 * w), x.dtype)
    out = jnp.einsum("oh,bhwc->bowc", ah, x)
    return jnp.einsum("pw,bowc->bopc", aw, out).astype(x.dtype)


def _align_corners_matrix(n_in: int, n_out: int) -> "np.ndarray":
    """[n_out, n_in] 1-D linear-interp matrix, torch align_corners=True."""
    import numpy as np

    if n_in == 1:
        return np.ones((n_out, 1), np.float32)
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    frac = (src - i0).astype(np.float32)
    mat = np.zeros((n_out, n_in), np.float32)
    mat[np.arange(n_out), i0] += 1.0 - frac
    mat[np.arange(n_out), i1] += frac
    return mat


def _pad_to_match(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Pad x1 spatially so it matches x2 (reference unet.py:57-63)."""
    diff_h = x2.shape[1] - x1.shape[1]
    diff_w = x2.shape[2] - x1.shape[2]
    if diff_h == 0 and diff_w == 0:
        return x1
    return jnp.pad(
        x1,
        (
            (0, 0),
            (diff_h // 2, diff_h - diff_h // 2),
            (diff_w // 2, diff_w - diff_w // 2),
            (0, 0),
        ),
    )


class Up(nn.Module):
    """Bilinear upsample, pad-to-match, skip-concat, DoubleConv
    (reference unet.py:35-67)."""

    out_channels: int
    mid_channels: int | None = None
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fused_bn: bool = True
    align_corners: bool = False

    @nn.compact
    def __call__(
        self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        x1 = _upsample2x(x1, self.align_corners)
        x1 = _pad_to_match(x1, x2)
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(
            self.out_channels,
            mid_channels=self.mid_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
        )(x, train)


class UNetEncoder(nn.Module):
    """inc + 4 downs -> 5-level feature pyramid (reference unet.py:134-159)."""

    base_feat_channels: int = 64
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fused_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list:
        bfc = self.base_feat_channels
        kw = dict(
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
        )
        x1 = DoubleConv(bfc, **kw)(x, train)
        x2 = Down(bfc * 2, **kw)(x1, train)
        x3 = Down(bfc * 4, **kw)(x2, train)
        x4 = Down(bfc * 8, **kw)(x3, train)
        x5 = Down(bfc * 8, **kw)(x4, train)  # (bfc*16)//2, bilinear factor
        return [x1, x2, x3, x4, x5]


class UNetDecoder(nn.Module):
    """4 ups + 1x1 out conv (reference unet.py:162-201).

    The reference's ``channel_factor`` (unet.py:177-183, widened skip inputs
    for late fusion) is unnecessary here: flax infers conv input widths, so
    the same decoder handles fused pyramids of any channel count.
    """

    n_classes: int
    base_feat_channels: int = 64
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fused_bn: bool = True
    align_corners: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x1, x2, x3, x4, x5 = feats
        bfc = self.base_feat_channels
        kw = dict(
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
            align_corners=self.align_corners,
        )
        # Bilinear variant: each Up halves channels; mid = in_channels // 2
        # (reference DoubleConv(in, out, in//2), unet.py:46).
        x = Up(bfc * 4, mid_channels=bfc * 8, **kw)(x5, x4, train)
        x = Up(bfc * 2, mid_channels=bfc * 4, **kw)(x, x3, train)
        x = Up(bfc, mid_channels=bfc * 2, **kw)(x, x2, train)
        x = Up(bfc, **kw)(x, x1, train)
        logits = nn.Conv(
            self.n_classes,
            kernel_size=(1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return logits.astype(jnp.float32)


class UNet(nn.Module):
    """Full UNet: encoder + decoder (reference unet.py:80-131)."""

    n_classes: int
    base_feat_channels: int = 64
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fused_bn: bool = True
    align_corners: bool = False

    def setup(self):
        self.encoder = UNetEncoder(
            base_feat_channels=self.base_feat_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
        )
        self.decoder = UNetDecoder(
            n_classes=self.n_classes,
            base_feat_channels=self.base_feat_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
            align_corners=self.align_corners,
        )

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = self.encoder(x, train)
        return self.decoder(feats, train)

    def encode(self, x: jnp.ndarray, train: bool = False):
        return self.encoder(x, train)

    def decode(self, feats, train: bool = False):
        return self.decoder(feats, train)
