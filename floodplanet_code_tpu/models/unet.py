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
- Bilinear 2x upsample as one dilated depthwise conv (the exact 2x kernel
  [.25,.75,.75,.25]; fastest measured form — see _upsample2x); pad-to-match
  mirrors unet.py:54-66 so odd input sizes reconcile with their skips.
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
    return_affine: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        from floodplanet_code_tpu.ops.batchnorm import _stats, bn_relu_train

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (c,), jnp.float32
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (c,), jnp.float32
        )
        if self.return_affine:
            # Fold BN into (a, b) WITHOUT applying — the consumer fuses the
            # apply+ReLU into its own kernel (ops/conv_fused.py). Statistics
            # stay plain jnp reductions so AD derives the exact BN backward
            # (the custom-VJP fast path belongs to the apply, which the
            # Pallas kernel replaces).
            if not train or self.is_initializing():
                mean, var = ra_mean.value, ra_var.value
            else:
                mean, m2 = _stats(x.astype(self.dtype), self.axis_name)
                var = jnp.maximum(m2 - jnp.square(mean), 0.0)
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
            inv = jax.lax.rsqrt(var + self.epsilon)
            return inv * scale, bias - mean * inv * scale
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


class _FusedBNReLUConv(nn.Module):
    """3x3 conv whose input is relu(y*a+b), fused in one Pallas kernel.

    Declares the same ``kernel`` param (name, shape, init, dtype) as the
    ``nn.Conv`` it replaces, so checkpoints interoperate bit-for-bit with
    the XLA build.
    """

    features: int

    @nn.compact
    def __call__(self, y: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
        from floodplanet_code_tpu.ops.conv_fused import relu_affine_conv3x3

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, y.shape[-1], self.features),
            jnp.float32,
        )
        return relu_affine_conv3x3(y, a, b, kernel)


class DoubleConv(nn.Module):
    """(conv3x3 => BN => ReLU) * 2 (reference unet.py:6-20).

    ``conv_impl='pallas_fused'``: where it measures faster than XLA
    (ops/conv_fused.recommended — the C1>=256 levels), the middle
    BN->ReLU->conv boundary runs as ONE Pallas kernel so the normalized
    activation is never materialized to HBM. The variable tree is
    identical to the XLA build (same Conv_1/BatchNorm_0 params), so
    checkpoints interoperate across both settings.
    """

    out_channels: int
    mid_channels: int | None = None
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fused_bn: bool = True
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.mid_channels or self.out_channels
        use_pallas_pair = False
        if self.conv_impl == "pallas_fused" and self.fused_bn:
            from floodplanet_code_tpu.ops.conv_fused import recommended

            mid_shape = x.shape[:3] + (mid,)
            use_pallas_pair = recommended(
                mid_shape,
                self.out_channels,
                itemsize=jnp.dtype(self.dtype).itemsize,
            )
        for i, channels in enumerate((mid, self.out_channels)):
            if not (i == 1 and use_pallas_pair):
                x = nn.Conv(
                    channels,
                    kernel_size=(3, 3),
                    padding="SAME",
                    use_bias=False,  # BN follows; bias is redundant
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"Conv_{i}",
                )(x)
            if use_pallas_pair:
                if i == 0:
                    # BN_0's apply+ReLU is deferred into Conv_1's kernel.
                    continue
                a, b = FusedBatchNormReLU(
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    axis_name=self.bn_axis_name if train else None,
                    return_affine=True,
                    name="BatchNorm_0",
                )(x, train)
                x = _FusedBNReLUConv(channels, name="Conv_1")(x, a, b)
                x = FusedBatchNormReLU(
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    axis_name=self.bn_axis_name if train else None,
                    name="BatchNorm_1",
                )(x, train)
                continue
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
    """maxpool(2) then DoubleConv (reference unet.py:23-32).

    ``pool_impl``: 'xla' (default) is nn.max_pool. 'quadrant' is the
    hand-VJP strided-quadrant pool (ops/pool.py) — measured SLOWER in the
    full model on v5e (whole-model fwd+bwd 102 vs 90 ms; the strided
    slices and interleave relayouts cost more than SelectAndScatter, see
    PERF.md round 3). Kept as the documented negative result; gradients
    are identical either way, including tie order.
    """

    out_channels: int
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fused_bn: bool = True
    pool_impl: str = "xla"
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.pool_impl == "quadrant" and not (
            x.shape[1] % 2 or x.shape[2] % 2
        ):
            from floodplanet_code_tpu.ops.pool import max_pool_2x2

            x = max_pool_2x2(x)
        else:
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return DoubleConv(
            self.out_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
            conv_impl=self.conv_impl,
        )(x, train)


def _upsample2x(
    x: jnp.ndarray, align_corners: bool = False, impl: str = "conv"
) -> jnp.ndarray:
    """Bilinear 2x upsample (reference nn.Upsample(bilinear), unet.py:43-45).

    ``align_corners=False`` (default) is the half-pixel convention.
    ``impl='conv'`` (default) computes it as ONE dilated depthwise conv
    (kernel [.25,.75,.75,.25] x same, edge-replicated border) — measured
    fastest in the full model (fwd+bwd 85.8 ms on v5e) because it keeps
    the NHWC layout end to end. ``impl='resize'`` is jax.image.resize
    (89.5 ms; its [2H,H] dot_generals materialize ~1 GB of layout copies
    at the 512^2 level) and ``impl='stencil'`` the 2-tap elementwise form
    (99.9 ms; stack+reshape interleave relayouts dominate) — both kept as
    documented alternatives; all three are numerically identical
    (PERF.md round 3).
    ``align_corners=True`` reproduces torch's
    ``nn.Upsample(align_corners=True)`` exactly (needed for bit-faithful
    inference from checkpoints imported with
    tools/import_torch_checkpoint.py); implemented as two 1-D
    interpolation matmuls, which the MXU handles at negligible cost.
    """
    b, h, w, c = x.shape
    if not align_corners:
        if impl == "stencil":
            return _upsample2x_stencil(x)
        if impl == "conv":
            return _upsample2x_conv(x)
        return jax.image.resize(
            x, (b, 2 * h, 2 * w, c), method="linear"
        ).astype(x.dtype)
    ah = jnp.asarray(_align_corners_matrix(h, 2 * h), x.dtype)
    aw = jnp.asarray(_align_corners_matrix(w, 2 * w), x.dtype)
    out = jnp.einsum("oh,bhwc->bowc", ah, x)
    return jnp.einsum("pw,bowc->bopc", aw, out).astype(x.dtype)


def _upsample2x_conv(x: jnp.ndarray) -> jnp.ndarray:
    """Half-pixel 2x linear upsample as ONE dilated depthwise conv.

    The exact 2x ratio reduces bilinear resampling to the fixed separable
    kernel [0.25, 0.75, 0.75, 0.25] applied to the 2x zero-dilated input;
    edge-replicating by one pixel first reproduces jax.image.resize's
    clamped borders exactly. Rationale: the resize path's [2H,H]
    dot_generals force ~1 GB of layout copies at the 512^2 decoder level
    (PERF.md round 3); a conv keeps the NHWC layout end to end.
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    k1 = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    kern = jnp.broadcast_to(
        (k1[:, None] * k1[None, :])[:, :, None, None], (4, 4, 1, c)
    )
    return jax.lax.conv_general_dilated(
        xp,
        kern,
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _upsample2x_stencil(x: jnp.ndarray) -> jnp.ndarray:
    """Exact half-pixel 2x linear upsample as a 2-tap stencil.

    Matches jax.image.resize(method='linear') for the 2x ratio: source
    coordinate of out pixel j is (j + 0.5)/2 - 0.5, i.e. even outputs
    blend (prev, cur) at (0.25, 0.75) and odd outputs (cur, next) at
    (0.75, 0.25), clamped at the edges.
    """

    def axis_up(v: jnp.ndarray, axis: int) -> jnp.ndarray:
        n = v.shape[axis]
        first = jax.lax.slice_in_dim(v, 0, 1, axis=axis)
        last = jax.lax.slice_in_dim(v, n - 1, n, axis=axis)
        prev = jnp.concatenate(
            [first, jax.lax.slice_in_dim(v, 0, n - 1, axis=axis)], axis=axis
        )
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, n, axis=axis), last], axis=axis
        )
        even = 0.25 * prev + 0.75 * v
        odd = 0.75 * v + 0.25 * nxt
        out = jnp.stack([even, odd], axis=axis + 1)
        shp = list(v.shape)
        shp[axis] = 2 * n
        return out.reshape(shp).astype(v.dtype)

    return axis_up(axis_up(x, 1), 2)


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
    upsample_impl: str = "conv"
    conv_impl: str = "xla"

    @nn.compact
    def __call__(
        self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        x1 = _upsample2x(x1, self.align_corners, self.upsample_impl)
        x1 = _pad_to_match(x1, x2)
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(
            self.out_channels,
            mid_channels=self.mid_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
            conv_impl=self.conv_impl,
        )(x, train)


class UNetEncoder(nn.Module):
    """inc + 4 downs -> 5-level feature pyramid (reference unet.py:134-159)."""

    base_feat_channels: int = 64
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fused_bn: bool = True
    pool_impl: str = "xla"
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list:
        bfc = self.base_feat_channels
        kw = dict(
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
            conv_impl=self.conv_impl,
        )
        x1 = DoubleConv(bfc, **kw)(x, train)
        kw["pool_impl"] = self.pool_impl
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
    upsample_impl: str = "conv"
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x1, x2, x3, x4, x5 = feats
        bfc = self.base_feat_channels
        kw = dict(
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
            align_corners=self.align_corners,
            upsample_impl=self.upsample_impl,
            conv_impl=self.conv_impl,
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
    pool_impl: str = "xla"
    upsample_impl: str = "conv"
    conv_impl: str = "xla"

    def setup(self):
        self.encoder = UNetEncoder(
            base_feat_channels=self.base_feat_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
            pool_impl=self.pool_impl,
            conv_impl=self.conv_impl,
        )
        self.decoder = UNetDecoder(
            n_classes=self.n_classes,
            base_feat_channels=self.base_feat_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
            align_corners=self.align_corners,
            upsample_impl=self.upsample_impl,
            conv_impl=self.conv_impl,
        )

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = self.encoder(x, train)
        return self.decoder(feats, train)

    def encode(self, x: jnp.ndarray, train: bool = False):
        return self.encoder(x, train)

    def decode(self, feats, train: bool = False):
        return self.decoder(feats, train)
