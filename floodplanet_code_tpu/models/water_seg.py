"""Segmentation task models over the UNet backbone.

Reference equivalents:
- ``WaterSegModel``   <- WaterSegmentationModel (water_seg_model.py:14-240):
  plain UNet on ``batch['image']``.
- ``EarlyFusionModel``<- ef_model.py:6-47: auxiliary rasters
  (dem/slope/preflood/pre_post_difference/hand) concatenated as extra input
  channels before a shared UNet.
- ``LateFusionModel`` <- lf_model.py:9-92: one UNetEncoder per modality,
  level-wise feature concatenation fused by per-level 1x1 convs
  (feat_fusion='concat_conv'), one shared UNetDecoder.

These are pure flax Modules: loss/metrics/optimizer live in the train step
(floodplanet_code_tpu/train), not in the model — the Lightning-module
responsibilities are split the JAX way. ``ignore_index == -1`` is remapped
to ``n_classes - 1`` at task-construction time by the trainer, matching
water_seg_model.py:35-36.

Batches are dicts of NHWC arrays: ``image`` plus optional aux features in
``AUX_FEATURE_KEYS`` order.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from floodplanet_code_tpu.models.unet import UNet, UNetDecoder, UNetEncoder

# Fixed aux-feature ordering (reference ef_model.py:28-44 checks in this order).
AUX_FEATURE_KEYS = ("dem", "slope", "preflood", "pre_post_difference", "hand")

Dtype = Any


class WaterSegModel(nn.Module):
    """Plain UNet on the multispectral image (ms_model)."""

    n_classes: int
    base_feat_channels: int = 64
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fused_bn: bool = True
    align_corners: bool = False
    pool_impl: str = "xla"
    upsample_impl: str = "conv"
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        return UNet(
            n_classes=self.n_classes,
            base_feat_channels=self.base_feat_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
            align_corners=self.align_corners,
            pool_impl=self.pool_impl,
            upsample_impl=self.upsample_impl,
            conv_impl=self.conv_impl,
        )(batch["image"], train)


class EarlyFusionModel(nn.Module):
    """Channel-concat fusion of image + aux rasters, shared UNet (ef_model)."""

    n_classes: int
    base_feat_channels: int = 64
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fused_bn: bool = True
    align_corners: bool = False
    pool_impl: str = "xla"
    upsample_impl: str = "conv"
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        parts = [batch["image"]]
        for key in AUX_FEATURE_KEYS:
            if key in batch and batch[key] is not None:
                parts.append(batch[key])
        x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
        return UNet(
            n_classes=self.n_classes,
            base_feat_channels=self.base_feat_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
            align_corners=self.align_corners,
            pool_impl=self.pool_impl,
            upsample_impl=self.upsample_impl,
            conv_impl=self.conv_impl,
        )(x, train)


class LateFusionModel(nn.Module):
    """Per-modality encoders, level-wise concat + 1x1 fuse, one decoder.

    ``in_channels`` (modality name -> channel count) fixes the encoder set at
    init time, like the reference's ModuleDict (lf_model.py:31-45).
    """

    n_classes: int
    in_channels: dict
    feat_fusion: str = "concat_conv"
    base_feat_channels: int = 64
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fused_bn: bool = True
    align_corners: bool = False
    pool_impl: str = "xla"
    upsample_impl: str = "conv"
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        if self.feat_fusion != "concat_conv":
            raise NotImplementedError(
                f'No fusion method "{self.feat_fusion}" (reference supports '
                "concat_conv only, lf_model.py:88)"
            )
        modality_input = {"ms_image": batch["image"]}
        for key in AUX_FEATURE_KEYS:
            if key in batch and batch[key] is not None:
                modality_input[key] = batch[key]

        pyramids = []
        for name in self.in_channels:
            if name not in modality_input:
                raise KeyError(
                    f'Late-fusion modality "{name}" missing from batch '
                    f"(has: {sorted(modality_input)})"
                )
            encoder = UNetEncoder(
                base_feat_channels=self.base_feat_channels,
                dtype=self.dtype,
                bn_axis_name=self.bn_axis_name,
                fused_bn=self.fused_bn,
                pool_impl=self.pool_impl,
                conv_impl=self.conv_impl,
                name=f"encoder_{name}",
            )
            pyramids.append(encoder(modality_input[name], train))

        bfc = self.base_feat_channels
        level_channels = [bfc, bfc * 2, bfc * 4, bfc * 8, bfc * 8]
        fused = []
        for level, channels in enumerate(level_channels):
            cat = jnp.concatenate([p[level] for p in pyramids], axis=-1)
            fused.append(
                nn.Conv(
                    channels,
                    kernel_size=(1, 1),
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"concat_conv_{level}",
                )(cat)
            )
        decoder = UNetDecoder(
            n_classes=self.n_classes,
            base_feat_channels=self.base_feat_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            fused_bn=self.fused_bn,
            align_corners=self.align_corners,
            upsample_impl=self.upsample_impl,
            conv_impl=self.conv_impl,
        )
        return decoder(fused, train)


MODELS = {
    "ms_model": WaterSegModel,
    "ef_model": EarlyFusionModel,
    "lf_model": LateFusionModel,
}


def resolve_conv_impl(cfg) -> str:
    """The DoubleConv implementation from config, gated by tpu.use_pallas.

    ``tpu.use_pallas: false`` forces pure-XLA paths everywhere (its
    documented contract), overriding ``tpu.conv_impl=pallas_fused`` — on
    backends without Mosaic the fused kernel would silently run the
    interpreter, orders of magnitude slower.

    ``pallas_fused`` is additionally single-device-only: a pallas_call is
    an opaque custom-call with no SPMD partitioning rule, so under a
    multi-chip mesh GSPMD would have to replicate its operands (an
    all-gather of the full global activation before every fused conv).
    """
    if not cfg.select("tpu.use_pallas", True):
        return "xla"
    impl = cfg.select("tpu.conv_impl", "xla")
    if impl == "pallas_fused":
        import jax

        n = int(cfg.select("tpu.n_devices") or len(jax.devices()))
        if n > 1:
            print(
                "[model] tpu.conv_impl=pallas_fused is single-device-only "
                f"(no SPMD partitioning rule); using xla on {n} devices"
            )
            return "xla"
    return impl


def build_model(
    model_name: str,
    in_channels: dict,
    n_classes: int,
    dtype: Dtype = jnp.float32,
    bn_axis_name: str | None = None,
    **model_kwargs,
) -> nn.Module:
    """Model factory (reference models/__init__.py:12-20 — but raising
    cleanly on unknown names instead of the UnboundLocalError quirk §7.2).

    ``optimizer_name`` in model_kwargs is accepted and ignored here: the
    optimizer is the trainer's concern (train/fit.py), unlike the reference
    where the Lightning module owns it.
    """
    model_kwargs = dict(model_kwargs)
    model_kwargs.pop("optimizer_name", None)
    try:
        model_cls = MODELS[model_name]
    except KeyError:
        raise KeyError(
            f'Model "{model_name}" not found. Available: {sorted(MODELS)}'
        )
    kwargs = dict(
        n_classes=n_classes,
        dtype=dtype,
        bn_axis_name=bn_axis_name,
        **model_kwargs,
    )
    if model_cls is LateFusionModel:
        kwargs["in_channels"] = dict(in_channels)
    return model_cls(**kwargs)
