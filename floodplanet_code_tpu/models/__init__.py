from floodplanet_code_tpu.models.unet import (
    DoubleConv,
    Down,
    UNet,
    UNetDecoder,
    UNetEncoder,
    Up,
)
from floodplanet_code_tpu.models.water_seg import (
    AUX_FEATURE_KEYS,
    MODELS,
    EarlyFusionModel,
    LateFusionModel,
    WaterSegModel,
    build_model,
    resolve_conv_impl,
)

__all__ = [
    "DoubleConv",
    "Down",
    "UNet",
    "UNetDecoder",
    "UNetEncoder",
    "Up",
    "AUX_FEATURE_KEYS",
    "MODELS",
    "EarlyFusionModel",
    "LateFusionModel",
    "WaterSegModel",
    "build_model",
    "resolve_conv_impl",
]
