from floodplanet_code_tpu.data.dataset import (
    DATASETS,
    FloodPlanetDataset,
    build_dataset,
)
from floodplanet_code_tpu.data.loader import BatchLoader, device_prefetch
from floodplanet_code_tpu.data.tiling import (
    CropParams,
    ImageSlice,
    crop_params_for_scene,
    generate_image_slice_object,
    get_crop_slices,
)

__all__ = [
    "DATASETS",
    "FloodPlanetDataset",
    "build_dataset",
    "BatchLoader",
    "device_prefetch",
    "CropParams",
    "ImageSlice",
    "crop_params_for_scene",
    "generate_image_slice_object",
    "get_crop_slices",
]
