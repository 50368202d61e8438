from floodplanet_code_tpu.inference.stitcher import (
    DeviceStitcher,
    ImageStitcher,
    finalize_canvas,
    make_tile_valid_mask,
    stitch_batch,
)
from floodplanet_code_tpu.inference.sliding import (
    make_predict_step,
    sliding_window_predict,
)

__all__ = [
    "DeviceStitcher",
    "ImageStitcher",
    "finalize_canvas",
    "make_tile_valid_mask",
    "stitch_batch",
    "make_predict_step",
    "sliding_window_predict",
]
