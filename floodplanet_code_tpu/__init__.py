"""floodplanet_code_tpu — a TPU-native flood-water segmentation framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference GPU pipeline (ddrainer/FloodPlanet_Code, a PyTorch-Lightning UNet
stack; see SURVEY.md at the repo root for the full structural analysis):

- Tiled multi-sensor GeoTIFF data loading (PlanetScope / Sentinel-1 /
  Sentinel-2 / Landsat-8) with per-sensor radiometric normalization
  (reference: st_water_seg/datasets/floodplanet.py:288-527).
- Region-aware leave-region-out or random train/val splitting
  (reference: st_water_seg/datasets/floodplanet.py:141-232).
- UNet plus early-/late-fusion variants (reference: st_water_seg/models/).
- Ignore-index-aware CE loss and micro F1/IoU/accuracy metrics
  (reference: st_water_seg/models/water_seg_model.py:40-63).
- Top-k checkpointing keyed on validation water IoU (reference: fit.py:80-85).
- Sliding-window full-scene inference with overlap-averaged stitching and
  GeoTIFF mask export (reference: predict.py, infer.py, utils_image.py:364).

Design is TPU-first rather than a port: NHWC tensors feeding the MXU,
bf16 compute with f32 params, jit/shard_map data parallelism over a
jax.sharding.Mesh, on-device batch augmentation, on-device overlap
stitching, and Pallas kernels for the hot fused conv blocks.
"""

__version__ = "0.3.0"
