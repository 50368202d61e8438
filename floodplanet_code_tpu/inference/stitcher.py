"""Overlap-averaged scene stitching: host-side class + on-device kernel.

The reference reassembles full scenes from overlapping tile predictions with
``ImageStitcher_v2`` (utils_image.py:364-571): per-scene accumulation canvas
plus hit-count weight canvas, divided at the end (+1e-5) and NaN-scrubbed —
all host-side numpy. This module provides:

- ``ImageStitcher``: API-compatible host implementation (used for small
  scenes, RGB/GT export, and as the correctness oracle in tests).
- ``stitch_batch``: the TPU-native path — a jit-compiled scatter-add of a
  *batch* of fixed-shape tiles into HBM-resident canvases. Tiles fan out
  across the device mesh for the forward pass, and their predictions
  accumulate on device without a host round-trip per tile (the SP analog of
  SURVEY.md §5.7). Edge tiles carry a validity mask so zero-padded regions
  add zero weight.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from floodplanet_code_tpu.geo import tiff


class ImageStitcher:
    """Host-side overlap-average stitcher (reference utils_image.py:364)."""

    def __init__(
        self,
        save_dir: str,
        image_type_name: str = "",
        save_backend: str = "tifffile",
        save_ext: str = ".tif",
    ):
        self.save_dir = save_dir
        self.save_ext = save_ext
        self.save_backend = save_backend
        self.image_type_name = image_type_name
        self._images_combined = False
        os.makedirs(save_dir, exist_ok=True)
        self.image_canvas: dict[str, np.ndarray] = {}
        self.weight_canvas: dict[str, np.ndarray] = {}
        self.geo_sources: dict[str, str] = {}

    def add_image(
        self,
        image: np.ndarray,
        image_name: str,
        crop_info,
        og_height: int,
        og_width: int,
        geo_from: str | None = None,
    ) -> None:
        """Accumulate one tile ([h,w] or [h,w,c]) into the scene canvas."""
        h0, w0, hE, wE = crop_info.h0, crop_info.w0, crop_info.hE, crop_info.wE
        dh, dw = hE - h0, wE - w0
        if image_name not in self.image_canvas:
            if image.ndim == 2:
                shape = (og_height, og_width)
            elif image.ndim == 3:
                shape = (og_height, og_width, image.shape[-1])
            else:
                raise NotImplementedError
            self.image_canvas[image_name] = np.zeros(shape, dtype=np.float32)
            self.weight_canvas[image_name] = np.zeros(
                (og_height, og_width), dtype=np.float32
            )
        if geo_from is not None:
            self.geo_sources.setdefault(image_name, geo_from)
        if image.ndim == 2:
            self.image_canvas[image_name][h0:hE, w0:wE] += image[:dh, :dw]
        else:
            self.image_canvas[image_name][h0:hE, w0:wE, :] += image[:dh, :dw, :]
        self.weight_canvas[image_name][h0:hE, w0:wE] += 1.0

    def add_images(self, images, image_names, crop_info, og_heights, og_widths):
        for img, name, crop, oh, ow in zip(
            images, image_names, crop_info, og_heights, og_widths
        ):
            self.add_image(img, name, crop, oh, ow)

    def _combine_images(self) -> None:
        if self._images_combined:
            return
        for name in self.image_canvas:
            weights = self.weight_canvas[name] + 1e-5
            canvas = self.image_canvas[name]
            if canvas.ndim == 3:
                weights = weights[:, :, None]
            self.image_canvas[name] = np.nan_to_num(canvas / weights)
        self._images_combined = True

    def get_combined_images(self) -> dict:
        self._combine_images()
        return self.image_canvas

    def save_images(self, save_class: bool = False):
        """Save each combined canvas; returns (paths, names, sizes).

        ``save_class`` thresholds at 0.5 (utils_image.py:522-525). The
        tifffile backend writes float32 GeoTIFFs through the native writer
        (the reference casts to float16; we keep f32 for fidelity), carrying
        geo tags from a registered source scene.
        """
        save_paths, image_names, image_sizes = [], [], []
        self._combine_images()
        for name, canvas in self.image_canvas.items():
            img_dir = os.path.join(self.save_dir, name)
            os.makedirs(img_dir, exist_ok=True)
            path = os.path.join(img_dir, self.image_type_name + self.save_ext)
            image = canvas.copy()
            if save_class:
                image = (image >= 0.5).astype(np.float32)
            if self.save_backend == "tifffile":
                tiff.imwrite(
                    path,
                    image if image.ndim == 2 else np.transpose(image, (2, 0, 1)),
                    geo_from=self.geo_sources.get(name),
                )
            elif self.save_backend == "PIL":
                from PIL import Image

                out = image
                if out.max() <= 1.0:
                    out = out * 255
                Image.fromarray(out.astype(np.uint8)).save(path)
            else:
                raise NotImplementedError(
                    f'No save backend "{self.save_backend}"'
                )
            save_paths.append(path)
            image_names.append(name)
            image_sizes.append(canvas.shape)
        return save_paths, image_names, image_sizes


# ---------------------------------------------------------------------------
# On-device batched scatter-add stitching.
# ---------------------------------------------------------------------------


@partial(jax.jit, donate_argnums=(0, 1))
def stitch_batch(
    canvas: jnp.ndarray,  # [H, W, C] float32
    weights: jnp.ndarray,  # [H, W] float32
    tiles: jnp.ndarray,  # [B, h, w, C] float32 (fixed tile shape)
    offsets: jnp.ndarray,  # [B, 2] int32 (y0, x0)
    tile_valid: jnp.ndarray,  # [B, h, w] float32 validity (crop extent + batch mask)
):
    """Scatter-add a batch of tiles into one scene canvas, on device.

    Tiles beyond a scene edge were zero-padded at load; their ``tile_valid``
    mask zeroes both the contribution and the weight, so the final
    divide reproduces the host stitcher exactly.

    NOTE: callers must size the canvas so every tile fits entirely
    (``H >= max(y0) + tile_h``): ``lax.dynamic_slice`` clamps out-of-bounds
    starts, which would silently shift edge tiles. DeviceStitcher allocates
    canvases with one tile of slack and crops at finalize.
    """

    def body(i, carry):
        canvas, weights = carry
        y0 = offsets[i, 0]
        x0 = offsets[i, 1]
        tile = tiles[i] * tile_valid[i][:, :, None]
        h, w = tile.shape[0], tile.shape[1]
        patch = jax.lax.dynamic_slice(canvas, (y0, x0, 0), (h, w, canvas.shape[2]))
        canvas = jax.lax.dynamic_update_slice(canvas, patch + tile, (y0, x0, 0))
        wpatch = jax.lax.dynamic_slice(weights, (y0, x0), (h, w))
        weights = jax.lax.dynamic_update_slice(
            weights, wpatch + tile_valid[i], (y0, x0)
        )
        return canvas, weights

    return jax.lax.fori_loop(0, tiles.shape[0], body, (canvas, weights))


@jax.jit
def finalize_canvas(canvas: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Divide by hit counts (+1e-5) and NaN-scrub (utils_image.py:465-494)."""
    out = canvas / (weights[:, :, None] + 1e-5)
    return jnp.nan_to_num(out)


def make_tile_valid_mask(
    crop_heights: np.ndarray,
    crop_widths: np.ndarray,
    tile_h: int,
    tile_w: int,
    batch_valid: np.ndarray | None = None,
) -> np.ndarray:
    """[B, tile_h, tile_w] 0/1 mask of the in-scene region of each tile."""
    b = len(crop_heights)
    rows = np.arange(tile_h)[None, :, None] < np.asarray(crop_heights)[:, None, None]
    cols = np.arange(tile_w)[None, None, :] < np.asarray(crop_widths)[:, None, None]
    mask = (rows & cols).astype(np.float32)
    if batch_valid is not None:
        mask = mask * np.asarray(batch_valid, dtype=np.float32)[:, None, None]
    return mask


class DeviceStitcher:
    """Accumulates batches of tile predictions into per-scene HBM canvases.

    The device-side analog of ImageStitcher: canvases stay on device across
    batches; ``combined()`` finalizes and pulls to host once per scene.

    Big-raster safety: a scene whose canvas (+slack +weights) would exceed
    ``max_canvas_bytes`` of HBM is accumulated on host instead (numpy
    scatter-add per batch) — "deploy over a time series" (Batch_infer.sh)
    is exactly where 10k+ px rasters appear, and a 10k x 10k x C f32 canvas
    plus weights does not belong on one logical device.
    """

    def __init__(self, n_channels: int, max_canvas_bytes: int = 1 << 30):
        self.n_channels = n_channels
        self.max_canvas_bytes = max_canvas_bytes
        self._canvas: dict[str, jnp.ndarray] = {}
        self._weights: dict[str, jnp.ndarray] = {}
        self._host: dict[str, ImageStitcherLike] = {}
        self._og_shape: dict[str, tuple] = {}
        self.geo_sources: dict[str, str] = {}

    def _canvas_bytes(self, pad_h: int, pad_w: int) -> int:
        return pad_h * pad_w * (self.n_channels + 1) * 4

    def ensure_scene(
        self, name: str, og_height: int, og_width: int, tile_h: int, tile_w: int
    ):
        if name in self._canvas or name in self._host:
            return
        # One tile of slack so edge tiles (y0 + tile_h > H) scatter
        # without dynamic_slice start-clamping; cropped at finalize.
        pad_h, pad_w = og_height + tile_h, og_width + tile_w
        if self._canvas_bytes(pad_h, pad_w) > self.max_canvas_bytes:
            self._host[name] = ImageStitcherLike(
                og_height, og_width, self.n_channels
            )
        else:
            self._canvas[name] = jnp.zeros(
                (pad_h, pad_w, self.n_channels), jnp.float32
            )
            self._weights[name] = jnp.zeros((pad_h, pad_w), jnp.float32)
        self._og_shape[name] = (og_height, og_width)

    def add_batch(
        self,
        name: str,
        og_height: int,
        og_width: int,
        tiles: jnp.ndarray,
        offsets: np.ndarray,
        tile_valid: np.ndarray,
        geo_from: str | None = None,
    ):
        self.ensure_scene(
            name, og_height, og_width, int(tiles.shape[1]), int(tiles.shape[2])
        )
        if geo_from is not None:
            self.geo_sources.setdefault(name, geo_from)
        if name in self._host:
            self._host[name].add_batch(
                np.asarray(tiles), np.asarray(offsets), np.asarray(tile_valid)
            )
            return
        self._canvas[name], self._weights[name] = stitch_batch(
            self._canvas[name],
            self._weights[name],
            tiles,
            jnp.asarray(offsets, jnp.int32),
            jnp.asarray(tile_valid, jnp.float32),
        )

    def scene_names(self):
        return list(self._canvas.keys()) + list(self._host.keys())

    def combined(self, name: str) -> np.ndarray:
        h, w = self._og_shape[name]
        if name in self._host:
            return self._host[name].combined()
        full = np.asarray(
            finalize_canvas(self._canvas[name], self._weights[name])
        )
        return full[:h, :w]

    def pop_combined(self, name: str) -> np.ndarray:
        out = self.combined(name)
        self._canvas.pop(name, None)
        self._weights.pop(name, None)
        self._host.pop(name, None)
        del self._og_shape[name]
        return out


class ImageStitcherLike:
    """Host (numpy) accumulation canvas for scenes too large for HBM.

    Same accumulate/divide semantics as stitch_batch/finalize_canvas;
    edge tiles are cropped to the scene bounds instead of using slack.
    """

    def __init__(self, og_height: int, og_width: int, n_channels: int):
        self.h, self.w = og_height, og_width
        self.canvas = np.zeros((og_height, og_width, n_channels), np.float32)
        self.weights = np.zeros((og_height, og_width), np.float32)

    def add_batch(
        self, tiles: np.ndarray, offsets: np.ndarray, tile_valid: np.ndarray
    ) -> None:
        for i in range(tiles.shape[0]):
            y0, x0 = int(offsets[i, 0]), int(offsets[i, 1])
            th = min(tiles.shape[1], self.h - y0)
            tw = min(tiles.shape[2], self.w - x0)
            if th <= 0 or tw <= 0:
                continue
            v = tile_valid[i, :th, :tw]
            self.canvas[y0 : y0 + th, x0 : x0 + tw] += (
                tiles[i, :th, :tw] * v[:, :, None]
            )
            self.weights[y0 : y0 + th, x0 : x0 + tw] += v

    def combined(self) -> np.ndarray:
        return np.nan_to_num(self.canvas / (self.weights[:, :, None] + 1e-5))
