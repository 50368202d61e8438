"""Sharded sliding-window full-scene inference engine.

The reference's scene reconstruction (predict.py:206-347, infer.py:112-163)
runs tile-by-tile (batch size 1 in predict!) with host-side numpy stitching.
The TPU engine here:

1. enumerates fixed-shape tiles over each scene (same exact-mode crop math
   as training),
2. runs the jitted forward in batches sharded across the data mesh axis,
3. softmaxes on device and scatter-adds predictions into HBM-resident
   per-scene canvases (inference/stitcher.py) — no per-tile host traffic,
4. finalizes each scene once: overlap-average, argmax/threshold, export.

Returns host numpy canvases keyed by (region, image_name) for the CLIs to
export/report on.
"""

from __future__ import annotations

from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from floodplanet_code_tpu.data import BatchLoader, device_prefetch
from floodplanet_code_tpu.inference.stitcher import (
    DeviceStitcher,
    make_tile_valid_mask,
)
from floodplanet_code_tpu.ops.metrics import confusion_from_preds


from floodplanet_code_tpu.models.water_seg import AUX_FEATURE_KEYS


def _d4_elements(square: bool):
    """The dihedral group as (transpose, flip_h, flip_w) triples.

    Non-square tiles keep only the 4 flip-only elements (transposing would
    change the tile shape).
    """
    import itertools

    ts = (False, True) if square else (False,)
    return [
        (t, fh, fw)
        for t, fh, fw in itertools.product(ts, (False, True), (False, True))
    ]


def _d4_apply(x: jnp.ndarray, t: bool, fh: bool, fw: bool) -> jnp.ndarray:
    if t:
        x = jnp.swapaxes(x, 1, 2)
    if fh:
        x = jnp.flip(x, axis=1)
    if fw:
        x = jnp.flip(x, axis=2)
    return x


def _d4_invert(x: jnp.ndarray, t: bool, fh: bool, fw: bool) -> jnp.ndarray:
    # apply = transpose then flips, so invert = unflip then untranspose.
    if fh:
        x = jnp.flip(x, axis=1)
    if fw:
        x = jnp.flip(x, axis=2)
    if t:
        x = jnp.swapaxes(x, 1, 2)
    return x


def make_predict_step(model, tta: bool = False):
    """Jitted forward -> softmax probabilities [B, H, W, n_classes].

    ``tta=True`` enables dihedral test-time augmentation (beyond-reference
    quality option): the softmax is averaged over all 8 square-symmetry
    transforms of the input (4 flip-only elements for non-square tiles),
    each inverted exactly back to canvas orientation — quarter turns and
    flips are lossless layout ops on TPU, so the only cost is the extra
    forwards. The averaged predictor is exactly D4-equivariant.
    """

    @jax.jit
    def predict_step(variables: dict, batch: dict):
        model_batch = {"image": batch["image"]}
        for key in AUX_FEATURE_KEYS:
            if key in batch:
                model_batch[key] = batch[key]
        if not tta:
            logits = model.apply(variables, model_batch, train=False)
            return jax.nn.softmax(logits, axis=-1)
        shape = model_batch["image"].shape
        elements = _d4_elements(square=shape[1] == shape[2])
        acc = None
        for t, fh, fw in elements:
            tb = {k: _d4_apply(v, t, fh, fw) for k, v in model_batch.items()}
            logits = model.apply(variables, tb, train=False)
            probs = _d4_invert(jax.nn.softmax(logits, axis=-1), t, fh, fw)
            acc = probs if acc is None else acc + probs
        return acc / len(elements)

    return predict_step


def _device_cache_batches(
    dataset, batch_size: int, device_data_bytes: int, data_sharding=None
):
    """Index-driven batches from the HBM scene cache (data/device_cache.py):
    per-batch host->device traffic is ~160 bytes of crop indices instead of
    ~8 MB of pixels — the same 18x real-data win as training. Returns None
    when the dataset does not fit (caller uses the host loader)."""
    import jax

    from floodplanet_code_tpu.data.device_cache import (
        build_device_cache,
        make_batch_builder,
    )

    try:
        cache = build_device_cache(dataset, device_data_bytes)
    except Exception:
        return None  # e.g. unlabeled scenes without label rasters
    if cache is None:
        return None
    out_shardings = None
    if data_sharding is not None:
        pick = (
            data_sharding.get if isinstance(data_sharding, dict)
            else lambda k, d=None: data_sharding
        )
        out_shardings = {
            k: pick(k) for k in ("image", "target", "mean", "std")
        }
        if any(s is None for s in out_shardings.values()):
            out_shardings = None
    builder = make_batch_builder(cache, out_shardings=out_shardings)

    def batches():
        n = len(dataset)
        for start in range(0, n, batch_size):
            idx = np.arange(start, min(start + batch_size, n))
            valid = np.ones(batch_size, bool)
            if len(idx) < batch_size:
                valid[len(idx):] = False
                idx = np.concatenate(
                    [idx, np.zeros(batch_size - len(idx), idx.dtype)]
                )
            batch = builder(jnp.asarray(cache.index_rows(dataset, idx)))
            batch["valid"] = jax.device_put(valid)
            batch["metadata"] = [
                {
                    "image_path": dataset.dataset[i].image_path,
                    "crop_params": dataset.dataset[i].crop_params,
                    "region_name": dataset.dataset[i].region_name,
                }
                if ok
                else None
                for i, ok in zip(idx, valid)
            ]
            yield batch

    return batches()


def resolve_inference_batch_size(cfg, n_devices: int) -> int:
    """Inference batch size: ``tpu.inference_batch_size`` when set, else
    the training ``batch_size``; rounded down to a device multiple (and
    up to at least one tile per device).

    Inference has no backward pass, so it saturates at larger batches
    than training: the round-5 sweep (outputs/perf_r5/infer_sweep.jsonl,
    PERF.md) measured the production forward+stitch cadence at 310.6
    (b8) -> 325.9 (b16) -> 320.6 (b32) tiles/s/chip at 512^2, so the
    config defaults to 16 rather than inheriting the train batch.
    """
    batch_size = int(cfg.select("tpu.inference_batch_size", 0) or 0)
    if batch_size <= 0:
        batch_size = int(cfg.batch_size)
    batch_size = max(batch_size, n_devices)
    return batch_size - batch_size % n_devices


def sliding_window_predict(
    model,
    variables: dict,
    dataset,
    batch_size: int,
    n_workers: int = 4,
    data_sharding=None,
    progress: Callable | None = None,
    collect_extras: bool = False,
    device_data_bytes: int = 6 << 30,
    per_crop_ignore_index: int | None = None,
    tta: bool = False,
    predict_step: Callable | None = None,
) -> Iterator[dict]:
    """Run tiled inference over a dataset; yield per-scene results.

    Yields dicts with keys:
        region, image_name, image_path, probabilities [H,W,C] (overlap-
        averaged softmax), and optionally (collect_extras) the stitched
        ``rgb`` [H,W,C_in] un-normalized input canvas and ``gt`` [H,W]
        label canvas for report generation (predict.py:268-347).

    ``per_crop_ignore_index``: when set, every scene result also carries
    ``crop_confusions`` [n_tiles, C, C] — one confusion matrix per crop as
    the model saw it (ragged-edge mask applied, this ignore_index dropped).
    This reproduces the reference's per-crop metric tallies
    (predict.py:236-261), where ranked image/region reports average
    per-crop scores rather than scoring each stitched scene once.
    """
    # ``predict_step``: inject a pre-built step to keep its jit cache warm
    # across calls — a fresh closure per call would recompile (the serving
    # daemon's case, inference/serve.py).
    if predict_step is None:
        predict_step = make_predict_step(model, tta=tta)

    tile_cms = None
    if per_crop_ignore_index is not None:
        n_cls = dataset.n_classes

        @jax.jit
        def tile_cms(probs_, target_, mask_):
            preds_ = jnp.argmax(probs_, axis=-1)
            return jax.vmap(
                lambda p, t, m: confusion_from_preds(
                    p, t, n_cls, per_crop_ignore_index, m
                )
            )(preds_, target_, mask_)

    n_classes = dataset.n_classes
    pred_stitcher = DeviceStitcher(n_classes)
    extra_stitchers: dict[str, DeviceStitcher] = {}
    scene_info: dict[str, dict] = {}
    tiles_remaining: dict[str, int] = {}
    crop_cms: dict[str, list] = {}

    # Pre-count tiles per scene so finished scenes can be finalized (and
    # freed) as soon as their last tile lands.
    for example in dataset.dataset:
        key = f"{example.region_name}/{_image_name(example.image_path)}"
        tiles_remaining[key] = tiles_remaining.get(key, 0) + 1

    iterator = (
        _device_cache_batches(
            dataset, batch_size, device_data_bytes, data_sharding
        )
        if device_data_bytes
        else None
    )
    if iterator is None:
        loader = BatchLoader(
            dataset,
            batch_size=batch_size,
            shuffle=False,
            n_workers=n_workers,
            drop_last=False,
            output_metadata=True,
            pad_final=True,
        )
        iterator = device_prefetch(iter(loader), sharding=data_sharding, size=2)
    for batch in iterator:
        # Strip host-side metadata before entering jit.
        array_batch = {
            k: v for k, v in batch.items() if k != "metadata"
        }
        probs = predict_step(variables, array_batch)
        metadata = batch["metadata"]
        batch_valid = np.asarray(batch["valid"])

        # Group contiguous runs of the batch by scene for scatter-add.
        tile_h = int(probs.shape[1])
        tile_w = int(probs.shape[2])
        by_scene: dict[str, list[int]] = {}
        for i, md in enumerate(metadata):
            if not batch_valid[i] or md is None:
                continue
            key = f"{md['region_name']}/{_image_name(md['image_path'])}"
            by_scene.setdefault(key, []).append(i)

        for key, idxs in by_scene.items():
            md0 = metadata[idxs[0]]
            cp0 = md0["crop_params"]
            scene_info.setdefault(
                key,
                {
                    "region": md0["region_name"],
                    "image_name": _image_name(md0["image_path"]),
                    "image_path": md0["image_path"],
                    "og_height": cp0.og_height,
                    "og_width": cp0.og_width,
                },
            )
            offsets = np.array(
                [
                    [metadata[i]["crop_params"].h0, metadata[i]["crop_params"].w0]
                    for i in idxs
                ],
                np.int32,
            )
            heights = [metadata[i]["crop_params"].height for i in idxs]
            widths = [metadata[i]["crop_params"].width for i in idxs]
            valid_mask = make_tile_valid_mask(heights, widths, tile_h, tile_w)
            sel = jnp.asarray(np.array(idxs, np.int32))
            tiles = jnp.take(probs, sel, axis=0)
            pred_stitcher.add_batch(
                key,
                cp0.og_height,
                cp0.og_width,
                tiles,
                offsets,
                valid_mask,
                geo_from=md0["image_path"],
            )
            if tile_cms is not None:
                cms = np.asarray(
                    tile_cms(
                        tiles,
                        jnp.take(batch["target"], sel, axis=0),
                        valid_mask,
                    )
                )
                crop_cms.setdefault(key, []).append(cms)
            if collect_extras:
                if "rgb" not in extra_stitchers:
                    extra_stitchers["rgb"] = DeviceStitcher(
                        int(batch["image"].shape[-1])
                    )
                    extra_stitchers["gt"] = DeviceStitcher(1)
                # mean/std are [B,1,1,C]: broadcast directly over [B,H,W,C].
                unnorm = batch["image"] * batch["std"] + batch["mean"]
                extra_stitchers["rgb"].add_batch(
                    key,
                    cp0.og_height,
                    cp0.og_width,
                    jnp.take(unnorm, sel, axis=0),
                    offsets,
                    valid_mask,
                )
                gt = jnp.take(
                    batch["target"].astype(jnp.float32)[..., None], sel, axis=0
                )
                extra_stitchers["gt"].add_batch(
                    key, cp0.og_height, cp0.og_width, gt, offsets, valid_mask
                )
            tiles_remaining[key] -= len(idxs)
            if tiles_remaining[key] == 0:
                info = scene_info.pop(key)
                result = dict(info)
                result["probabilities"] = pred_stitcher.pop_combined(key)
                if tile_cms is not None:
                    result["crop_confusions"] = np.concatenate(
                        crop_cms.pop(key), axis=0
                    )
                if collect_extras:
                    result["rgb"] = extra_stitchers["rgb"].pop_combined(key)
                    result["gt"] = extra_stitchers["gt"].pop_combined(key)[:, :, 0]
                if progress is not None:
                    progress(result)
                yield result


def _image_name(path: str) -> str:
    import os

    return os.path.splitext(os.path.basename(path))[0]
