"""Device-resident dataset cache: scenes live in HBM, crops are sliced on
device, and the per-step host->device transfer shrinks to a handful of
crop indices.

Why: through a remote-TPU tunnel (and on any pod where hosts feed chips
over a network), shipping every 300^2 f32 crop to the device dominates the
step (measured: 9.9 tiles/s transfer-bound vs ~75 tiles/s compute on the
same recipe — an ~8 MB device_put per batch). The FloodPlanet datasets are
small (42 S1 scenes = 0.6 GB, 26 L8 = 1.3 GB at label resolution), so the
TPU-native answer is to push the *scenes* to HBM once and make batch
assembly a device program: dynamic-slice the crop, mask the ragged edge,
normalize — all fused by XLA, with ~160 *bytes* of indices crossing the
host boundary per batch.

Semantics exactly match the host path (data/dataset.py load_example):
range-normalized scenes, crop -> normalize_stats(norm_mode) -> pad to the
fixed model input (zeros for image, ignore_index for target). The cache is
used automatically by fit_model when the dataset fits the byte budget
(``tpu.device_data_bytes``), including multi-host runs (every host builds
the same replicated stacks and batch order, so batch assembly is one SPMD
program — covered by tests/test_multihost.py). Anything it cannot express
(auxiliary modalities) falls back to the threaded host loader.

No reference analog: the reference re-reads scenes from disk per tile
(floodplanet.py:605-609); this is the TPU-native inversion of that design.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np

from floodplanet_code_tpu.data.tiling import CropParams


@dataclass
class DeviceSceneCache:
    """HBM-resident scene stacks + host-side index metadata."""

    images: Any   # [N, Hp, Wp, C] f32 on device (range-normalized)
    labels: Any   # [N, Hp, Wp] int32 on device (binarized, ignore sentinel)
    scene_index: dict  # image_path -> stack slot
    crop_hw: tuple     # (max_crop_height, max_crop_width)
    ignore_index: int
    norm_mode: str | None
    global_mean: Any | None  # [C] f32 when norm_mode == "global"
    global_std: Any | None
    nbytes: int

    def index_rows(self, dataset, indices) -> np.ndarray:
        """[len(indices), 5] int32: (scene, h0, w0, h_len, w_len)."""
        rows = np.empty((len(indices), 5), np.int32)
        for pos, index in enumerate(indices):
            example = dataset.dataset[index]
            cp = example.crop_params
            rows[pos] = (
                self.scene_index[example.image_path],
                cp.h0,
                cp.w0,
                cp.height,
                cp.width,
            )
        return rows


def _full_scene_crop(dataset, image_path: str) -> CropParams:
    label_info = dataset._tiff_info(dataset._label_path(image_path))
    h, w = label_info.height, label_info.width
    return CropParams(0, 0, h, w, h, w, h, w)


def build_device_cache(
    dataset,
    max_bytes: int = 6 << 30,
    sharding=None,
) -> DeviceSceneCache | None:
    """Load every scene of ``dataset`` into device stacks.

    Returns None (caller falls back to the host loader) when the padded
    stacks exceed ``max_bytes``.
    """
    import jax
    import jax.numpy as jnp

    paths = sorted({e.image_path for e in dataset.dataset})
    if not paths:
        return None
    crop_hw = (
        dataset.slice_params.height,
        dataset.slice_params.width,
    )
    shapes = []
    for p in paths:
        info = dataset._tiff_info(dataset._label_path(p))
        shapes.append((info.height, info.width))
    # Pad so a fixed-size dynamic_slice at any valid crop origin stays in
    # bounds without clamping (clamping would shift content off the mask).
    hp = max(h for h, _ in shapes) + crop_hw[0]
    wp = max(w for _, w in shapes) + crop_hw[1]
    n_channels = dataset.n_channels.get(
        "ms_image", next(iter(dataset.n_channels.values()))
    )
    nbytes = len(paths) * hp * wp * (n_channels * 4 + 4)
    if nbytes > max_bytes:
        return None

    images = np.zeros((len(paths), hp, wp, n_channels), np.float32)
    labels = np.full((len(paths), hp, wp), dataset.ignore_index, np.int32)
    scene_index = {}
    for slot, path in enumerate(paths):
        cp = _full_scene_crop(dataset, path)
        chw = dataset._load_crop_norm_image(path, cp)
        lbl = dataset._load_label_image(dataset._label_path(path), cp)
        h, w = chw.shape[1], chw.shape[2]
        images[slot, :h, :w, :] = np.transpose(chw, (1, 2, 0))
        labels[slot, :h, :w] = lbl
        scene_index[path] = slot

    put = partial(jax.device_put, device=sharding) if sharding else jax.device_put
    gm = gs = None
    if dataset.norm_mode == "global":
        params = dataset.global_norm_params[dataset.sensor_key]
        gm = jnp.asarray(params["mean"], jnp.float32)
        gs = jnp.asarray(params["std"], jnp.float32)
    return DeviceSceneCache(
        images=put(jnp.asarray(images)),
        labels=put(jnp.asarray(labels)),
        scene_index=scene_index,
        crop_hw=crop_hw,
        ignore_index=int(dataset.ignore_index),
        norm_mode=dataset.norm_mode,
        global_mean=gm,
        global_std=gs,
        nbytes=int(nbytes),
    )


def build_device_cache_sharded(
    dataset,
    mesh,
    max_bytes_per_device: int = 6 << 30,
    axis: str = "pod",
) -> DeviceSceneCache | None:
    """Pod-sharded variant: the scene stacks shard over ``axis`` instead of
    replicating, so per-device HBM residency is ~total/n_pods — the
    pod-scale data path (a dataset too big to replicate still caches when
    it fits divided across slices).

    Each host loads ONLY the scenes its addressable shards own
    (jax.make_array_from_callback), so host RAM is not replicated either.
    Batch assembly pays one per-step psum of the crop batch over the DCN
    'pod' axis (make_batch_builder_podsharded) — a few MB against the
    full stacks' GBs.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if axis not in mesh.axis_names:
        return None
    n_pods = int(mesh.shape[axis])
    paths = sorted({e.image_path for e in dataset.dataset})
    if not paths:
        return None
    crop_hw = (dataset.slice_params.height, dataset.slice_params.width)
    shapes = []
    for p in paths:
        info = dataset._tiff_info(dataset._label_path(p))
        shapes.append((info.height, info.width))
    hp = max(h for h, _ in shapes) + crop_hw[0]
    wp = max(w for _, w in shapes) + crop_hw[1]
    n_channels = dataset.n_channels.get(
        "ms_image", next(iter(dataset.n_channels.values()))
    )
    # Pad the scene count to a multiple of the pod axis; dummy slots are
    # zero/ignore and never referenced by index_rows.
    n_padded = -(-len(paths) // n_pods) * n_pods
    nbytes = n_padded * hp * wp * (n_channels * 4 + 4)
    if nbytes // n_pods > max_bytes_per_device:
        return None

    scene_index = {path: slot for slot, path in enumerate(paths)}

    def load_slot(slot: int):
        if slot >= len(paths):
            return None  # padding slot
        path = paths[slot]
        cp = _full_scene_crop(dataset, path)
        chw = dataset._load_crop_norm_image(path, cp)
        lbl = dataset._load_label_image(dataset._label_path(path), cp)
        return np.transpose(chw, (1, 2, 0)), lbl

    loaded: dict[int, tuple] = {}

    def image_cb(index):
        sl = index[0]
        start, stop = sl.indices(n_padded)[:2]
        block = np.zeros((stop - start, hp, wp, n_channels), np.float32)
        for slot in range(start, stop):
            if slot not in loaded:
                loaded[slot] = load_slot(slot)
            entry = loaded[slot]
            if entry is not None:
                img, _ = entry
                block[slot - start, : img.shape[0], : img.shape[1]] = img
        return block

    def label_cb(index):
        sl = index[0]
        start, stop = sl.indices(n_padded)[:2]
        block = np.full(
            (stop - start, hp, wp), dataset.ignore_index, np.int32
        )
        for slot in range(start, stop):
            if slot not in loaded:
                loaded[slot] = load_slot(slot)
            entry = loaded[slot]
            if entry is not None:
                _, lbl = entry
                block[slot - start, : lbl.shape[0], : lbl.shape[1]] = lbl
        return block

    sharding = NamedSharding(mesh, P(axis))
    images = jax.make_array_from_callback(
        (n_padded, hp, wp, n_channels), sharding, image_cb
    )
    labels = jax.make_array_from_callback((n_padded, hp, wp), sharding, label_cb)
    loaded.clear()

    gm = gs = None
    if dataset.norm_mode == "global":
        params = dataset.global_norm_params[dataset.sensor_key]
        gm = jnp.asarray(params["mean"], jnp.float32)
        gs = jnp.asarray(params["std"], jnp.float32)
    return DeviceSceneCache(
        images=images,
        labels=labels,
        scene_index=scene_index,
        crop_hw=crop_hw,
        ignore_index=int(dataset.ignore_index),
        norm_mode=dataset.norm_mode,
        global_mean=gm,
        global_std=gs,
        nbytes=int(nbytes),
    )


def _make_crop_one(cache: DeviceSceneCache):
    """Per-example device pipeline shared by both builders: fixed-size
    dynamic slice, ragged-edge mask, normalize_stats semantics
    (null / global / local), zero / ignore_index padding."""
    import jax
    import jax.numpy as jnp

    ch, cw = cache.crop_hw
    ignore = cache.ignore_index
    norm_mode = cache.norm_mode
    n_channels = int(cache.images.shape[-1])

    def one(images, labels, row):
        scene, h0, w0, h_len, w_len = (row[i] for i in range(5))
        img = jax.lax.dynamic_slice(
            images, (scene, h0, w0, 0), (1, ch, cw, n_channels)
        )[0]
        lbl = jax.lax.dynamic_slice(labels, (scene, h0, w0), (1, ch, cw))[0]
        ri = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 1)
        inside = (ri < h_len) & (ci < w_len)
        if norm_mode == "local":
            m = inside[..., None].astype(jnp.float32)
            n = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(img * m, axis=(0, 1)) / n
            var = jnp.sum(jnp.square(img - mean) * m, axis=(0, 1)) / n
            std = jnp.sqrt(var)
            std = jnp.where(std == 0, 1.0, std)
        elif norm_mode == "global":
            mean, std = cache.global_mean, cache.global_std
        else:
            mean = jnp.zeros((n_channels,), jnp.float32)
            std = jnp.ones((n_channels,), jnp.float32)
        img = jnp.where(inside[..., None], (img - mean) / std, 0.0)
        lbl = jnp.where(inside, lbl, ignore)
        return img, lbl, mean.reshape(1, 1, -1), std.reshape(1, 1, -1)

    return one


def make_batch_builder(
    cache: DeviceSceneCache, out_shardings=None, rows_sharding=None
):
    """Jitted: (rows [B,5] int32) -> {image, target, mean, std} on device.

    Exactly replicates the host path's per-example pipeline: fixed-size
    dynamic slice, ragged-edge mask, normalize_stats semantics
    (null / global / local), zero / ignore_index padding.

    ``rows_sharding``: required under multi-host — every input of a
    multi-process jit must be a global array, so the (identical,
    deterministically seeded) per-host row batch is placed replicated on
    the global mesh before the call.
    """
    import jax
    import jax.numpy as jnp

    one = _make_crop_one(cache)

    # The stacks are jit *arguments*, not closure captures: closed-over
    # concrete arrays get baked into the HLO as literals, which ships the
    # whole 0.9 GB stack to the compiler (observed HTTP 413 from a remote
    # compile service).
    @partial(jax.jit, out_shardings=out_shardings)
    def build_impl(images, labels, rows: jnp.ndarray) -> dict:
        img, lbl, mean, std = jax.vmap(one, in_axes=(None, None, 0))(
            images, labels, rows
        )
        return {"image": img, "target": lbl, "mean": mean, "std": std}

    def build(rows):
        rows = jnp.asarray(rows)
        if rows_sharding is not None:
            rows = jax.device_put(rows, rows_sharding)
        return build_impl(cache.images, cache.labels, rows)

    return build


def make_batch_builder_podsharded(
    cache: DeviceSceneCache,
    mesh,
    batch_size: int,
    axis: str = "pod",
    rows_sharding=None,
):
    """Batch builder for a pod-sharded cache (build_device_cache_sharded).

    shard_map over the full mesh: every cell slices the examples whose
    scenes live in ITS local stack shard (contributing zeros for the rest,
    exactly one owner per example), one psum over the ``axis`` (DCN) axis
    assembles the full crop batch, and each cell keeps its own batch
    shard. Batch content is IDENTICAL to the replicated builder's —
    proven by tests/test_device_cache_sharded.py — at the cost of a
    ~B x crop-sized psum per step instead of n_pods x full-stack HBM.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    one = _make_crop_one(cache)
    batch_axes = tuple(a for a in mesh.axis_names if a != "space")
    n_shards = 1
    for a in batch_axes:
        n_shards *= int(mesh.shape[a])
    if batch_size % n_shards:
        raise ValueError(
            f"batch_size {batch_size} must divide over {n_shards} batch shards"
        )
    b_cell = batch_size // n_shards
    scenes_per_pod = int(cache.images.shape[0]) // int(mesh.shape[axis])

    def cell(images_shard, labels_shard, rows):
        pod = jax.lax.axis_index(axis)

        def one_owned(row):
            local = row[0] - pod * scenes_per_pod
            owned = (local >= 0) & (local < scenes_per_pod)
            local_row = jnp.concatenate(
                [jnp.clip(local, 0, scenes_per_pod - 1)[None], row[1:]]
            )
            img, lbl, mean, std = one(images_shard, labels_shard, local_row)
            zero = lambda x: jnp.where(owned, x, jnp.zeros_like(x))
            return zero(img), zero(lbl), zero(mean), zero(std)

        img, lbl, mean, std = jax.vmap(one_owned)(rows)
        # Exactly one pod owns each example; the psum is the exchange.
        img, mean, std = jax.lax.psum((img, mean, std), axis)
        lbl = jax.lax.psum(lbl, axis)
        # Keep this cell's batch shard (row-major over the batch axes,
        # matching P(batch_axes) layout).
        shard_id = jnp.zeros((), jnp.int32)
        for a in batch_axes:
            shard_id = shard_id * mesh.shape[a] + jax.lax.axis_index(a)
        start = shard_id * b_cell
        take = lambda x: jax.lax.dynamic_slice_in_dim(x, start, b_cell, 0)
        return {
            "image": take(img),
            "target": take(lbl),
            "mean": take(mean),
            "std": take(std),
        }

    batch_spec = P(batch_axes)
    sharded = jax.shard_map(
        cell,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs={k: batch_spec for k in ("image", "target", "mean", "std")},
    )
    build_impl = jax.jit(sharded)

    if rows_sharding is None:
        rows_sharding = NamedSharding(mesh, P())

    def build(rows):
        rows = jax.device_put(jnp.asarray(rows), rows_sharding)
        return build_impl(cache.images, cache.labels, rows)

    return build
