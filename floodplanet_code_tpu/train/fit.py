"""Training entry point: fit_model(cfg) — the reference fit.py, TPU-native.

Pipeline (reference call stack SURVEY.md §3.1, rebuilt):
  compose cfg -> build train/valid FloodPlanetDatasets -> threaded
  BatchLoaders -> flax model -> jit-compiled SPMD train step over a
  data-parallel Mesh (grad psum + global BN stats + exact CM metrics come
  from the partitioner) -> on-device batched augmentation inside the step ->
  TensorBoard scalars -> orbax top-k checkpoints keyed on
  val_MulticlassJaccardIndex -> returns best checkpoint path.

TPU-first differences from the reference:
- augmentation is on-device inside the jitted step (not host torchvision),
- one compiled shape: ragged tiles were padded at load, train drops the
  ragged final batch,
- full TrainState resume from the latest checkpoint (the reference cannot
  resume mid-training, SURVEY.md §5.4),
- metrics are confusion-matrix accumulators — no torchmetrics
  double-update quirk (§7.6).
"""

from __future__ import annotations

import datetime
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from floodplanet_code_tpu.config import Config, save_config
from floodplanet_code_tpu.data import (
    BatchLoader,
    build_dataset,
    device_prefetch,
    generate_image_slice_object,
)
from floodplanet_code_tpu.data.augment import TransformParams, augment_batch
from floodplanet_code_tpu.models import build_model, resolve_conv_impl
from floodplanet_code_tpu.models.water_seg import AUX_FEATURE_KEYS
from floodplanet_code_tpu.ops.losses import (
    cross_entropy_ignore,
    dice_loss,
    weighted_cross_entropy,
)
from floodplanet_code_tpu.ops.metrics import (
    compute_binary_class_metrics,
    compute_metrics,
    confusion_from_logits,
    torchmetrics_key_names,
)
from floodplanet_code_tpu.parallel.mesh import (
    batch_sharding,
    batch_shardings_for,
    detect_n_pods,
    make_hybrid_mesh,
    make_mesh,
    make_mesh_2d,
    n_batch_shards,
    replicate_state,
)
from floodplanet_code_tpu.train.checkpoint import MONITOR_KEY, CheckpointManager
from floodplanet_code_tpu.train.state import (
    TrainState,
    create_train_state,
    ema_decay_at,
)


def resolve_ignore_index(ignore_index: int, n_classes: int) -> int:
    """-1 sentinel -> last class (reference water_seg_model.py:35-36)."""
    if ignore_index == -1:
        return n_classes - 1
    return ignore_index


def make_loss_fn(loss_cfg, ignore_index: int):
    """Loss factory: ce | weighted_ce | ce_dice (conf key ``loss``).

    The reference supports plain CE only (water_seg_model.py:40); the
    weighted/Dice recipes cover BASELINE.json configs[3].
    """
    name = "ce"
    class_weights = None
    dice_weight = 0.5
    if loss_cfg is not None:
        name = loss_cfg.get("name", "ce") if hasattr(loss_cfg, "get") else "ce"
        class_weights = loss_cfg.get("class_weights")
        dice_weight = float(loss_cfg.get("dice_weight", 0.5) or 0.5)
    if name == "ce":
        return lambda logits, target: cross_entropy_ignore(
            logits, target, ignore_index
        )
    if name == "weighted_ce":
        if class_weights is None:
            raise ValueError("loss.name=weighted_ce requires loss.class_weights")
        weights = jnp.asarray([float(w) for w in class_weights], jnp.float32)
        return lambda logits, target: weighted_cross_entropy(
            logits, target, weights, ignore_index
        )
    if name == "ce_dice":
        weights = (
            jnp.asarray([float(w) for w in class_weights], jnp.float32)
            if class_weights is not None
            else None
        )

        def ce_dice(logits, target):
            if weights is not None:
                ce = weighted_cross_entropy(logits, target, weights, ignore_index)
            else:
                ce = cross_entropy_ignore(logits, target, ignore_index)
            return ce + dice_weight * dice_loss(logits, target, ignore_index)

        return ce_dice
    raise NotImplementedError(f'No implementation for loss "{name}"')


def make_augment_step(transform_params: TransformParams, ignore_index: int):
    """Jitted standalone augmentation: (rng, batch) -> batch.

    Kept as its own XLA program rather than fused into the train step:
    measured on v5e, fusing the rotation into the training graph degrades
    the combined program by ~2x the rotation's standalone cost (layout /
    scheduling interaction), while two dispatches are nearly free.
    """
    if not transform_params.any_active:
        return None

    @jax.jit
    def augment_step(rng: jax.Array, batch: dict):
        image, target = augment_batch(
            rng, batch["image"], batch["target"], transform_params, ignore_index
        )
        out = dict(batch)
        out["image"] = image
        out["target"] = target
        return out

    return augment_step


def make_train_step(
    model,
    ignore_index: int,
    transform_params: TransformParams,
    loss_cfg=None,
    fuse_augmentation: bool = True,
    ema_decay: float = 0.0,
    ema_warmup: bool = True,
):
    """Build the jitted train step: [augment ->] forward -> loss -> update.

    ``fuse_augmentation=False`` leaves augmentation to a separate
    make_augment_step program (the fast path on TPU; see its docstring).
    ``ema_decay``: when the state carries ``ema_params``, they are updated
    as ``d*ema + (1-d)*params`` after the optimizer step (one fused
    elementwise pass; ~free next to the backward). ``ema_warmup`` ramps
    the decay over a growing horizon so short runs track instead of lag
    (train/state.ema_decay_at; tpu config key ``ema_warmup``).

    Returns (state, rng) -> (state', logs) where logs carries the scalar
    loss and the batch confusion matrix (additive across steps).
    """
    loss_of = make_loss_fn(loss_cfg, ignore_index)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        image, target = batch["image"], batch["target"]
        if fuse_augmentation and transform_params.any_active:
            image, target = augment_batch(
                rng, image, target, transform_params, ignore_index
            )

        model_batch = {"image": image}
        for key in AUX_FEATURE_KEYS:
            if key in batch:
                model_batch[key] = batch[key]

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            logits, updates = model.apply(
                variables, model_batch, train=True, mutable=mutable
            )
            loss = loss_of(logits, target)
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if state.batch_stats is not None:
            state = state.replace(batch_stats=updates["batch_stats"])
        if state.ema_params is not None:
            # state.step already counts this update (apply_gradients above).
            d = ema_decay_at(state.step, ema_decay) if ema_warmup else ema_decay
            state = state.replace(
                ema_params=jax.tree.map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state.ema_params,
                    state.params,
                )
            )
        confusion = confusion_from_logits(logits, target, ignore_index)
        return state, {"loss": loss, "confusion": confusion}

    return train_step


def make_eval_step(model, ignore_index: int):
    """Jitted eval step -> (loss_sum, confusion); padded rows masked out.

    Evaluates with ``ema_params`` when the state carries them (EMA
    training monitors/selects checkpoints on the averaged weights).
    """

    @jax.jit
    def eval_step(state: TrainState, batch: dict):
        model_batch = {"image": batch["image"]}
        for key in AUX_FEATURE_KEYS:
            if key in batch:
                model_batch[key] = batch[key]
        variables = {
            "params": (
                state.ema_params
                if state.ema_params is not None
                else state.params
            )
        }
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, model_batch, train=False)
        valid = batch["valid"].astype(jnp.float32)[:, None, None]
        loss = cross_entropy_ignore(
            logits, batch["target"], ignore_index, sample_weight=valid
        )
        confusion = confusion_from_logits(
            logits, batch["target"], ignore_index, sample_weight=valid
        )
        return {"loss": loss, "confusion": confusion}

    return eval_step


def _steps_per_epoch(cfg, train_dataset, batch_size: int) -> int:
    """Train steps per epoch: drop_last batching, limit_train_batches cap."""
    steps = max(1, len(train_dataset) // batch_size)
    limit = int(cfg.select("limit_train_batches") or 0)
    return min(steps, limit) if limit else steps


def default_experiment_dir(cfg: Config) -> str:
    pattern = cfg.select("run.dir", "./outputs/{date}/{name}/")
    name = cfg.select("run.name", "default")
    return pattern.format(date=datetime.date.today().isoformat(), name=name)


def fit_model(cfg: Config, overwrite_exp_dir: str | None = None) -> str:
    """Train; returns the best checkpoint path (reference fit.py:16-103)."""
    from floodplanet_code_tpu.parallel import multihost

    # Multi-host: join the jax.distributed cluster when configured (no-op
    # single-process). Only the coordinator writes config/ckpts/TB.
    multihost.initialize_from_env_or_config(cfg)
    coordinator = multihost.is_coordinator()

    # Wall-clock decomposition of the whole fit (written to
    # <exp_dir>/timing.json): setup / compile / train / eval / checkpoint
    # per epoch, so the epoch-level tiles/s can be reconciled against the
    # step-level bench rate (PERF.md "where the minutes go").
    fit_start = time.time()
    timing_epochs: list[dict] = []

    exp_dir = overwrite_exp_dir or default_experiment_dir(cfg)
    if coordinator:
        os.makedirs(exp_dir, exist_ok=True)
        save_config(cfg, exp_dir)

    if cfg.select("tpu.debug_nans", False):
        jax.config.update("jax_debug_nans", True)

    slice_params = generate_image_slice_object(
        cfg.crop_height, cfg.crop_width, cfg.crop_stride
    )
    dataset_kwargs = cfg.dataset.get("dataset_kwargs") or {}

    common = dict(
        sensor=cfg.dataset.sensor,
        channels=cfg.dataset.channels,
        norm_mode=cfg.norm_mode,
        eval_region=cfg.eval_region,
        ignore_index=cfg.ignore_index,
        seed_num=cfg.seed_num,
        train_split_pct=cfg.train_split_pct,
        **dataset_kwargs,
    )
    train_dataset = build_dataset(cfg.dataset.name, "train", slice_params, **common)
    valid_dataset = build_dataset(cfg.dataset.name, "valid", slice_params, **common)

    n_classes = train_dataset.n_classes
    ignore_index = resolve_ignore_index(cfg.ignore_index, n_classes)

    spatial = int(cfg.select("tpu.spatial_shards", 1) or 1)
    total = int(cfg.select("tpu.n_devices") or len(jax.devices()))
    # DCN granules: TPU slices when the runtime exposes them (multi-slice
    # pods have several hosts per slice), else processes.
    n_procs = detect_n_pods() if multihost.process_count() > 1 else 1
    if spatial > 1:
        mesh = make_mesh_2d(total // spatial, spatial)
    elif (
        n_procs > 1
        and total > n_procs
        and total % n_procs == 0
        and cfg.select("tpu.spmd_impl", "gspmd") in (None, "gspmd")
    ):
        # Multi-host data parallelism: hierarchical ('pod', 'data') mesh so
        # the partitioner schedules the gradient all-reduce as ICI
        # reduce-scatter within each host/slice plus one small DCN
        # cross-pod exchange (mesh.make_hybrid_mesh). The batch shards
        # jointly over both axes — same example-to-device assignment as the
        # flat mesh, so per-host loading (BatchLoader process_shard) is
        # unchanged. (shard_map spmd_impl needs the flat 1-D mesh.)
        mesh = make_hybrid_mesh(n_procs, total // n_procs)
    else:
        mesh = make_mesh(cfg.select("tpu.n_devices"))
    print(f"[fit] mesh axes: {dict(mesh.shape)}")
    data_sharding = batch_shardings_for(mesh)
    n_data = n_batch_shards(mesh)
    # The global batch must split evenly over both the data-axis shards and
    # the host processes (each host loads batch/process_count examples).
    divisor = n_data * multihost.process_count() // (
        np.gcd(n_data, multihost.process_count())
    )
    n_devices = divisor
    batch_size = cfg.batch_size
    if batch_size % n_devices != 0:
        batch_size = max(n_devices, (batch_size // n_devices) * n_devices)
        print(
            f"[fit] batch_size {cfg.batch_size} not divisible by {n_devices} "
            f"data shards; using {batch_size}"
        )

    shard = multihost.process_shard()
    train_loader = BatchLoader(
        train_dataset,
        batch_size=batch_size,
        shuffle=True,
        n_workers=cfg.n_workers,
        drop_last=True,
        seed=cfg.seed_num,
        process_shard=shard,
    )
    valid_loader = BatchLoader(
        valid_dataset,
        batch_size=batch_size,
        shuffle=False,
        n_workers=cfg.n_workers,
        drop_last=False,
        pad_final=True,
        process_shard=shard,
    )

    compute_dtype = {
        "bfloat16": jnp.bfloat16,
        "float32": jnp.float32,
    }[cfg.select("tpu.compute_dtype", "bfloat16")]
    spmd_impl = cfg.select("tpu.spmd_impl", "gspmd") or "gspmd"
    if spmd_impl not in ("gspmd", "shard_map"):
        raise NotImplementedError(
            f'No implementation for tpu.spmd_impl "{spmd_impl}"'
        )
    if spmd_impl == "shard_map":
        if spatial > 1:
            raise ValueError(
                "tpu.spmd_impl=shard_map is the data-parallel variant; "
                "spatial_shards>1 needs gspmd"
            )
        if (cfg.select("loss.name", "ce") or "ce") != "ce":
            raise NotImplementedError(
                "tpu.spmd_impl=shard_map supports the default CE loss only"
            )
    model = build_model(
        cfg.model.name,
        train_dataset.n_channels,
        n_classes,
        dtype=compute_dtype,
        conv_impl=resolve_conv_impl(cfg),
        # Explicit SyncBN pmean for the shard_map step (the GSPMD step gets
        # global BN statistics from sharded batch-axis reductions instead).
        bn_axis_name=(
            mesh.axis_names[0] if spmd_impl == "shard_map" else None
        ),
        **(cfg.model.get("model_kwargs") or {}),
    )

    # Build the init batch from one example rather than pulling a batch off
    # a loader iterator (which would abandon a live prefetch thread pool).
    example = valid_dataset.load_example(0)
    example_batch = {
        k: np.asarray(v)[None]
        for k, v in example.items()
        if k in ("image", *AUX_FEATURE_KEYS)
    }
    state = create_train_state(
        model,
        example_batch,
        lr=cfg.lr,
        optimizer_name=cfg.select("model.model_kwargs.optimizer_name", cfg.optimizer),
        seed=cfg.seed_num or 0,
        schedule=cfg.select("lr_schedule", "constant"),
        # Cosine decays to 0 at the last step of the run (drop_last train
        # batching: len//batch steps per epoch, capped by
        # limit_train_batches so truncated runs still decay).
        total_steps=cfg.n_epochs * _steps_per_epoch(cfg, train_dataset, batch_size),
        warmup_steps=int(cfg.select("lr_warmup_steps", 0) or 0),
        ema=float(cfg.select("ema_decay", 0.0) or 0.0) > 0,
    )
    state = replicate_state(state, mesh)

    # Async checkpoint IO (tpu.async_checkpoint, default on): the epoch-end
    # device->host transfer + orbax write run on a background thread,
    # overlapped with the next epoch's training. The manager itself forces
    # the synchronous path under multi-host (collective save ordering).
    manager = CheckpointManager(
        exp_dir,
        save_top_k=cfg.save_topk_models,
        async_save=bool(cfg.select("tpu.async_checkpoint", True)),
        resume_every=int(cfg.select("tpu.resume_every", 5) or 1),
    )
    start_epoch = 0
    if cfg.select("tpu.resume", True) and manager.latest_model_path:
        state = manager.restore(manager.latest_model_path, state)
        state = replicate_state(state, mesh)
        latest = manager.latest_epoch
        start_epoch = 0 if latest is None else latest + 1
        print(f"[fit] resumed from {manager.latest_model_path} (epoch {start_epoch})")
        if start_epoch >= cfg.n_epochs:
            # Fully-trained experiment: return without building the device
            # cache, compiling steps, or opening writers — a re-invoked
            # (watchdog-retried / idempotent-driver) fit costs nothing and
            # touches no further device state.
            print(
                f"[fit] nothing to do: epoch {start_epoch} >= "
                f"n_epochs {cfg.n_epochs}"
            )
            return manager.best_model_path or ""

    import dataclasses

    transform_params = TransformParams.from_config(cfg.transforms)
    # Run the fused rotate+flip program in the model's compute dtype (the
    # train step consumes bf16 anyway; halves augmentation HBM traffic).
    transform_params = dataclasses.replace(
        transform_params, dtype=cfg.select("tpu.compute_dtype", "bfloat16")
    )
    if not cfg.select("tpu.use_pallas", True):
        # Force the pure-XLA gather shear over the Pallas kernel.
        transform_params = dataclasses.replace(transform_params, rotate_impl="shear")
    # Flat-packed state (train/flat.py): ~6-output train step instead of
    # ~200 — reclaims ~0.3 ms/output of runtime dispatch per step on TPU.
    # The shard_map variant operates on the nested state.
    use_flat = bool(cfg.select("tpu.flat_state", True)) and spmd_impl != "shard_map"
    if spmd_impl == "shard_map":
        from floodplanet_code_tpu.parallel.shard_step import (
            make_shard_train_step,
        )

        fstate, flat_spec = None, None
        # Augmentation stays the separate GSPMD program below (identical
        # randomness across step implementations).
        train_step = make_shard_train_step(
            model,
            mesh,
            ignore_index,
            ema_decay=float(cfg.select("ema_decay", 0.0) or 0.0),
            ema_warmup=bool(cfg.select("ema_warmup", True)),
        )
    elif use_flat:
        from floodplanet_code_tpu.train.flat import (
            flatten_train_state,
            make_flat_train_step,
            unflatten_train_state,
        )

        fstate, flat_spec = flatten_train_state(state)
        fstate = replicate_state(fstate, mesh)
        train_step = make_flat_train_step(
            model,
            ignore_index,
            transform_params,
            flat_spec,
            loss_cfg=cfg.select("loss"),
            fuse_augmentation=False,
            ema_decay=float(cfg.select("ema_decay", 0.0) or 0.0),
            ema_warmup=bool(cfg.select("ema_warmup", True)),
        )
    else:
        fstate, flat_spec = None, None
        train_step = make_train_step(
            model,
            ignore_index,
            transform_params,
            loss_cfg=cfg.select("loss"),
            fuse_augmentation=False,
            ema_decay=float(cfg.select("ema_decay", 0.0) or 0.0),
            ema_warmup=bool(cfg.select("ema_warmup", True)),
        )
    augment_step = make_augment_step(transform_params, ignore_index)
    if spmd_impl == "shard_map":
        from floodplanet_code_tpu.parallel.shard_step import (
            make_shard_eval_step,
        )

        eval_step = make_shard_eval_step(model, mesh, ignore_index)
    else:
        eval_step = make_eval_step(model, ignore_index)

    # Device-resident dataset cache (data/device_cache.py): scenes live in
    # HBM and crops are sliced/normalized on device, shrinking the per-step
    # host->device transfer to ~160 bytes of indices. Falls back to the
    # threaded host loader when the dataset exceeds the byte budget.
    # Multi-host: every host builds the SAME replicated scene stacks and
    # the same deterministic batch order, so the jitted builder runs as one
    # SPMD program with replicated inputs and dp-sharded outputs — pod runs
    # keep the on-device data path (no per-step host->device pixel traffic).
    train_cache = valid_cache = train_builder = valid_builder = None
    cache_bytes = int(cfg.select("tpu.device_data_bytes", 6 << 30) or 0)
    if cache_bytes > 0:
        from floodplanet_code_tpu.data.device_cache import (
            build_device_cache,
            build_device_cache_sharded,
            make_batch_builder,
            make_batch_builder_podsharded,
        )
        from floodplanet_code_tpu.parallel.mesh import replicated_sharding

        # Stack placement (tpu.device_cache_shard): 'replicate' keeps the
        # full stacks on every device; 'pod' shards scenes over the DCN
        # axis (per-device residency ~ total/n_pods, one crop-batch psum
        # per step — the pod-scale data path); 'auto' replicates when the
        # budget allows and falls back to pod-sharding when only the
        # divided stacks fit.
        shard_mode = str(
            cfg.select("tpu.device_cache_shard", "auto") or "auto"
        )
        can_pod = "pod" in mesh.axis_names

        def _build_one(dataset, budget):
            """Returns (cache, pod_sharded?, per_device_bytes)."""
            if shard_mode in ("auto", "replicate"):
                cache = build_device_cache(
                    dataset, budget, replicated_sharding(mesh)
                )
                if cache is not None:
                    return cache, False, cache.nbytes
            if shard_mode in ("auto", "pod") and can_pod:
                cache = build_device_cache_sharded(dataset, mesh, budget)
                if cache is not None:
                    per_dev = cache.nbytes // int(mesh.shape["pod"])
                    return cache, True, per_dev
            return None, False, 0

        try:
            builder_shardings = {
                k: data_sharding[k] for k in ("image", "target", "mean", "std")
            }
            rows_sharding = (
                replicated_sharding(mesh)
                if multihost.process_count() > 1
                else None
            )

            def _make_builder(cache, pod_sharded):
                if pod_sharded:
                    return make_batch_builder_podsharded(
                        cache, mesh, batch_size, rows_sharding=rows_sharding
                    )
                return make_batch_builder(
                    cache,
                    out_shardings=builder_shardings,
                    rows_sharding=rows_sharding,
                )

            train_cache, train_pod, train_dev_bytes = _build_one(
                train_dataset, cache_bytes
            )
            if train_cache is not None:
                train_builder = _make_builder(train_cache, train_pod)
                # The byte budget covers train + valid COMBINED (per-device
                # residency): the valid cache only gets what the train
                # stacks left over.
                valid_cache, valid_pod, valid_dev_bytes = _build_one(
                    valid_dataset, max(0, cache_bytes - train_dev_bytes)
                )
                if valid_cache is not None:
                    valid_builder = _make_builder(valid_cache, valid_pod)
                shard_note = " (pod-sharded)" if train_pod or (
                    valid_cache is not None and valid_pod
                ) else ""
                print(
                    f"[fit] device data cache: "
                    f"{(train_dev_bytes + (valid_dev_bytes if valid_cache else 0)) / 1e9:.2f} GB in HBM"
                    f"{shard_note}"
                )
        except Exception as exc:  # pragma: no cover - defensive fallback
            print(f"[fit] device data cache unavailable ({exc}); host loader")
            train_cache = valid_cache = None

    def _device_batches(cache, builder, dataset, shuffle, drop_last, epoch):
        # Shuffle order is a pure function of (seed, epoch): a resumed fit
        # iterates exactly the order the uninterrupted run would have.
        rng_np = np.random.default_rng((cfg.seed_num or 0, epoch))
        n = len(dataset)
        order = rng_np.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n, batch_size):
            idx = order[start : start + batch_size]
            if len(idx) < batch_size and drop_last:
                break
            valid = np.ones(batch_size, bool)
            if len(idx) < batch_size:
                valid[len(idx) :] = False
                idx = np.concatenate(
                    [idx, np.zeros(batch_size - len(idx), idx.dtype)]
                )
            batch = builder(jnp.asarray(cache.index_rows(dataset, idx)))
            batch["valid"] = jax.device_put(valid, data_sharding["valid"])
            yield batch


    from tensorboardX import SummaryWriter

    from floodplanet_code_tpu.train.logging import log_image_panel

    # Coordinator-only TB writes; other hosts get a no-op writer.
    class _NullWriter:
        def add_scalar(self, *a, **k):
            pass

        def add_image(self, *a, **k):
            pass

        def close(self):
            pass

    writer = (
        SummaryWriter(os.path.join(exp_dir, "tensorboard_logs"))
        if coordinator
        else _NullWriter()
    )

    if use_flat:

        @jax.jit
        def logits_step(fs, image):
            variables = {"params": flat_spec.unravel_params(fs.flat_params)}
            if fs.flat_stats is not None:
                variables["batch_stats"] = flat_spec.unravel_stats(fs.flat_stats)
            return model.apply(variables, {"image": image}, train=False)

    else:

        @jax.jit
        def logits_step(state: TrainState, image):
            variables = {"params": state.params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            return model.apply(variables, {"image": image}, train=False)

    log_image_iter = cfg.select("log_image_iter") or 0
    to_rgb_fn = train_dataset.to_RGB

    base_rng = jax.random.key(cfg.seed_num or 0)
    profiler_mode = cfg.select("profiler")
    limit_train = cfg.select("limit_train_batches")
    limit_val = cfg.select("limit_val_batches")
    global_step = start_epoch * max(1, len(train_loader))

    best_path = None
    setup_wall = time.time() - fit_start
    first_step_wall = None
    for epoch in range(start_epoch, cfg.n_epochs):
        # ---- train -------------------------------------------------------
        # Per-epoch derived rng (augmentation + step noise): with the
        # (seed, epoch) shuffle order above, a resumed fit replays the
        # uninterrupted run's randomness exactly (tests/test_train.py).
        rng = jax.random.fold_in(base_rng, epoch)
        train_loader.set_epoch(epoch)
        epoch_start = time.time()
        tracing = False
        if profiler_mode == "advanced" and epoch == start_epoch:
            profile_dir = cfg.select("tpu.profile_dir") or os.path.join(
                exp_dir, "profile"
            )
            try:
                jax.profiler.start_trace(profile_dir)
                tracing = True
            except Exception as exc:  # remote backends may lack profiling
                print(f"[profiler] trace unavailable: {exc}")

        train_confusion = jnp.zeros((n_classes, n_classes), jnp.float32)
        n_train_batches = 0
        losses = []
        train_batches = (
            _device_batches(
                train_cache, train_builder, train_dataset, True, True, epoch
            )
            if train_cache is not None
            else device_prefetch(
                iter(train_loader),
                sharding=data_sharding,
                size=cfg.select("tpu.prefetch", 2),
            )
        )
        for batch in train_batches:
            if limit_train is not None and n_train_batches >= limit_train:
                break
            rng, step_rng = jax.random.split(rng)
            if augment_step is not None:
                rng, aug_rng = jax.random.split(rng)
                batch = augment_step(aug_rng, {
                    k: v for k, v in batch.items() if k != "metadata"
                })
            if use_flat:
                fstate, logs = train_step(fstate, batch, step_rng)
            else:
                state, logs = train_step(state, batch, step_rng)
            train_confusion = train_confusion + logs["confusion"]
            losses.append(logs["loss"])
            if first_step_wall is None:
                # First dispatched step of the fit: dominated by XLA
                # compilation (block so the reading isn't hidden by async
                # dispatch of later steps).
                jax.block_until_ready(logs["loss"])
                first_step_wall = time.time() - epoch_start
            n_train_batches += 1
            global_step += 1
            if global_step % 10 == 0:
                step_metrics = compute_metrics(
                    logs["confusion"], "train_", ignore_index
                )
                writer.add_scalar(
                    "train_loss", float(logs["loss"]), global_step
                )
                for key, value in step_metrics.items():
                    writer.add_scalar(key, float(value), global_step)
            if log_image_iter and global_step % log_image_iter == 0:
                # RGB | prediction-CM panel (functional version of the
                # reference's disabled image logging, water_seg_model.py:115).
                logits = logits_step(fstate if use_flat else state, batch["image"])
                log_image_panel(
                    writer,
                    f"train_s{global_step}",
                    np.asarray(batch["image"][0], np.float32),
                    np.asarray(batch["mean"][0]),
                    np.asarray(batch["std"][0]),
                    np.asarray(logits[0]),
                    np.asarray(batch["target"][0]),
                    to_rgb_fn,
                    global_step,
                )

        if tracing:
            try:
                jax.profiler.stop_trace()
            except Exception as exc:
                print(f"[profiler] stop_trace failed: {exc}")

        jax.block_until_ready(train_confusion)
        train_time = time.time() - epoch_start
        if use_flat:
            # Rebuild the nested state once per epoch for eval + orbax.
            state = unflatten_train_state(fstate, flat_spec)
        train_metrics = compute_metrics(train_confusion, "train_", ignore_index)
        train_metrics["train_loss"] = (
            jnp.mean(jnp.stack(losses)) if losses else jnp.asarray(0.0)
        )

        # ---- validation --------------------------------------------------
        eval_start = time.time()
        val_confusion = jnp.zeros((n_classes, n_classes), jnp.float32)
        val_losses = []
        n_val_batches = 0
        val_batches = (
            _device_batches(
                valid_cache, valid_builder, valid_dataset, False, False, epoch
            )
            if valid_cache is not None
            else device_prefetch(
                iter(valid_loader), sharding=data_sharding, size=2
            )
        )
        for batch in val_batches:
            if limit_val is not None and n_val_batches >= limit_val:
                break
            logs = eval_step(state, batch)
            val_confusion = val_confusion + logs["confusion"]
            val_losses.append(logs["loss"])
            n_val_batches += 1

        jax.block_until_ready(val_confusion)
        eval_wall = time.time() - eval_start
        val_metrics = compute_metrics(val_confusion, "val_", ignore_index)
        val_metrics.update(
            compute_binary_class_metrics(val_confusion, 1, "val_")
        )
        val_metrics["valid_loss"] = (
            jnp.mean(jnp.stack(val_losses)) if val_losses else jnp.asarray(0.0)
        )

        # Rename to the reference's torchmetrics keys for the monitor/export.
        key_map = torchmetrics_key_names("val_")
        monitored = {
            key_map.get(k, k): float(np.asarray(v)) for k, v in val_metrics.items()
        }
        monitored.update(
            {k: float(np.asarray(v)) for k, v in train_metrics.items()}
        )

        for key, value in monitored.items():
            writer.add_scalar(key, value, global_step)

        tiles_per_sec = (
            n_train_batches * batch_size / train_time if train_time > 0 else 0.0
        )
        writer.add_scalar("train_tiles_per_sec", tiles_per_sec, global_step)
        if profiler_mode == "simple":
            print(
                f"[profiler] epoch {epoch}: {train_time:.1f}s train, "
                f"{tiles_per_sec:.1f} tiles/s"
            )
        if coordinator:
            print(
                f"epoch {epoch}: loss {float(np.asarray(train_metrics['train_loss'])):.4f} "
                f"val_IoU {monitored.get(MONITOR_KEY, 0.0):.4f} "
                f"water_IoU {monitored.get('val_water_IoU', 0.0):.4f} "
                f"({tiles_per_sec:.1f} tiles/s)"
            )
        if cfg.select("tpu.log_all_hosts", False):
            # Per-host metric line (every process, host-tagged): multi-host
            # tests assert every process computed identical replicated
            # metrics, not just that the coordinator's file looks right.
            print(
                f"HOSTMETRIC {epoch} "
                f"loss {float(np.asarray(train_metrics['train_loss'])):.6f} "
                f"val_IoU {monitored.get(MONITOR_KEY, 0.0):.6f} "
                f"water_IoU {monitored.get('val_water_IoU', 0.0):.6f}"
            )
        # Collective: orbax synchronizes all hosts inside save (the
        # coordinator alone writes the side files / retention deletes).
        ckpt_start = time.time()
        # force on the final epoch: a completed run must leave a latest
        # checkpoint so a re-invoked fit is a free no-op.
        manager.save(state, epoch, monitored, force=(epoch == cfg.n_epochs - 1))
        # Epoch-end barrier: keeps fast workers from racing ahead of (or
        # exiting before) the coordinator's non-collective side writes.
        multihost.sync(f"epoch_{epoch}")
        ckpt_wall = time.time() - ckpt_start

        epoch_wall = time.time() - epoch_start
        timing_epochs.append(
            {
                "epoch": epoch,
                "train_wall": round(train_time, 3),
                "eval_wall": round(eval_wall, 3),
                "ckpt_wall": round(ckpt_wall, 3),
                "epoch_wall": round(epoch_wall, 3),
                "n_train_batches": n_train_batches,
                "tiles_per_sec": round(tiles_per_sec, 2),
            }
        )

    writer.close()
    # Drain any in-flight async checkpoint write so (a) the timing below
    # charges the un-overlapped tail to checkpointing, not "other", and
    # (b) callers reading best_model_path get a finished directory.
    ckpt_drain_start = time.time()
    manager.wait_until_finished()
    ckpt_drain_wall = time.time() - ckpt_drain_start
    if coordinator and timing_epochs:
        fit_wall = time.time() - fit_start
        n_tiles = int(
            sum(e["n_train_batches"] for e in timing_epochs) * batch_size
        )
        train_sum = sum(e["train_wall"] for e in timing_epochs)
        eval_sum = sum(e["eval_wall"] for e in timing_epochs)
        ckpt_sum = sum(e["ckpt_wall"] for e in timing_epochs)
        # Steady-state train rate: exclude the compile-dominated first step
        # and the (always first) epoch it lives in.
        steady = timing_epochs[1:] or timing_epochs
        steady_tiles = int(
            sum(e["n_train_batches"] for e in steady) * batch_size
        )
        steady_wall = sum(e["train_wall"] for e in steady)
        timing = {
            "fit_wall": round(fit_wall, 2),
            "setup_wall": round(setup_wall, 2),
            "first_step_wall": round(first_step_wall or 0.0, 2),
            "train_wall": round(train_sum, 2),
            "eval_wall": round(eval_sum, 2),
            "ckpt_wall": round(ckpt_sum, 2),
            # Async mode: ckpt_wall is only the blocking epoch-end cost
            # (queue submit + prior-write drain); ckpt_bg_wall is the
            # real IO spent on the background thread (overlapped with
            # training), and ckpt_drain_wall the un-overlapped tail paid
            # once at fit end. Sync mode: bg ~= ckpt_wall, drain ~= 0.
            "ckpt_bg_wall": round(manager.background_write_seconds, 2),
            "ckpt_drain_wall": round(ckpt_drain_wall, 2),
            "other_wall": round(
                fit_wall - setup_wall - train_sum - eval_sum - ckpt_sum
                - ckpt_drain_wall, 2
            ),
            "n_epochs_run": len(timing_epochs),
            "train_tiles": n_tiles,
            "effective_tiles_per_sec": round(n_tiles / fit_wall, 2),
            "steady_train_tiles_per_sec": round(
                steady_tiles / steady_wall if steady_wall > 0 else 0.0, 2
            ),
            "epochs": timing_epochs,
        }
        import json as _json

        with open(os.path.join(exp_dir, "timing.json"), "w") as handle:
            _json.dump(timing, handle, indent=2)
        print(
            f"[timing] fit {fit_wall:.1f}s = setup {setup_wall:.1f} + "
            f"train {train_sum:.1f} + eval {eval_sum:.1f} + "
            f"ckpt {ckpt_sum:.1f} (+{timing['ckpt_drain_wall']:.1f} drain, "
            f"{timing['ckpt_bg_wall']:.1f} overlapped) + "
            f"other {timing['other_wall']:.1f} "
            f"(effective {timing['effective_tiles_per_sec']:.1f} tiles/s, "
            f"steady train {timing['steady_train_tiles_per_sec']:.1f})"
        )
    return manager.best_model_path or ""
