"""Flat-packed train state: the whole optimization state in ~6 device buffers.

Params / BN batch-stats / optimizer moments each live in one contiguous
f32 buffer, so the train step is a 6-output XLA program and the Adam
update one fused elementwise pass over a single array instead of ~100
small kernels.

Measured on v5e: throughput-neutral vs the nested-pytree step once the
CE class-gather was removed (ops/losses.py `_pick_class` — the 33 ms the
flat packing was originally built to reclaim turned out to be that
gather's materialization tax, not per-output dispatch cost; PERF.md
"Corrections"). Kept as the default for the cleaner dispatch profile,
the smaller host-side pytree bookkeeping per step, and the fused
single-buffer optimizer pass.

The nested ``TrainState`` (train/state.py) remains the canonical
checkpoint / eval structure; ``flatten_train_state`` /
``unflatten_train_state`` convert at epoch boundaries (one dispatch per
epoch, amortized to nothing).

No reference analog: torch keeps per-tensor optimizer state
(/root/reference/st_water_seg/models/water_seg_model.py:198-205); this is
a TPU-native runtime design choice.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.flatten_util import ravel_pytree

from floodplanet_code_tpu.models.water_seg import AUX_FEATURE_KEYS
from floodplanet_code_tpu.train.state import TrainState, ema_decay_at


class FlatTrainState(struct.PyTreeNode):
    """Arrays-only mirror of TrainState: one flat f32 buffer per group."""

    step: jax.Array
    flat_params: jax.Array
    flat_stats: jax.Array | None
    opt_state: Any  # optax state over flat_params (a handful of leaves)
    flat_ema: jax.Array | None = None  # EMA of flat_params (tpu.ema_decay)


class FlatSpec(NamedTuple):
    """Static (host-side) metadata needed to un/flatten a TrainState."""

    unravel_params: Callable[[jax.Array], Any]
    unravel_stats: Callable[[jax.Array], Any] | None
    params_treedef: Any
    outer_opt_treedef: Any
    n_params: int
    tx: optax.GradientTransformation
    apply_fn: Callable


def _outer_opt_treedef(tx: optax.GradientTransformation):
    """Opt-state structure with each params-shaped slot as a single leaf."""
    probe = tx.init(jnp.zeros((1,), jnp.float32))
    return jax.tree.structure(probe)


def flatten_train_state(state: TrainState) -> tuple[FlatTrainState, FlatSpec]:
    flat_params, unravel_params = ravel_pytree(state.params)
    params_treedef = jax.tree.structure(state.params)
    unravel_stats = None
    flat_stats = None
    if state.batch_stats is not None:
        flat_stats, unravel_stats = ravel_pytree(state.batch_stats)

    outer = _outer_opt_treedef(state.tx)
    parts = outer.flatten_up_to(state.opt_state)
    # Pass-through leaves (e.g. adam's count) are *copied*: the flat state
    # gets donated by the train step, and sharing buffers with the source
    # nested state would delete them out from under it.
    flat_parts = [
        ravel_pytree(p)[0]
        if jax.tree.structure(p) == params_treedef
        else jax.tree.map(jnp.copy, p)
        for p in parts
    ]
    opt_state = jax.tree.unflatten(outer, flat_parts)

    spec = FlatSpec(
        unravel_params=unravel_params,
        unravel_stats=unravel_stats,
        params_treedef=params_treedef,
        outer_opt_treedef=outer,
        n_params=int(flat_params.size),
        tx=state.tx,
        apply_fn=state.apply_fn,
    )
    fstate = FlatTrainState(
        step=jnp.copy(jnp.asarray(state.step)),
        flat_params=flat_params,
        flat_stats=flat_stats,
        opt_state=opt_state,
        flat_ema=(
            ravel_pytree(state.ema_params)[0]
            if state.ema_params is not None
            else None
        ),
    )
    return fstate, spec


from functools import lru_cache


@lru_cache(maxsize=16)
def _jitted_unflatten(spec: FlatSpec):
    """One compiled program for the whole unflatten.

    Doing it eagerly issues hundreds of tiny slice/reshape dispatches;
    besides being slow, that eager-op storm intermittently aborted XLA's
    CPU client on the 8-virtual-device test mesh (SIGABRT inside
    apply_primitive). One jitted program is one dispatch.
    """

    def go(fstate: FlatTrainState):
        parts = spec.outer_opt_treedef.flatten_up_to(fstate.opt_state)
        nested_parts = [
            spec.unravel_params(p)
            if isinstance(p, jax.Array) and p.size == spec.n_params
            else p
            for p in parts
        ]
        return (
            spec.unravel_params(fstate.flat_params),
            jax.tree.unflatten(spec.outer_opt_treedef, nested_parts),
            (
                spec.unravel_stats(fstate.flat_stats)
                if fstate.flat_stats is not None
                else None
            ),
            (
                spec.unravel_params(fstate.flat_ema)
                if fstate.flat_ema is not None
                else None
            ),
        )

    return jax.jit(go)


def unflatten_train_state(fstate: FlatTrainState, spec: FlatSpec) -> TrainState:
    """Rebuild the nested TrainState (for eval / orbax checkpointing)."""
    params, opt_state, batch_stats, ema_params = _jitted_unflatten(spec)(fstate)
    return TrainState(
        step=fstate.step,
        apply_fn=spec.apply_fn,
        params=params,
        tx=spec.tx,
        opt_state=opt_state,
        batch_stats=batch_stats,
        ema_params=ema_params,
    )


def make_flat_train_step(
    model,
    ignore_index: int,
    transform_params,
    spec: FlatSpec,
    loss_cfg=None,
    fuse_augmentation: bool = False,
    ema_decay: float = 0.0,
    ema_warmup: bool = True,
):
    """Flat-state twin of train/fit.py make_train_step (same semantics).

    EMA here is ONE fused elementwise pass over the single flat buffer
    (the flat packing's best case). ``ema_warmup`` matches the nested
    step's horizon-warmed decay (train/state.ema_decay_at).
    """
    from floodplanet_code_tpu.data.augment import augment_batch
    from floodplanet_code_tpu.ops.metrics import confusion_from_logits
    from floodplanet_code_tpu.train.fit import make_loss_fn

    loss_of = make_loss_fn(loss_cfg, ignore_index)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(fstate: FlatTrainState, batch: dict, rng: jax.Array):
        image, target = batch["image"], batch["target"]
        if fuse_augmentation and transform_params.any_active:
            image, target = augment_batch(
                rng, image, target, transform_params, ignore_index
            )
        model_batch = {"image": image}
        for key in AUX_FEATURE_KEYS:
            if key in batch:
                model_batch[key] = batch[key]

        has_stats = fstate.flat_stats is not None

        def loss_fn(p_flat):
            variables = {"params": spec.unravel_params(p_flat)}
            mutable = []
            if has_stats:
                variables["batch_stats"] = spec.unravel_stats(fstate.flat_stats)
                mutable = ["batch_stats"]
            logits, updates = model.apply(
                variables, model_batch, train=True, mutable=mutable
            )
            loss = loss_of(logits, target)
            new_stats = (
                ravel_pytree(updates["batch_stats"])[0] if has_stats else None
            )
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads_flat = jax.value_and_grad(
            loss_fn, has_aux=True
        )(fstate.flat_params)
        updates, new_opt = spec.tx.update(
            grads_flat, fstate.opt_state, fstate.flat_params
        )
        new_params = optax.apply_updates(fstate.flat_params, updates)
        confusion = confusion_from_logits(logits, target, ignore_index)
        new_step = fstate.step + 1
        if fstate.flat_ema is not None:
            d = ema_decay_at(new_step, ema_decay) if ema_warmup else ema_decay
            new_ema = d * fstate.flat_ema + (1.0 - d) * new_params
        else:
            new_ema = None
        new_fstate = FlatTrainState(
            step=new_step,
            flat_params=new_params,
            flat_stats=new_stats,
            opt_state=new_opt,
            flat_ema=new_ema,
        )
        return new_fstate, {"loss": loss, "confusion": confusion}

    return train_step
