"""Explicit-collective data-parallel train step (jax.shard_map).

The production scale-out path is GSPMD: ``jit`` over a Mesh with
NamedSharding-annotated inputs (parallel/mesh.py), letting the partitioner
derive the gradient all-reduce, cross-replica BatchNorm statistics, and
metric reductions. This module is the *same* step with every collective
written out by hand in per-device code:

- each device sees only its batch shard (``in_specs=P('data')``),
- the loss is the global mean — numerator and valid-pixel count are
  ``psum``'d inside the loss (ops/losses.py ``axis_name=``), so shards with
  unequal ignored-pixel counts still reproduce the unsharded loss exactly,
- the gradient all-reduce comes from shard_map's typed AD
  (``check_vma=True``): params enter replicated, so their cotangents must
  leave replicated, and transposing the loss/BN psums inserts exactly one
  grad psum — adding a manual ``psum(grads)`` on top would double-count
  (and under ``check_vma=False``, where psum transposes to psum, even the
  loss-internal psums already all-reduce the grads: 8x on an 8-mesh),
- train-mode BatchNorm uses the model's ``bn_axis_name`` pmean
  (ops/batchnorm.py) — explicit SyncBN, the same global-batch statistics
  GSPMD derives from sharded batch-axis reductions; its custom VJP
  returns all-reduced dscale/dbias, the replicated cotangent typed AD
  requires,
- the confusion matrix is ``psum``'d to the exact global tally.

Why keep both paths: GSPMD stays the default (zero manual communication,
and XLA overlaps the derived collectives with the backward), while this
variant pins the communication schedule explicitly. It doubles as an
executable specification of what the partitioner must derive —
tests/test_shard_step.py proves step-for-step numerical agreement between
the two on the 8-device CPU mesh — and as the escape hatch if a future
model change leads the partitioner to a bad schedule.

The reference has no analog: it is single-GPU by construction
(/root/reference/st_water_seg/fit.py:87-88, SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from floodplanet_code_tpu.data.augment import TransformParams, augment_batch
from floodplanet_code_tpu.ops.losses import cross_entropy_ignore
from floodplanet_code_tpu.ops.metrics import confusion_from_logits
from floodplanet_code_tpu.models.water_seg import AUX_FEATURE_KEYS
from floodplanet_code_tpu.train.state import ema_decay_at


def make_shard_train_step(
    model,
    mesh: Mesh,
    ignore_index: int,
    transform_params: TransformParams | None = None,
    ema_decay: float = 0.0,
    ema_warmup: bool = True,
):
    """Build the explicit-collective train step over a 1-D data mesh.

    ``model`` must be built with ``bn_axis_name=mesh.axis_names[0]`` so
    train-mode BatchNorm statistics are pmean'd across shards (without it
    each shard normalizes by local statistics — valid, but not the
    global-batch semantics the GSPMD path computes).

    ``transform_params``: when active, augmentation runs *inside* the
    sharded step with a per-shard rng (``fold_in(rng, axis_index)``). The
    production fit loop instead augments in a separate GSPMD program
    (fuse_augmentation=False there) and feeds this step bare batches, which
    keeps augmentation randomness identical across step implementations.

    Returns ``(state, batch, rng) -> (state', {'loss', 'confusion'})`` with
    the same signature/donation as train.fit.make_train_step. Only the
    default CE loss is supported (the production loss; loss_cfg combos stay
    GSPMD-only).
    """
    if len(mesh.axis_names) != 1:
        raise ValueError(
            "make_shard_train_step is the data-parallel variant; spatial "
            f"partitioning stays GSPMD-only (got mesh axes {mesh.axis_names})"
        )
    data_axis = mesh.axis_names[0]

    def local_step(state, batch, rng):
        image, target = batch["image"], batch["target"]
        if transform_params is not None and transform_params.any_active:
            shard_rng = jax.random.fold_in(
                rng, jax.lax.axis_index(data_axis)
            )
            image, target = augment_batch(
                shard_rng, image, target, transform_params, ignore_index
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
            loss = cross_entropy_ignore(
                logits, target, ignore_index, axis_name=data_axis
            )
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # grads arrive already all-reduced: typed AD transposes the
        # loss/BN collectives into one grad psum so the replicated params
        # get replicated cotangents (module docstring). The optimizer
        # update is therefore identical on every device.
        state = state.apply_gradients(grads=grads)
        if state.batch_stats is not None:
            # Already pmean'd inside the model via bn_axis_name.
            state = state.replace(batch_stats=updates["batch_stats"])
        if state.ema_params is not None:
            # state.step already counts this update; the decay is a pure
            # function of the replicated step, so it stays shard-invariant.
            d = ema_decay_at(state.step, ema_decay) if ema_warmup else ema_decay
            state = state.replace(
                ema_params=jax.tree.map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state.ema_params,
                    state.params,
                )
            )
        confusion = jax.lax.psum(
            confusion_from_logits(logits, target, ignore_index), data_axis
        )
        return state, {"loss": loss, "confusion": confusion}

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        # Tree-prefix specs: replicated state in, batch sharded on its
        # leading axis (every leaf — images, targets, per-sample vectors).
        in_specs=(P(), P(data_axis), P()),
        out_specs=(P(), P()),
        # Typed AD (the default): the checker proves the state output is
        # replicated AND gives psum its efficient identity transpose —
        # correctness depends on it (module docstring).
        check_vma=True,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_shard_eval_step(model, mesh: Mesh, ignore_index: int):
    """Explicit-collective eval step: global loss + psum'd confusion.

    Mirrors train.fit.make_eval_step (EMA params preferred, padded rows
    masked via ``batch['valid']``) with the reductions spelled out.
    """
    if len(mesh.axis_names) != 1:
        raise ValueError(
            "make_shard_eval_step needs a 1-D data mesh "
            f"(got axes {mesh.axis_names})"
        )
    data_axis = mesh.axis_names[0]

    def local_step(state, batch):
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
            logits,
            batch["target"],
            ignore_index,
            sample_weight=valid,
            axis_name=data_axis,
        )
        confusion = jax.lax.psum(
            confusion_from_logits(
                logits, batch["target"], ignore_index, sample_weight=valid
            ),
            data_axis,
        )
        return {"loss": loss, "confusion": confusion}

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(data_axis)),
        out_specs=P(),
        check_vma=True,
    )
    return jax.jit(sharded)
