"""Train state: params + BN batch_stats + optax optimizer state.

The reference delegates this to PyTorch Lightning (optimizer built in
configure_optimizers, water_seg_model.py:198-205; BN state implicit in the
torch modules). Here it is an explicit flax TrainState pytree — which is
exactly what makes full mid-training resume (orbax) and SPMD sharding
trivial.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from floodplanet_code_tpu.models.water_seg import AUX_FEATURE_KEYS


class TrainState(train_state.TrainState):
    batch_stats: Any = struct.field(default=None)
    # Exponential moving average of params (tpu.ema_decay > 0); evaluation
    # and inference prefer these when present. None when EMA is off, so the
    # checkpoint tree (and old checkpoints) are unchanged by default.
    ema_params: Any = struct.field(default=None)


def ema_decay_at(step, decay: float):
    """Horizon-warmed EMA decay: ``min(decay, (1 + t) / (10 + t))``.

    A fixed-decay EMA seeded from the initial params needs ~1/(1-d) steps
    to forget initialization — at d=0.999 that is ~1000 updates, often
    longer than a short fold's whole schedule, so the average trails the
    raw weights for most of training (measured on the round-3 CV arms:
    RESULTS.md "Beyond-reference quality levers", where the short noisy
    folds selected their last epoch and landed below the no-EMA arm).
    Ramping the decay over a growing horizon (the schedule
    tf.train.ExponentialMovingAverage uses for ``num_updates``; equivalent
    in effect to debiased averaging à la optax.ema(debias=True)) makes
    the EMA track the raw params exactly at the start and only average
    once there is history worth averaging — strictly safer on short runs,
    identical in the long-run limit.

    ``step`` is the number of completed optimizer updates (1 at the first
    update); it may be a traced jax scalar.
    """
    t = jnp.asarray(step, jnp.float32)
    return jnp.minimum(jnp.asarray(decay, jnp.float32), (1.0 + t) / (10.0 + t))


def build_optimizer(
    optimizer_name: str,
    lr: float,
    schedule: str = "constant",
    total_steps: int = 0,
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """Optimizer factory (reference: adam only, water_seg_model.py:198-205).

    ``schedule='constant'`` reproduces the reference's fixed LR.
    ``'cosine'`` is a beyond-reference option: linear warmup over
    ``warmup_steps`` then cosine decay to 0 at ``total_steps`` — the
    schedule state lives in the optax step count, so mid-training resume
    restores it with the rest of the optimizer state.
    """
    rate: float | optax.Schedule = lr
    if schedule == "cosine":
        if total_steps <= 0:
            raise ValueError("cosine schedule needs total_steps > 0")
        rate = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else lr,
            peak_value=lr,
            warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
        )
    elif schedule != "constant":
        raise NotImplementedError(
            f"No implementation for lr schedule of name: {schedule}"
        )
    if optimizer_name == "adam":
        return optax.adam(rate)
    if optimizer_name == "adamw":
        return optax.adamw(rate)
    if optimizer_name == "sgd":
        return optax.sgd(rate, momentum=0.9)
    raise NotImplementedError(
        f"No implementation for optimizer of name: {optimizer_name}"
    )


def create_train_state(
    model,
    example_batch: dict,
    lr: float,
    optimizer_name: str = "adam",
    seed: int = 0,
    schedule: str = "constant",
    total_steps: int = 0,
    warmup_steps: int = 0,
    ema: bool = False,
) -> TrainState:
    """Initialize model variables and wrap them in a TrainState.

    ``ema=True`` seeds ``ema_params`` as a copy of the initial params; the
    train step then maintains the moving average (tpu.ema_decay).
    """
    rng = jax.random.key(seed)
    init_batch = {
        k: jnp.asarray(v)
        for k, v in example_batch.items()
        if k in ("image", *AUX_FEATURE_KEYS)
    }
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, init_batch, train=False
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=build_optimizer(
            optimizer_name,
            lr,
            schedule=schedule,
            total_steps=total_steps,
            warmup_steps=warmup_steps,
        ),
        batch_stats=variables.get("batch_stats"),
        ema_params=(
            jax.tree.map(jnp.copy, variables["params"]) if ema else None
        ),
    )
