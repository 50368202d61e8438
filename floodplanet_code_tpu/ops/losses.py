"""Loss functions (pure JAX).

``cross_entropy_ignore`` matches torch.nn.CrossEntropyLoss(ignore_index=...)
as used by the reference (water_seg_model.py:40, 103): softmax CE over the
class axis, mean over non-ignored pixels, and 0 (not NaN) when every pixel
is ignored — folding in the reference's explicit NaN guard
(water_seg_model.py:104-106).

``weighted_cross_entropy`` and ``dice_loss`` cover the class-weighted
BCE/Dice training recipe named in the benchmark configs (BASELINE.json
configs[3]); the reference itself only ever uses plain CE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pick_class(values: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """values[..., target] without a gather.

    A class-axis ``take_along_axis`` on TPU forces the lane-padded
    [..., C] tensor out of its fused producer (measured: +33 ms / +12 GB
    HBM on the 512^2 train step). For small C a select-sum compiles to
    pure elementwise VPU work that fuses with the log-softmax.
    """
    n_classes = values.shape[-1]
    if n_classes <= 8:
        picked = jnp.zeros(target.shape, values.dtype)
        for c in range(n_classes):
            picked = picked + jnp.where(target == c, values[..., c], 0)
        return picked
    return jnp.take_along_axis(values, target[..., None], axis=-1).squeeze(-1)


def cross_entropy_ignore(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    ignore_index: int | None = None,
    sample_weight: jnp.ndarray | None = None,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Mean softmax cross entropy with ignored pixels dropped.

    Args:
        logits: [..., n_classes] float array (NHWC layout).
        target: [...] int array of class ids.
        ignore_index: target value excluded from the mean.
        sample_weight: optional broadcastable 0/1 weight (batch padding mask).
        axis_name: bound mesh axis (shard_map/pmap) to psum the numerator
            and valid-pixel count over — the global mean over all shards,
            exactly matching this function on the unsharded batch even when
            shards carry unequal numbers of ignored pixels.
    """
    n_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = jnp.ones(target.shape, dtype=jnp.float32)
    if sample_weight is not None:
        valid = valid * jnp.broadcast_to(sample_weight, target.shape).astype(
            jnp.float32
        )
    if ignore_index is not None:
        valid = valid * (target != ignore_index).astype(jnp.float32)
    # Targets outside [0, n_classes) — e.g. the raw -1 nodata sentinel when
    # the config's ignore_index=-1 was resolved to n_classes-1 downstream —
    # are always ignored, never silently clipped into class 0.
    valid = valid * ((target >= 0) & (target < n_classes)).astype(jnp.float32)
    safe_target = jnp.clip(target, 0, n_classes - 1)
    picked = _pick_class(log_probs, safe_target)
    total = jnp.sum(valid)
    num = -jnp.sum(picked * valid)
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
        num = jax.lax.psum(num, axis_name)
    loss = num / jnp.maximum(total, 1.0)
    return jnp.where(total > 0, loss, 0.0)


def weighted_cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    class_weights: jnp.ndarray,
    ignore_index: int | None = None,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """CE with per-class weights, normalized by the summed weights of the
    contributing pixels (torch CrossEntropyLoss(weight=...) semantics)."""
    n_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = jnp.ones(target.shape, dtype=jnp.float32)
    if sample_weight is not None:
        valid = valid * jnp.broadcast_to(sample_weight, target.shape).astype(
            jnp.float32
        )
    if ignore_index is not None:
        valid = valid * (target != ignore_index).astype(jnp.float32)
    valid = valid * ((target >= 0) & (target < n_classes)).astype(jnp.float32)
    safe_target = jnp.clip(target, 0, n_classes - 1)
    picked = _pick_class(log_probs, safe_target)
    weights_vec = jnp.asarray(class_weights, dtype=jnp.float32)
    w = _pick_class(
        jnp.broadcast_to(weights_vec, safe_target.shape + (n_classes,)),
        safe_target,
    ) * valid
    total_w = jnp.sum(w)
    loss = -jnp.sum(picked * w) / jnp.maximum(total_w, 1e-8)
    return jnp.where(total_w > 0, loss, 0.0)


def dice_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    ignore_index: int | None = None,
    sample_weight: jnp.ndarray | None = None,
    eps: float = 1.0,
) -> jnp.ndarray:
    """Soft multi-class Dice loss over non-ignored pixels."""
    n_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    valid = jnp.ones(target.shape, dtype=jnp.float32)
    if sample_weight is not None:
        valid = valid * jnp.broadcast_to(sample_weight, target.shape).astype(
            jnp.float32
        )
    if ignore_index is not None:
        valid = valid * (target != ignore_index).astype(jnp.float32)
    valid = valid * ((target >= 0) & (target < n_classes)).astype(jnp.float32)
    safe_target = jnp.clip(target, 0, n_classes - 1)
    onehot = jax.nn.one_hot(safe_target, n_classes) * valid[..., None]
    probs = probs * valid[..., None]
    axes = tuple(range(probs.ndim - 1))
    intersection = jnp.sum(probs * onehot, axis=axes)
    union = jnp.sum(probs, axis=axes) + jnp.sum(onehot, axis=axes)
    dice = (2.0 * intersection + eps) / (union + eps)
    return 1.0 - jnp.mean(dice)
