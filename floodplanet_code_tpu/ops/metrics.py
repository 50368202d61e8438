"""Segmentation metrics as pure JAX confusion-matrix reductions.

The reference tracks micro-averaged multiclass F1 / Jaccard / Accuracy with
``ignore_index`` via torchmetrics (water_seg_model.py:46-63), updated
per-step and computed per-epoch. Torchmetrics keeps mutable state; the JAX
equivalent here is a functional confusion-matrix accumulator:

    state = confusion_matrix(logits/preds, target)   # [C, C] int32, on device
    state = state_a + state_b                        # combine across steps/devices
    metrics = compute_metrics(state)                 # micro F1/IoU/Acc

The confusion matrix is summed with psum across the data mesh axis inside
sharded steps, which makes metric aggregation exact under data parallelism
(the reference is single-device so never faced this).

Semantics match torchmetrics micro averaging with ignore_index: pixels whose
*target* equals ignore_index are dropped entirely; predictions of the
ignored class on valid pixels still count as errors. Golden-tested against
torchmetrics in tests/test_metrics.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_from_preds(
    preds: jnp.ndarray,
    target: jnp.ndarray,
    n_classes: int,
    ignore_index: int | None = None,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Confusion matrix [n_classes, n_classes] (rows=target, cols=pred).

    Args:
        preds: int array of predicted classes, any shape.
        target: int array of true classes, same shape.
        ignore_index: target value excluded from all counts.
        sample_weight: optional broadcastable 0/1 weight (e.g. batch padding
            validity mask); weight 0 drops the pixel.
    """
    valid = jnp.ones(target.shape, dtype=jnp.float32)
    if sample_weight is not None:
        valid = valid * jnp.broadcast_to(sample_weight, target.shape).astype(
            jnp.float32
        )
    preds = preds.reshape(-1)
    target = target.reshape(-1)
    valid = valid.reshape(-1)
    if ignore_index is not None:
        valid = valid * (target != ignore_index).astype(jnp.float32)
    # Targets outside [0, n_classes) (e.g. the raw -1 nodata sentinel) are
    # always excluded, independent of ignore_index resolution.
    valid = valid * ((target >= 0) & (target < n_classes)).astype(jnp.float32)
    # Clip to a safe range so one-hot encoding is in-bounds even for
    # sentinel targets (e.g. -1); those rows carry zero weight anyway.
    t = jnp.clip(target, 0, n_classes - 1)
    p = jnp.clip(preds, 0, n_classes - 1)
    if n_classes <= 8:
        # Scatter-adds are slow on TPU and a one-hot MXU contraction pads
        # the tiny [C, C] output up to the 128x128 systolic tile. For small
        # C, C*C masked reductions over one read of (t, p, valid) is the
        # bandwidth floor (measured 6.4 ms -> sub-ms at 8x512^2, C=3).
        cells = [
            jnp.sum(valid * ((t == i) & (p == j)), dtype=jnp.float32)
            for i in range(n_classes)
            for j in range(n_classes)
        ]
        return jnp.stack(cells).reshape(n_classes, n_classes)
    t_onehot = jax.nn.one_hot(t, n_classes, dtype=jnp.float32) * valid[:, None]
    p_onehot = jax.nn.one_hot(p, n_classes, dtype=jnp.float32)
    return jnp.dot(
        t_onehot.T, p_onehot, preferred_element_type=jnp.float32
    )


def confusion_from_logits(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    ignore_index: int | None = None,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Confusion matrix from NHWC logits [..., n_classes]."""
    n_classes = logits.shape[-1]
    preds = jnp.argmax(logits, axis=-1)
    return confusion_from_preds(
        preds, target, n_classes, ignore_index, sample_weight
    )


def compute_metrics(
    confusion: jnp.ndarray, prefix: str = "", ignore_index: int | None = None
) -> dict:
    """Micro-averaged multiclass F1 / Jaccard(IoU) / Accuracy from a CM.

    Exact torchmetrics ``average='micro'`` semantics:
      - F1 == Accuracy == trace / total (for multiclass micro every valid
        pixel contributes one prediction and one target, so micro precision
        == recall == accuracy).
      - JaccardIndex follows torchmetrics' ``_jaccard_index_reduce``: per
        class ``num_c = TP_c``, ``denom_c = row_c + col_c - TP_c``; when
        ``ignore_index`` names a valid class, that class's num/denom are
        zeroed (the class is excluded from the micro sums even though other
        classes' pixels may be *predicted* as it); micro = sum(num)/sum(denom).

    NaN-free: empty confusion (all pixels ignored) yields 0, matching the
    reference's nan_to_num guards (water_seg_model.py:104-106).
    """
    correct = jnp.trace(confusion)
    total = jnp.sum(confusion)
    accuracy = jnp.where(total > 0, correct / jnp.maximum(total, 1.0), 0.0)

    num = jnp.diag(confusion)
    denom = jnp.sum(confusion, axis=0) + jnp.sum(confusion, axis=1) - num
    if ignore_index is not None and 0 <= ignore_index < confusion.shape[0]:
        num = num.at[ignore_index].set(0.0)
        denom = denom.at[ignore_index].set(0.0)
    num_sum = jnp.sum(num)
    denom_sum = jnp.sum(denom)
    iou = jnp.where(denom_sum > 0, num_sum / jnp.maximum(denom_sum, 1.0), 0.0)
    return {
        prefix + "F1Score": accuracy,
        prefix + "JaccardIndex": iou,
        prefix + "Accuracy": accuracy,
    }


def compute_binary_class_metrics(
    confusion: jnp.ndarray, positive_class: int = 1, prefix: str = ""
) -> dict:
    """Per-class (water) precision / recall / F1 / IoU from the CM.

    The reference reports only micro metrics; the water-class IoU is the
    benchmark's parity gate (BASELINE.md), so it is first-class here.
    """
    tp = confusion[positive_class, positive_class]
    fp = jnp.sum(confusion[:, positive_class]) - tp
    fn = jnp.sum(confusion[positive_class, :]) - tp
    precision = jnp.where(tp + fp > 0, tp / jnp.maximum(tp + fp, 1.0), 0.0)
    recall = jnp.where(tp + fn > 0, tp / jnp.maximum(tp + fn, 1.0), 0.0)
    f1_denom = 2 * tp + fp + fn
    f1 = jnp.where(f1_denom > 0, 2 * tp / jnp.maximum(f1_denom, 1.0), 0.0)
    iou_denom = tp + fp + fn
    iou = jnp.where(iou_denom > 0, tp / jnp.maximum(iou_denom, 1.0), 0.0)
    return {
        prefix + "water_precision": precision,
        prefix + "water_recall": recall,
        prefix + "water_F1": f1,
        prefix + "water_IoU": iou,
    }


def torchmetrics_key_names(prefix: str) -> dict:
    """Map our metric keys to the reference's torchmetrics names.

    Checkpoint selection monitors ``val_MulticlassJaccardIndex``
    (fit.py:80-85); exported metrics.json uses ``test_Multiclass*`` names
    (predict.py:245-250).
    """
    return {
        prefix + "F1Score": prefix + "MulticlassF1Score",
        prefix + "JaccardIndex": prefix + "MulticlassJaccardIndex",
        prefix + "Accuracy": prefix + "MulticlassAccuracy",
    }
