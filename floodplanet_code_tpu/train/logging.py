"""TensorBoard logging helpers, including image panels.

The reference logs scalars per step/epoch and carries *disabled* image
logging blocks (``if False:`` at water_seg_model.py:115-134, 160-179, helper
``log_image_to_tensorflow`` :227-240) that would write RGB|confusion-matrix
panels. Here the capability is functional: every ``log_image_iter`` train
steps (conf key, config.yaml:35) the first batch element is rendered as a
stacked RGB / prediction-CM panel to TensorBoard.
"""

from __future__ import annotations

import numpy as np

from floodplanet_code_tpu.utils.image import create_conf_matrix_pred_image


def log_image_panel(
    writer,
    tag: str,
    image_nhwc: np.ndarray,
    mean: np.ndarray,
    std: np.ndarray,
    logits_nhwc: np.ndarray,
    target_hw: np.ndarray,
    to_rgb_fn,
    global_step: int,
) -> None:
    """Write one RGB|CM panel (reference log_image_to_tensorflow analog).

    Args:
        image_nhwc: [H,W,C] normalized input (first batch element).
        mean, std: [1,1,C] normalization stats for un-normalization
            (water_seg_model.py:117 ``images * std + mean``).
        logits_nhwc: [H,W,n_classes] raw logits.
        target_hw: [H,W] int labels.
        to_rgb_fn: CHW multi-band -> HW3 visualization callable.
    """
    image = np.asarray(image_nhwc) * np.asarray(std) + np.asarray(mean)
    rgb = to_rgb_fn(np.transpose(image, (2, 0, 1)))
    rgb = np.clip(np.nan_to_num(rgb), 0.0, 1.0)

    pred = np.asarray(logits_nhwc).argmax(axis=-1)
    target = np.asarray(target_hw)
    cm = create_conf_matrix_pred_image(
        (pred == 1).astype(np.uint8), (target == 1).astype(np.uint8)
    ).astype(np.float32) / 255.0

    panel = np.concatenate([rgb, cm], axis=0)  # stacked vertically
    writer.add_image(tag, panel.transpose(2, 0, 1), global_step)
