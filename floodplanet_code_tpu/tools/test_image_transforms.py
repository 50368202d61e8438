"""Augmentation visual-regression harness.

Reference: the module-level ``test_image_transforms`` in
st_water_seg/datasets/floodplanet.py:661-737 — builds the dataset twice
(with and without a forced transform config) and writes before/after GIFs
for eyeball comparison. Here the transform runs through the *on-device*
augmentation path (data/augment.py) so what you see is what training gets.

Usage:
    python -m floodplanet_code_tpu.tools.test_image_transforms \
        [--root_dir PATH] --sensor PS --out aug_viz/ [--angle 45]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from floodplanet_code_tpu.data import build_dataset, generate_image_slice_object
from floodplanet_code_tpu.data.augment import TransformParams, augment_batch
from floodplanet_code_tpu.utils.image import create_gif


def visualize_transforms(
    dataset_name: str,
    sensor: str,
    out_dir: str,
    root_dir: str | None = None,
    channels: str = "ALL",
    angle: float = 45.0,
    n_examples: int = 8,
    crop: int = 256,
    seed: int = 0,
) -> list[str]:
    kwargs = {"root_dir": root_dir} if root_dir else {}
    dataset = build_dataset(
        dataset_name,
        "all",
        generate_image_slice_object(crop, stride=crop),
        sensor=sensor,
        channels=channels,
        ignore_index=0,
        seed_num=seed,
        **kwargs,
    )
    # Forced transforms: always flip+rotate by a fixed angle, so the
    # before/after comparison is deterministic (reference builds an inline
    # OmegaConf with a forced rotation, floodplanet.py:672-687).
    params = TransformParams(
        hflip_active=True,
        hflip_likelihood=1.0,
        vflip_active=False,
        vflip_likelihood=0.0,
        rotate_active=True,
        rotate_likelihood=1.0,
        min_rot_angle=angle,
        max_rot_angle=angle,
    )
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for index in range(min(n_examples, len(dataset))):
        example = dataset.load_example(index)
        image = jnp.asarray(example["image"][None])
        target = jnp.asarray(example["target"][None])
        aug_img, aug_tgt = augment_batch(
            jax.random.key(seed + index), image, target, params, 0
        )

        def frame(img_nhwc, tgt_hw):
            rgb = dataset.to_RGB(np.transpose(np.asarray(img_nhwc), (2, 0, 1)))
            rgb = (np.clip(np.nan_to_num(rgb), 0, 1) * 255).astype(np.uint8)
            overlay = rgb.copy()
            overlay[np.asarray(tgt_hw) == 1] = (0, 100, 255)
            return np.concatenate([rgb, overlay], axis=1)

        before = frame(example["image"], example["target"])
        after = frame(aug_img[0], aug_tgt[0])
        path = os.path.join(out_dir, f"transform_{index:03d}.gif")
        create_gif([before, after], path, image_text=["original", "augmented"])
        written.append(path)
    return written


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="floodplanet")
    parser.add_argument("--root_dir", type=str, default=None)
    parser.add_argument("--sensor", type=str, required=True)
    parser.add_argument("--channels", type=str, default="ALL")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--angle", type=float, default=45.0)
    args = parser.parse_args(argv)
    written = visualize_transforms(
        args.dataset,
        args.sensor,
        args.out,
        root_dir=args.root_dir,
        channels=args.channels,
        angle=args.angle,
    )
    print(f"Wrote {len(written)} transform comparisons under {args.out}")
    return written


if __name__ == "__main__":
    main()
