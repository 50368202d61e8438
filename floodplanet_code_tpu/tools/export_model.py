"""AOT-export a trained checkpoint to a self-contained StableHLO artifact.

TPU-native deployment story (no reference analog — the reference ships raw
Lightning .ckpt files that need the full Python model code to run,
predict.py:174-177): ``jax.export`` lowers the sliding-window predict step
(forward + softmax, optionally dihedral TTA) to serialized StableHLO with
the restored weights baked in as constants. The artifact is:

- **self-contained** — loading it needs jax but none of this package's
  model code, and it is immune to model-code drift;
- **ahead-of-time compiled on first call** — a serving process pays no
  Python tracing at load;
- **portable across jax versions** within StableHLO's compatibility
  window, and runnable on any backend XLA supports (TPU/CPU/GPU).

Artifact layout: ``<out>.stablehlo`` (the serialized bytes) plus
``<out>.json`` manifest (input names/shapes/dtypes, n_classes, provenance)
so a server can validate feeds without deserializing.

Usage:
    python -m floodplanet_code_tpu.tools.export_model <checkpoint> \
        [--batch_size 8] [--height H] [--width W] [--tta] [--out PATH]

Reload with :func:`load_exported`, whose ``.call`` matches
``inference.sliding.make_predict_step`` output exactly
(tests/test_inference.py).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _batch_key(channel_key: str) -> str:
    return "image" if channel_key == "ms_image" else channel_key


def export_checkpoint(
    checkpoint_path: str,
    out_path: str | None = None,
    batch_size: int = 8,
    height: int | None = None,
    width: int | None = None,
    tta: bool = False,
    eval_dataset_name: str | None = None,
    eval_dataset_split: str = "test",
    platforms: tuple = ("cpu", "tpu", "cuda"),
) -> dict:
    """Export ``checkpoint_path`` to StableHLO; returns the manifest dict.

    Tile height/width default to the experiment's crop size. The exported
    callable takes the same batch dict the predict step consumes (NHWC
    float32 'image' plus any auxiliary modality planes) and returns the
    softmax probabilities the stitcher expects.
    """
    from floodplanet_code_tpu.config import load_experiment_config
    from floodplanet_code_tpu.data import (
        build_dataset,
        generate_image_slice_object,
    )
    from floodplanet_code_tpu.inference.predict import load_model_for_eval
    from floodplanet_code_tpu.inference.sliding import make_predict_step

    experiment_dir = os.path.dirname(
        os.path.dirname(os.path.normpath(checkpoint_path))
    )
    cfg = load_experiment_config(experiment_dir)
    height = int(height or cfg.crop_height)
    width = int(width or cfg.crop_width)
    slice_params = generate_image_slice_object(
        cfg.crop_height, cfg.crop_width, cfg.crop_stride
    )
    dataset = build_dataset(
        eval_dataset_name or cfg.dataset.name,
        eval_dataset_split,
        slice_params,
        sensor=cfg.dataset.sensor,
        channels=cfg.dataset.channels,
        norm_mode=cfg.norm_mode,
        eval_region=cfg.eval_region,
        ignore_index=cfg.ignore_index,
        seed_num=cfg.select("seed_num"),
        train_split_pct=cfg.select("train_split_pct", 0.8),
        **(cfg.dataset.get("dataset_kwargs") or {}),
    )
    model, variables = load_model_for_eval(cfg, checkpoint_path, dataset)
    predict_step = make_predict_step(model, tta=tta)

    shapes = {
        _batch_key(key): jax.ShapeDtypeStruct(
            (batch_size, height, width, ch), jnp.float32
        )
        for key, ch in dataset.n_channels.items()
    }

    # Close over the restored variables: they serialize into the artifact
    # as constants, making it runnable without the checkpoint.
    def forward(batch: dict):
        return predict_step(variables, batch)

    # Without platforms= the artifact is pinned to the exporting backend;
    # lowering for all three keeps it genuinely portable (the lowered
    # StableHLO carries per-platform branches where codegen differs).
    exported = jax_export.export(
        jax.jit(forward), platforms=tuple(platforms)
    )(shapes)
    blob = exported.serialize()

    if out_path is None:
        ckpt_name = os.path.basename(os.path.normpath(checkpoint_path))
        out_path = os.path.join(experiment_dir, "export", ckpt_name)
    out_path = (
        out_path[: -len(".stablehlo")]
        if out_path.endswith(".stablehlo")
        else out_path
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path + ".stablehlo", "wb") as f:
        f.write(blob)

    manifest = {
        "artifact": out_path + ".stablehlo",
        "bytes": len(blob),
        "inputs": {
            k: {"shape": list(s.shape), "dtype": str(s.dtype)}
            for k, s in shapes.items()
        },
        "output": "softmax probabilities [batch, height, width, n_classes]",
        "n_classes": int(dataset.n_classes),
        "platforms": list(platforms),
        "tta": bool(tta),
        "model": cfg.model.name,
        "checkpoint": os.path.normpath(checkpoint_path),
    }
    with open(out_path + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(artifact_path: str):
    """Deserialize a .stablehlo artifact -> callable(batch dict) -> probs."""
    with open(artifact_path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="AOT-export a checkpoint to a StableHLO artifact."
    )
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--tta", action="store_true")
    parser.add_argument("--eval_dataset_name", type=str, default=None)
    parser.add_argument(
        "--platforms",
        nargs="+",
        default=["cpu", "tpu", "cuda"],
        help="XLA backends the artifact must run on",
    )
    args = parser.parse_args(argv)
    manifest = export_checkpoint(
        args.checkpoint_path,
        out_path=args.out,
        batch_size=args.batch_size,
        height=args.height,
        width=args.width,
        tta=args.tta,
        eval_dataset_name=args.eval_dataset_name,
        platforms=tuple(args.platforms),
    )
    print(json.dumps(manifest, indent=2))
    return manifest


if __name__ == "__main__":
    main()
