"""Evaluation + scene-prediction CLI (reference: st_water_seg/predict.py).

Given a checkpoint, rebuilds the eval dataset, runs sharded sliding-window
inference, and writes the reference's full report layout under
``<exp>/predictions/<dataset>/<region-or-split>/<ckpt>/``:

- ``metrics.json``           aggregate test metrics (predict.py:385-392)
- ``ranked_images_*.txt``    per-image F1/mIoU rankings (predict.py:73-107)
- ``ranked_regions_*.txt``   per-region rankings (predict.py:109-126)
- per scene under ``image_predictions/<region>/<image>/``:
  ``rgb.png``, ``pred_softmax.png``, ``gt.png``, ``pred_class.tif``
  (georeferenced), ``cm.png`` confusion-matrix image, ``rgb_cm.gif``
  (predict.py:268-383)

Differences from the reference: by default the ranked reports score each
*stitched scene* once (every pixel counted exactly once — overlapping
crops are not double-counted); ``--per_crop_stats`` switches to the
reference's semantics (predict.py:236-261), ranking images/regions by the
mean of per-crop metrics, for number-for-number reproducibility.
``metrics.json`` always comes from the scene-level confusion matrix.
pred_class.tif keeps geo tags via the native writer; no double metric
update (quirk §7.6); the hardcoded ``predictions_PS_alldata_4`` dir name
(quirk §7.8) becomes ``predictions``.
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import jax.numpy as jnp
import numpy as np

from floodplanet_code_tpu.config import load_experiment_config
from floodplanet_code_tpu.data import build_dataset, generate_image_slice_object
from floodplanet_code_tpu.geo import tiff
from floodplanet_code_tpu.inference.sliding import (
    resolve_inference_batch_size,
    sliding_window_predict,
)
from floodplanet_code_tpu.models import build_model, resolve_conv_impl
from floodplanet_code_tpu.ops.metrics import (
    compute_binary_class_metrics,
    compute_metrics,
    confusion_from_preds,
    torchmetrics_key_names,
)
from floodplanet_code_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_state,
)
from floodplanet_code_tpu.train.checkpoint import load_checkpoint
from floodplanet_code_tpu.train.fit import resolve_ignore_index
from floodplanet_code_tpu.train.state import create_train_state
from floodplanet_code_tpu.utils.image import (
    create_conf_matrix_pred_image,
    create_gif,
)


def save_image_stats(image_stats: dict, pred_dir: str, metric_name: str) -> None:
    """Ranked per-image metric report (reference predict.py:73-107)."""
    per_image = {
        name: float(np.mean(values)) for name, values in image_stats.items()
    }
    ranked = sorted(per_image.items(), key=lambda kv: kv[1], reverse=True)
    path = os.path.join(pred_dir, f"ranked_images_{metric_name}.txt")
    with open(path, "w") as handle:
        handle.write(f"Ranked image {metric_name} \n")
        handle.write("---------------------- \n")
        for name, value in ranked:
            short = os.path.splitext(os.path.basename(name))[0]
            handle.write(f"{short}: {value * 100}% \n")


def save_region_stats(region_stats: dict, pred_dir: str, metric_name: str) -> None:
    """Ranked per-region metric report (reference predict.py:109-126)."""
    per_region = {
        name: float(np.mean(values)) for name, values in region_stats.items()
    }
    ranked = sorted(per_region.items(), key=lambda kv: kv[1], reverse=True)
    path = os.path.join(pred_dir, f"ranked_regions_{metric_name}.txt")
    with open(path, "w") as handle:
        handle.write(f"Ranked region {metric_name} \n")
        handle.write("---------------------- \n")
        for name, value in ranked:
            handle.write(f"{name}: {value * 100}% \n")


def load_model_for_eval(cfg, checkpoint_path: str, dataset):
    """Build the model and restore checkpointed params/batch_stats."""
    compute_dtype = {
        "bfloat16": jnp.bfloat16,
        "float32": jnp.float32,
    }[cfg.select("tpu.compute_dtype", "bfloat16")]
    model = build_model(
        cfg.model.name,
        dataset.n_channels,
        dataset.n_classes,
        dtype=compute_dtype,
        conv_impl=resolve_conv_impl(cfg),
        **(cfg.model.get("model_kwargs") or {}),
    )
    example = dataset.load_example(0, output_metadata=False)
    example_batch = {k: v[None] for k, v in example.items() if k != "metadata"}
    # The restore template's pytree must match the checkpoint's: rebuild
    # the optimizer that trained it (adam/adamw/sgd), the schedule kind
    # (a cosine schedule adds a step-count leaf to the optax state; the
    # schedule's actual values are irrelevant for eval), and the EMA slot.
    state = create_train_state(
        model,
        example_batch,
        lr=cfg.lr,
        optimizer_name=cfg.select("model.model_kwargs.optimizer_name", cfg.optimizer),
        schedule=cfg.select("lr_schedule", "constant"),
        total_steps=1,
        warmup_steps=0,
        ema=float(cfg.select("ema_decay", 0.0) or 0.0) > 0,
    )
    state = load_checkpoint(checkpoint_path, state)
    # EMA-trained checkpoints are evaluated with the averaged weights —
    # the same params val selection used during training.
    params = state.ema_params if state.ema_params is not None else state.params
    variables = {"params": params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    return model, variables


def predict(
    cfg,
    experiment_dir: str,
    checkpoint_path: str,
    eval_dataset_name: str,
    predict_images: bool = True,
    eval_region=None,
    eval_dataset_split: str = "test",
    n_workers: int | None = None,
    per_crop_stats: bool = False,
    tta: bool = False,
) -> dict:
    """Evaluate a checkpoint; returns aggregate metrics dict.

    ``per_crop_stats``: rank images/regions by the mean of per-crop
    metrics (reference semantics, predict.py:236-261) instead of one
    score per stitched scene.
    ``tta``: dihedral test-time augmentation — tile softmax averaged over
    the 8 square-symmetry transforms (beyond-reference quality option;
    ~8x the forward cost).
    """
    slice_params = generate_image_slice_object(
        cfg.crop_height, cfg.crop_width, cfg.crop_stride
    )
    if eval_region:
        cfg.eval_region = eval_region
    dataset_kwargs = cfg.dataset.get("dataset_kwargs") or {}
    eval_dataset = build_dataset(
        eval_dataset_name,
        eval_dataset_split,
        slice_params,
        sensor=cfg.dataset.sensor,
        channels=cfg.dataset.channels,
        norm_mode=cfg.norm_mode,
        eval_region=cfg.eval_region,
        ignore_index=cfg.ignore_index,
        seed_num=cfg.select("seed_num"),
        train_split_pct=cfg.select("train_split_pct", 0.8),
        output_metadata=True,
        **dataset_kwargs,
    )
    n_classes = eval_dataset.n_classes
    ignore_index = resolve_ignore_index(cfg.ignore_index, n_classes)

    model, variables = load_model_for_eval(cfg, checkpoint_path, eval_dataset)
    mesh = make_mesh(cfg.select("tpu.n_devices"))
    variables = replicate_state(variables, mesh)
    data_sharding = batch_sharding(mesh)
    n_devices = len(mesh.devices.ravel())
    batch_size = resolve_inference_batch_size(cfg, n_devices)

    ckpt_name = os.path.basename(os.path.normpath(checkpoint_path))
    region_key = (
        f"split_pct_{cfg.select('train_split_pct', 0.8)}"
        if cfg.eval_region is None
        else "-".join(
            cfg.eval_region
            if isinstance(cfg.eval_region, (list, tuple))
            else [cfg.eval_region]
        )
    )
    pred_dir = os.path.join(
        experiment_dir, "predictions", eval_dataset_name, region_key, ckpt_name
    )
    os.makedirs(pred_dir, exist_ok=True)

    total_confusion = np.zeros((n_classes, n_classes), np.float32)
    image_stats_f1, region_stats_f1 = defaultdict(list), defaultdict(list)
    image_stats_iou, region_stats_iou = defaultdict(list), defaultdict(list)

    from tqdm import tqdm

    n_scenes = len({e.image_path for e in eval_dataset.dataset})
    for scene in tqdm(
        sliding_window_predict(
            model,
            variables,
            eval_dataset,
            batch_size=batch_size,
            n_workers=n_workers or cfg.n_workers,
            data_sharding=data_sharding,
            collect_extras=True,
            device_data_bytes=int(
                cfg.select("tpu.device_data_bytes", 6 << 30) or 0
            ),
            per_crop_ignore_index=ignore_index if per_crop_stats else None,
            tta=tta,
        ),
        total=n_scenes,
        desc="predict scenes",
        unit="scene",
    ):
        probs = scene["probabilities"]  # [H, W, n_classes]
        gt = np.rint(scene["gt"]).astype(np.int32)
        pred_class = probs.argmax(axis=-1)
        # Binary water mask: clip classes to {0,1} exactly like the
        # reference (predict.py:305-308) — class-2 ("unknown") predictions
        # count as WATER in the binary products, matching np.clip(pred,0,1).
        water_pred = np.minimum(pred_class, 1).astype(np.uint8)

        confusion = np.asarray(
            confusion_from_preds(
                jnp.asarray(pred_class), jnp.asarray(gt), n_classes, ignore_index
            )
        )
        total_confusion += confusion
        scene_metrics = compute_metrics(
            jnp.asarray(confusion), ignore_index=ignore_index
        )
        if per_crop_stats:
            # Reference semantics: one score per crop, reports average them.
            ranked = [
                compute_metrics(jnp.asarray(cm), ignore_index=ignore_index)
                for cm in scene["crop_confusions"]
            ]
        else:
            ranked = [scene_metrics]
        for metrics in ranked:
            f1 = float(metrics["F1Score"])
            iou = float(metrics["JaccardIndex"])
            image_stats_f1[scene["image_path"]].append(f1)
            image_stats_iou[scene["image_path"]].append(iou)
            region_stats_f1[scene["region"]].append(f1)
            region_stats_iou[scene["region"]].append(iou)

        if predict_images:
            scene_dir = os.path.join(
                pred_dir, "image_predictions", scene["region"], scene["image_name"]
            )
            os.makedirs(scene_dir, exist_ok=True)
            from PIL import Image

            rgb = eval_dataset.to_RGB(np.transpose(scene["rgb"], (2, 0, 1)))
            rgb_u8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(rgb_u8).save(os.path.join(scene_dir, "rgb.png"))
            Image.fromarray(
                (np.clip(probs[..., 1], 0, 1) * 255).astype(np.uint8)
            ).save(os.path.join(scene_dir, "pred_softmax.png"))
            Image.fromarray(((gt == 1) * 255).astype(np.uint8)).save(
                os.path.join(scene_dir, "gt.png")
            )
            tiff.imwrite(
                os.path.join(scene_dir, "pred_class.tif"),
                water_pred,
                geo_from=scene["image_path"],
            )
            cm_img = create_conf_matrix_pred_image(water_pred, (gt == 1))
            Image.fromarray(cm_img).save(os.path.join(scene_dir, "cm.png"))
            create_gif(
                [rgb_u8, cm_img], os.path.join(scene_dir, "rgb_cm.gif")
            )

    # Aggregate metrics with the reference's exported key names.
    metrics = compute_metrics(
        jnp.asarray(total_confusion), "test_", ignore_index=ignore_index
    )
    metrics.update(
        compute_binary_class_metrics(jnp.asarray(total_confusion), 1, "test_")
    )
    key_map = torchmetrics_key_names("test_")
    all_metrics = {key_map.get(k, k): float(v) for k, v in metrics.items()}
    all_metrics["eval_dataset"] = eval_dataset_name
    with open(os.path.join(pred_dir, "metrics.json"), "w") as handle:
        json.dump(all_metrics, handle, indent=4)

    save_image_stats(image_stats_f1, pred_dir, "F1-score")
    save_image_stats(image_stats_iou, pred_dir, "mIoU")
    if region_stats_iou:
        save_region_stats(region_stats_f1, pred_dir, "F1-Score")
        save_region_stats(region_stats_iou, pred_dir, "iou")
    return all_metrics


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Evaluate a checkpoint and reconstruct scene predictions."
    )
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("--eval_dataset_name", type=str, default=None)
    parser.add_argument(
        "--predict_images",
        default=True,
        action=argparse.BooleanOptionalAction,
        help="Write per-scene images (disable with --no-predict_images).",
    )
    parser.add_argument("--eval_region", type=str, default=None)
    parser.add_argument("--eval_dataset_split", type=str, default="test")
    parser.add_argument("--n_workers", type=int, default=None)
    parser.add_argument(
        "--per_crop_stats",
        action="store_true",
        help="Rank images/regions by mean per-crop metrics (reference "
        "predict.py semantics) instead of one score per stitched scene.",
    )
    parser.add_argument(
        "--tta",
        action="store_true",
        help="Dihedral test-time augmentation: average tile softmax over "
        "the 8 square-symmetry transforms (~8x forward cost).",
    )
    args = parser.parse_args(argv)

    # Experiment dir = two levels above the checkpoint dir
    # (<exp>/checkpoints/<name>), matching the reference layout.
    experiment_dir = os.path.dirname(
        os.path.dirname(os.path.normpath(args.checkpoint_path))
    )
    cfg = load_experiment_config(experiment_dir)
    eval_dataset_name = args.eval_dataset_name or cfg.dataset.name
    metrics = predict(
        cfg,
        experiment_dir,
        args.checkpoint_path,
        eval_dataset_name=eval_dataset_name,
        predict_images=args.predict_images,
        eval_region=args.eval_region,
        eval_dataset_split=args.eval_dataset_split,
        n_workers=args.n_workers,
        per_crop_stats=args.per_crop_stats,
        tta=args.tta,
    )
    print(json.dumps(metrics, indent=2))
    return metrics


if __name__ == "__main__":
    main()
