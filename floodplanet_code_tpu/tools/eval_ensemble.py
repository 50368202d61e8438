"""Deep-ensemble evaluation: average softmax over several checkpoints.

Classic deep ensembling (Lakshminarayanan et al. 2017): run k
independently-trained models of the same architecture on the same fold
and average their predicted *probabilities*. Unlike weight soups
(tools/soup_checkpoints.py) this works across different random seeds —
weight averaging fails across inits (permutation symmetry), probability
averaging does not. Inference costs k forwards; no extra training.

Each positional argument is an experiment directory produced by
``fit``/``run_crossval``; its best retained checkpoint (top of
``checkpoints/index.json``) — or an explicit checkpoint directory passed
directly — becomes one ensemble member. The fold definition (dataset,
sensor, eval region, split seed) is taken from the FIRST experiment's
snapshot config; every other member must match it, since mixing folds
would leak the held-out region into a member's training set.

Reported: each member's re-measured val IoU (comparable to the
``best_val_iou`` in the CV records — same split, loader and metric
semantics as fit_model's validation pass) and the ensemble's metrics.

No reference analog: the reference trains per-fold single models only
(/root/reference/st_water_seg/fit.py).

Usage:
    python -m floodplanet_code_tpu.tools.eval_ensemble \
        outputs/cv_a/S1_Bangladesh outputs/cv_b/S1_Bangladesh \
        [--split valid|test] [--batch_size N] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


FOLD_KEYS = (
    "dataset.name",
    "dataset.sensor",
    "eval_region",
    "train_split_pct",
    "ignore_index",
    "crop_height",
    "crop_width",
    "crop_stride",
    "norm_mode",
    "model.name",
)


def _fold_signature(cfg) -> dict:
    signature = {key: cfg.select(key) for key in FOLD_KEYS}
    # Differently-seeded members are the point of an ensemble — the seed
    # only matters when it defines the split itself: with no eval_region
    # the train/val membership is a seeded random draw, so mismatched
    # seeds would leak one member's training scenes into the shared val.
    if not signature["eval_region"]:
        signature["seed_num"] = cfg.select("seed_num")
    return signature


def _best_checkpoint(exp_dir: str) -> str:
    """Explicit checkpoint dir, or the best entry of an experiment dir."""
    if os.path.exists(os.path.join(exp_dir, "index.json")) or not os.path.isdir(
        os.path.join(exp_dir, "checkpoints")
    ):
        # Passed a checkpoint directory directly (it has no checkpoints/
        # subdir); use it as-is.
        return exp_dir
    index_path = os.path.join(exp_dir, "checkpoints", "index.json")
    with open(index_path) as handle:
        entries = json.load(handle)["entries"]
    if not entries:
        raise ValueError(f"no checkpoints indexed under {exp_dir}")
    best = max(entries, key=lambda e: e["metric"])
    return os.path.join(exp_dir, "checkpoints", best["name"])


def _exp_dir_of(path: str) -> str:
    """Experiment dir owning ``path`` (itself, or two levels up)."""
    if os.path.isdir(os.path.join(path, "hydra")):
        return path
    parent = os.path.dirname(os.path.dirname(os.path.abspath(path)))
    if os.path.isdir(os.path.join(parent, "hydra")):
        return parent
    raise ValueError(f"cannot locate an experiment dir for {path}")


def evaluate_ensemble(
    member_dirs: list[str],
    split: str = "valid",
    batch_size: int | None = None,
) -> dict:
    """Evaluate the softmax-average ensemble of the members' best ckpts."""
    from floodplanet_code_tpu.config import load_experiment_config
    from floodplanet_code_tpu.data import (
        BatchLoader,
        build_dataset,
        device_prefetch,
        generate_image_slice_object,
    )
    from floodplanet_code_tpu.inference.predict import load_model_for_eval
    from floodplanet_code_tpu.models.water_seg import AUX_FEATURE_KEYS
    from floodplanet_code_tpu.ops.metrics import (
        compute_binary_class_metrics,
        compute_metrics,
        confusion_from_logits,
        torchmetrics_key_names,
    )
    from floodplanet_code_tpu.parallel.mesh import (
        batch_shardings_for,
        make_mesh,
        n_batch_shards,
    )
    from floodplanet_code_tpu.train.fit import resolve_ignore_index

    if len(member_dirs) < 2:
        raise ValueError("an ensemble needs at least 2 members")

    exp_dirs = [_exp_dir_of(d) for d in member_dirs]
    cfgs = [load_experiment_config(d) for d in exp_dirs]
    signature = _fold_signature(cfgs[0])
    for exp_dir, cfg in zip(exp_dirs[1:], cfgs[1:]):
        other = _fold_signature(cfg)
        if other != signature:
            diff = {
                k: (signature[k], other[k])
                for k in signature
                if signature[k] != other[k]
            }
            raise ValueError(
                f"member {exp_dir} was trained on a different fold than "
                f"{exp_dirs[0]}: {diff}"
            )

    cfg = cfgs[0]
    slice_params = generate_image_slice_object(
        cfg.crop_height, cfg.crop_width, cfg.crop_stride
    )
    dataset = build_dataset(
        cfg.dataset.name,
        split,
        slice_params,
        sensor=cfg.dataset.sensor,
        channels=cfg.dataset.channels,
        norm_mode=cfg.norm_mode,
        eval_region=cfg.eval_region,
        ignore_index=cfg.ignore_index,
        seed_num=cfg.seed_num,
        train_split_pct=cfg.train_split_pct,
        **(cfg.dataset.get("dataset_kwargs") or {}),
    )
    ignore_index = resolve_ignore_index(cfg.ignore_index, dataset.n_classes)

    checkpoints = [_best_checkpoint(d) for d in member_dirs]
    model = None
    member_variables = []
    for exp_cfg, ckpt in zip(cfgs, checkpoints):
        # Progress lines double as liveness signals: detached queue runs
        # watch the log for stalls (scripts/stall_watchdog.sh), and member
        # restore + the k-forward compile are otherwise silent minutes.
        print(f"[ensemble] restoring member: {ckpt}", flush=True)
        model, variables = load_model_for_eval(exp_cfg, ckpt, dataset)
        member_variables.append(variables)
    member_variables = tuple(member_variables)
    print(
        f"[ensemble] {len(member_variables)} members restored; "
        f"compiling + evaluating on '{split}'",
        flush=True,
    )

    mesh = make_mesh(cfg.select("tpu.n_devices"))
    data_sharding = batch_shardings_for(mesh)
    n_data = n_batch_shards(mesh)
    eval_batch = int(batch_size or cfg.batch_size)
    if eval_batch % n_data != 0:
        eval_batch = max(n_data, (eval_batch // n_data) * n_data)

    # Variables go in as jit ARGUMENTS (a closure capture would ship the
    # full weight trees as HLO literals through the remote-compile path).
    @jax.jit
    def eval_step(all_variables, batch):
        model_batch = {"image": batch["image"]}
        for key in AUX_FEATURE_KEYS:
            if key in batch:
                model_batch[key] = batch[key]
        probs = 0.0
        for variables in all_variables:  # static length k
            logits = model.apply(variables, model_batch, train=False)
            probs = probs + jax.nn.softmax(logits.astype(jnp.float32), -1)
        probs = probs / len(all_variables)
        valid = batch["valid"].astype(jnp.float32)[:, None, None]
        # argmax of averaged probabilities; confusion_from_logits only
        # argmaxes its first argument, so probabilities pass through fine.
        ensemble_cm = confusion_from_logits(
            probs, batch["target"], ignore_index, sample_weight=valid
        )
        member_cms = [
            confusion_from_logits(
                model.apply(variables, model_batch, train=False),
                batch["target"],
                ignore_index,
                sample_weight=valid,
            )
            for variables in all_variables
        ]
        return ensemble_cm, member_cms

    loader = BatchLoader(
        dataset,
        batch_size=eval_batch,
        shuffle=False,
        n_workers=cfg.n_workers,
        drop_last=False,
        pad_final=True,
    )
    n_classes = dataset.n_classes
    ensemble_cm = jnp.zeros((n_classes, n_classes), jnp.float32)
    member_cms = [jnp.zeros((n_classes, n_classes), jnp.float32)] * len(
        member_variables
    )
    for n_batches, batch in enumerate(
        device_prefetch(iter(loader), sharding=data_sharding, size=2)
    ):
        e_cm, m_cms = eval_step(member_variables, batch)
        ensemble_cm = ensemble_cm + e_cm
        member_cms = [acc + cm for acc, cm in zip(member_cms, m_cms)]
        if n_batches % 20 == 0:
            print(f"[ensemble] batch {n_batches}", flush=True)

    # Same key convention as fit/predict: the "valid" split reports
    # val_* (the monitored-checkpoint prefix), "test" reports test_*.
    prefix = "val_" if split == "valid" else f"{split}_"
    key_map = torchmetrics_key_names(prefix)

    def finish(confusion) -> dict:
        metrics = compute_metrics(confusion, prefix, ignore_index)
        metrics.update(compute_binary_class_metrics(confusion, 1, prefix))
        return {
            key_map.get(k, k): float(np.asarray(v))
            for k, v in metrics.items()
        }

    monitor = f"{prefix}MulticlassJaccardIndex"
    ensemble_metrics = finish(ensemble_cm)
    members = [
        {
            "experiment": exp_dir,
            "checkpoint": ckpt,
            "iou": finish(cm)[monitor],
        }
        for exp_dir, ckpt, cm in zip(exp_dirs, checkpoints, member_cms)
    ]
    return {
        "split": split,
        "fold": {
            "sensor": cfg.dataset.sensor,
            "eval_region": cfg.eval_region,
        },
        "members": members,
        "best_member_iou": max(m["iou"] for m in members),
        "ensemble_iou": ensemble_metrics[monitor],
        "ensemble_metrics": ensemble_metrics,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "member_dirs",
        nargs="+",
        help="experiment dirs (best retained ckpt used) or checkpoint dirs",
    )
    parser.add_argument("--split", default="valid", choices=("valid", "test"))
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--out", default=None, help="also write JSON here")
    args = parser.parse_args(argv)
    result = evaluate_ensemble(
        args.member_dirs, split=args.split, batch_size=args.batch_size
    )
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as handle:
            json.dump(result, handle, indent=2)


if __name__ == "__main__":
    main()
