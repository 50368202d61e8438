"""Checkpoint soup: average the retained top-k checkpoints of one run.

Model soups (Wortsman et al. 2022) average the *weights* of several
fine-tuned snapshots; the average frequently beats the best individual
snapshot at zero extra training or inference cost. Here the ingredients
are the top-k epoch checkpoints the orbax manager already retains
(train/checkpoint.py keeps ``save_topk_models`` best by
val_MulticlassJaccardIndex) — snapshots along one trajectory, i.e. a
trajectory soup in the spirit of SWA (Izmailov et al. 2018). This is a
natural fit for the high-variance small-data CV folds (RESULTS.md):
adjacent-epoch val IoU swings several points, so best-epoch selection
rides noise that averaging cancels.

Two modes:
- ``uniform``: average all ingredients.
- ``greedy`` (default, the paper's recipe): order ingredients by their
  stored val metric, start from the best one, and keep each addition
  only if the val IoU (re-measured on the fold's validation split) does
  not drop. Never worse than the best single checkpoint *on val* by
  construction.

What is averaged: the weights that evaluation actually uses
(``ema_params`` when the run trained with EMA, else ``params``) and the
BN ``batch_stats`` (running means average exactly; averaging running
variances is the standard soup/SWA approximation — ingredients come from
nearby epochs of one trajectory, where the stats barely move).

The souped model is written as a normal orbax checkpoint directory
``<exp>/checkpoints/soup-<mode>`` with a metrics.json, loadable by the
predict/infer CLIs like any other checkpoint. It is deliberately NOT
registered in the manager's index.json: the index drives top-k retention
and resume, and a derived artifact must neither evict real epoch
checkpoints nor be mistaken for the latest training state.

No reference analog: the reference keeps top-k checkpoints
(/root/reference/st_water_seg/fit.py:80-85) but never combines them.

Usage:
    python -m floodplanet_code_tpu.tools.soup_checkpoints <exp_dir> \
        [--mode greedy|uniform] [--max_k N] [--no_eval] [--batch_size N]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def average_trees(trees: list):
    """Uniform elementwise mean over a list of identically-shaped pytrees."""
    n = float(len(trees))
    return jax.tree.map(lambda *xs: sum(xs) / n, *trees)


def _soup_weights(state):
    """The weight tree evaluation uses: EMA when present, else params."""
    return state.ema_params if state.ema_params is not None else state.params


def load_ingredients(exp_dir: str, cfg, dataset, max_k: int | None = None):
    """Restore the index's top-k checkpoints, best-metric first.

    Returns (entries, states, template): index entries sorted by stored
    metric (desc), the restored TrainStates in the same order, and the
    template state (for structure-preserving saves).
    """
    from floodplanet_code_tpu.models import build_model, resolve_conv_impl
    from floodplanet_code_tpu.train.checkpoint import load_checkpoint
    from floodplanet_code_tpu.train.state import create_train_state

    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    index_path = os.path.join(ckpt_dir, "index.json")
    with open(index_path) as handle:
        entries = json.load(handle)["entries"]
    entries = sorted(entries, key=lambda e: e["metric"], reverse=True)
    if max_k:
        entries = entries[:max_k]
    if not entries:
        raise ValueError(f"no checkpoints indexed under {ckpt_dir}")

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
    template = create_train_state(
        model,
        example_batch,
        lr=cfg.lr,
        optimizer_name=cfg.select(
            "model.model_kwargs.optimizer_name", cfg.optimizer
        ),
        schedule=cfg.select("lr_schedule", "constant"),
        total_steps=1,
        warmup_steps=0,
        ema=float(cfg.select("ema_decay", 0.0) or 0.0) > 0,
    )
    states = [
        load_checkpoint(os.path.join(ckpt_dir, e["name"]), template)
        for e in entries
    ]
    return entries, states, template, model


def make_val_evaluator(cfg, dataset, model, ignore_index: int):
    """Validation-split evaluator: (weights, batch_stats) -> metrics dict.

    Mirrors fit_model's validation pass (same loader semantics: no
    shuffle, padded final batch masked by ``valid``) so the returned
    val_MulticlassJaccardIndex is directly comparable to the stored
    checkpoint metrics. Uses the device-resident cache when it fits the
    byte budget (18x data path on a remote TPU), else the threaded host
    loader.
    """
    from floodplanet_code_tpu.data import BatchLoader, device_prefetch
    from floodplanet_code_tpu.models.water_seg import AUX_FEATURE_KEYS
    from floodplanet_code_tpu.ops.losses import cross_entropy_ignore
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
        replicated_sharding,
    )

    mesh = make_mesh(cfg.select("tpu.n_devices"))
    data_sharding = batch_shardings_for(mesh)
    n_data = n_batch_shards(mesh)
    batch_size = int(cfg.batch_size)
    if batch_size % n_data != 0:
        batch_size = max(n_data, (batch_size // n_data) * n_data)

    n_classes = dataset.n_classes

    @jax.jit
    def eval_step(params, batch_stats, batch):
        model_batch = {"image": batch["image"]}
        for key in AUX_FEATURE_KEYS:
            if key in batch:
                model_batch[key] = batch[key]
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        logits = model.apply(variables, model_batch, train=False)
        valid = batch["valid"].astype(jnp.float32)[:, None, None]
        loss = cross_entropy_ignore(
            logits, batch["target"], ignore_index, sample_weight=valid
        )
        confusion = confusion_from_logits(
            logits, batch["target"], ignore_index, sample_weight=valid
        )
        return loss, confusion

    # Batch source: device cache when it fits, host loader otherwise.
    cache = builder = None
    cache_bytes = int(cfg.select("tpu.device_data_bytes", 6 << 30) or 0)
    if cache_bytes > 0:
        try:
            from floodplanet_code_tpu.data.device_cache import (
                build_device_cache,
                make_batch_builder,
            )

            cache = build_device_cache(
                dataset, cache_bytes, replicated_sharding(mesh)
            )
            if cache is not None:
                builder = make_batch_builder(
                    cache,
                    out_shardings={
                        k: data_sharding[k]
                        for k in ("image", "target", "mean", "std")
                    },
                )
        except Exception as exc:  # pragma: no cover - defensive fallback
            print(f"[soup] device cache unavailable ({exc}); host loader")
            cache = None

    def batches():
        if cache is not None:
            n = len(dataset)
            for start in range(0, n, batch_size):
                idx = np.arange(start, min(start + batch_size, n))
                valid = np.ones(batch_size, bool)
                if len(idx) < batch_size:
                    valid[len(idx) :] = False
                    idx = np.concatenate(
                        [idx, np.zeros(batch_size - len(idx), idx.dtype)]
                    )
                batch = builder(jnp.asarray(cache.index_rows(dataset, idx)))
                batch["valid"] = jax.device_put(valid, data_sharding["valid"])
                yield batch
        else:
            loader = BatchLoader(
                dataset,
                batch_size=batch_size,
                shuffle=False,
                n_workers=cfg.n_workers,
                drop_last=False,
                pad_final=True,
            )
            yield from device_prefetch(
                iter(loader), sharding=data_sharding, size=2
            )

    key_map = torchmetrics_key_names("val_")

    def evaluate(params, batch_stats) -> dict:
        confusion = jnp.zeros((n_classes, n_classes), jnp.float32)
        losses = []
        for batch in batches():
            loss, cm = eval_step(params, batch_stats, batch)
            confusion = confusion + cm
            losses.append(loss)
        metrics = compute_metrics(confusion, "val_", ignore_index)
        metrics.update(compute_binary_class_metrics(confusion, 1, "val_"))
        out = {key_map.get(k, k): float(np.asarray(v)) for k, v in metrics.items()}
        out["valid_loss"] = float(np.mean([np.asarray(l) for l in losses]))
        return out

    return evaluate


def soup_experiment(
    exp_dir: str,
    mode: str = "greedy",
    max_k: int | None = None,
    no_eval: bool = False,
    batch_size: int | None = None,
    out_name: str | None = None,
) -> dict:
    """Build, (optionally) evaluate, and save a checkpoint soup.

    Returns the summary dict (also written next to the soup checkpoint).
    """
    import orbax.checkpoint as ocp

    from floodplanet_code_tpu.config import load_experiment_config
    from floodplanet_code_tpu.data import (
        build_dataset,
        generate_image_slice_object,
    )
    from floodplanet_code_tpu.train.checkpoint import MONITOR_KEY, _to_saveable
    from floodplanet_code_tpu.train.fit import resolve_ignore_index

    if mode not in ("greedy", "uniform"):
        raise ValueError(f'soup mode must be greedy|uniform, got "{mode}"')
    if mode == "greedy" and no_eval:
        raise ValueError("greedy soup needs validation evals; drop --no_eval")

    cfg = load_experiment_config(exp_dir)
    if batch_size:
        cfg.batch_size = batch_size
    slice_params = generate_image_slice_object(
        cfg.crop_height, cfg.crop_width, cfg.crop_stride
    )
    dataset_kwargs = cfg.dataset.get("dataset_kwargs") or {}
    valid_dataset = build_dataset(
        cfg.dataset.name,
        "valid",
        slice_params,
        sensor=cfg.dataset.sensor,
        channels=cfg.dataset.channels,
        norm_mode=cfg.norm_mode,
        eval_region=cfg.eval_region,
        ignore_index=cfg.ignore_index,
        seed_num=cfg.seed_num,
        train_split_pct=cfg.train_split_pct,
        **dataset_kwargs,
    )
    ignore_index = resolve_ignore_index(
        cfg.ignore_index, valid_dataset.n_classes
    )

    entries, states, template, model = load_ingredients(
        exp_dir, cfg, valid_dataset, max_k
    )
    weights = [_soup_weights(s) for s in states]
    stats = [s.batch_stats for s in states]
    have_stats = stats[0] is not None

    evaluate = None
    if not no_eval:
        evaluate = make_val_evaluator(cfg, valid_dataset, model, ignore_index)

    chosen = list(range(len(entries)))
    per_ingredient = [
        {"name": e["name"], "epoch": e["epoch"], "stored_metric": e["metric"]}
        for e in entries
    ]
    if mode == "uniform":
        soup_w = average_trees(weights)
        soup_s = average_trees(stats) if have_stats else None
        soup_metrics = (
            evaluate(soup_w, soup_s) if evaluate is not None else {}
        )
    else:
        # Greedy (Wortsman et al. alg. 1): ingredients in stored-metric
        # order; keep an addition iff val IoU does not drop.
        chosen = [0]
        soup_w, soup_s = weights[0], stats[0]
        soup_metrics = evaluate(soup_w, soup_s)
        best = base_val_iou = soup_metrics[MONITOR_KEY]
        per_ingredient[0]["greedy"] = f"base (val {best:.4f})"
        for i in range(1, len(entries)):
            cand = chosen + [i]
            cand_w = average_trees([weights[j] for j in cand])
            cand_s = (
                average_trees([stats[j] for j in cand]) if have_stats else None
            )
            cand_metrics = evaluate(cand_w, cand_s)
            iou = cand_metrics[MONITOR_KEY]
            if iou >= best:
                chosen, soup_w, soup_s = cand, cand_w, cand_s
                soup_metrics, best = cand_metrics, iou
                per_ingredient[i]["greedy"] = f"kept (val {iou:.4f})"
            else:
                per_ingredient[i]["greedy"] = f"dropped (val {iou:.4f})"

    # Save as a regular checkpoint directory (loadable by predict/infer);
    # keep the template's structure: the souped weights go to params AND,
    # when the run trained with EMA, to ema_params (predict evaluates
    # ema_params when present).
    soup_state = states[0].replace(
        params=soup_w,
        ema_params=(soup_w if states[0].ema_params is not None else None),
        batch_stats=soup_s,
    )
    name = out_name or f"soup-{mode}"
    path = os.path.join(exp_dir, "checkpoints", name)
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, _to_saveable(soup_state))
    checkpointer.wait_until_finished()

    summary = {
        "mode": mode,
        "checkpoint": path,
        "n_ingredients_available": len(entries),
        "ingredients_used": [entries[i]["name"] for i in chosen],
        "per_ingredient": per_ingredient,
        "best_single_stored_metric": entries[0]["metric"],
        "soup_val_metrics": soup_metrics,
    }
    if mode == "greedy":
        # Re-measured val IoU of the best single checkpoint (the greedy
        # base): by construction soup_val_iou >= base_val_iou.
        summary["base_val_iou"] = base_val_iou
    if soup_metrics:
        summary["soup_val_iou"] = soup_metrics.get(MONITOR_KEY)
        with open(os.path.join(path, "metrics.json"), "w") as handle:
            json.dump(soup_metrics | {"soup": summary["ingredients_used"]},
                      handle, indent=2)
    with open(os.path.join(path, "soup.json"), "w") as handle:
        json.dump(summary, handle, indent=2)
    return summary


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("exp_dir", help="experiment dir with checkpoints/")
    parser.add_argument("--mode", default="greedy",
                        choices=("greedy", "uniform"))
    parser.add_argument("--max_k", type=int, default=None,
                        help="cap the number of ingredients (default: all)")
    parser.add_argument("--no_eval", action="store_true",
                        help="skip validation evals (uniform mode only)")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="override eval batch size")
    parser.add_argument("--out_name", default=None,
                        help="soup checkpoint dir name (default soup-<mode>)")
    args = parser.parse_args(argv)
    summary = soup_experiment(
        args.exp_dir,
        mode=args.mode,
        max_k=args.max_k,
        no_eval=args.no_eval,
        batch_size=args.batch_size,
        out_name=args.out_name,
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
