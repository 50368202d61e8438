"""Time-series batch inference driver (reference: Batch_infer.sh).

The reference loops over scene directories with a shell script that
jq-rewrites ``dataset_dirs.json`` and invokes infer.py per scene
(Batch_infer.sh:12-26) — its "deploy over a time series" workflow. This
driver does the same loop in-process: for each scene root, point the dataset
at it and export masks, without mutating a shared json file on disk.

Usage:
    python -m floodplanet_code_tpu.inference.batch_infer \
        <checkpoint> <dataset_name> --roots <dir1> <dir2> ... \
        [--split all] [--save_dir out/]
"""

from __future__ import annotations

import argparse
import copy
import os

from floodplanet_code_tpu.config import load_experiment_config
from floodplanet_code_tpu.inference.infer import infer


def batch_infer(
    checkpoint_path: str,
    dataset_name: str,
    roots: list[str],
    split: str = "all",
    save_dir: str | None = None,
    n_workers: int | None = None,
) -> dict:
    experiment_dir = os.path.dirname(
        os.path.dirname(os.path.normpath(checkpoint_path))
    )
    cfg = load_experiment_config(experiment_dir)
    if save_dir is None:
        save_dir = os.path.join(experiment_dir, "batch_inference")
    results = {}
    for root in roots:
        run_cfg = copy.deepcopy(cfg)
        kwargs = dict(run_cfg.dataset.get("dataset_kwargs") or {})
        kwargs["root_dir"] = root
        run_cfg.dataset["dataset_kwargs"] = kwargs
        out_dir = os.path.join(save_dir, os.path.basename(os.path.normpath(root)))
        written = infer(
            run_cfg,
            checkpoint_path,
            dataset_name,
            split,
            out_dir,
            eval_region=None,
            n_workers=n_workers,
        )
        results[root] = written
        print(f"[batch_infer] {root}: {len(written)} masks -> {out_dir}")
    return results


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("dataset_name", type=str)
    parser.add_argument("--roots", type=str, nargs="+", required=True)
    parser.add_argument("--split", type=str, default="all")
    parser.add_argument("--save_dir", type=str, default=None)
    parser.add_argument("--n_workers", type=int, default=None)
    args = parser.parse_args(argv)
    return batch_infer(
        args.checkpoint_path,
        args.dataset_name,
        args.roots,
        split=args.split,
        save_dir=args.save_dir,
        n_workers=args.n_workers,
    )


if __name__ == "__main__":
    main()
