"""Measure dihedral TTA's quality delta on the round-3 CV checkpoints.

For every fold recorded in a crossval results JSON, evaluates the best
checkpoint on its held-out region twice — plain and --tta — and writes
one combined JSON with the per-fold test metrics. Run on the TPU after
the CV arms finish:

    python scripts/eval_tta_r3.py outputs/cv_r3_cosine/crossval_S1.json \
        outputs/cv_r3_cosine/crossval_L8.json \
        --out outputs/cv_r3_cosine/tta_eval.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("results", nargs="+", help="crossval_*.json paths")
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    sys.path.insert(0, "/root/repo")
    from floodplanet_code_tpu.config import load_experiment_config
    from floodplanet_code_tpu.inference.predict import predict

    rows = []
    for results_path in args.results:
        with open(results_path) as handle:
            summary = json.load(handle)
        for fold in summary["folds"]:
            ckpt = fold["best_checkpoint"]
            if not os.path.exists(ckpt):
                print(f"[tta_eval] missing checkpoint, skipping: {ckpt}")
                continue
            exp_dir = os.path.dirname(os.path.dirname(ckpt))
            row = {
                "sensor": fold["sensor"],
                "region": fold["region"],
                "best_val_iou": fold["best_val_iou"],
            }
            for label, tta in (("plain", False), ("tta", True)):
                cfg = load_experiment_config(exp_dir)
                metrics = predict(
                    cfg,
                    exp_dir,
                    ckpt,
                    eval_dataset_name=cfg.dataset.name,
                    predict_images=False,
                    tta=tta,
                )
                row[label] = {
                    "test_IoU": metrics.get("test_MulticlassJaccardIndex"),
                    "test_water_IoU": metrics.get("test_water_IoU"),
                    "test_water_F1": metrics.get("test_water_F1"),
                }
            rows.append(row)
            print(f"[tta_eval] {row['sensor']}/{row['region']}: "
                  f"plain {row['plain']} tta {row['tta']}")
            with open(args.out, "w") as handle:
                json.dump(rows, handle, indent=2)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
