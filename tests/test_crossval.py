"""Cross-validation driver (tools/run_crossval.py): fold loop, results
recording, and preemption-safe resume — including the all-folds-skipped
re-invocation (a past NameError regression, ADVICE round 2)."""

import json
import os

import pytest

TINY = [
    "--override", "crop_height=32",
    "--override", "crop_width=32",
    "--override", "crop_stride=32",
    "--override", "n_workers=2",
    "--override", "limit_train_batches=2",
    "--override", "limit_val_batches=2",
    "--override", "tpu.compute_dtype=float32",
    "--override", "transforms.rotate.active=false",
]


@pytest.mark.slow
def test_two_folds_then_resume_skips(
    synthetic_csdap_root, tmp_path, monkeypatch, capsys
):
    from floodplanet_code_tpu.tools.run_crossval import main

    # run_crossval resolves the dataset root via dataset_dirs.json in cwd.
    monkeypatch.chdir(tmp_path)
    with open("dataset_dirs.json", "w") as f:
        json.dump({"floodplanet": synthetic_csdap_root}, f)
    out_dir = str(tmp_path / "cv")
    argv = [
        "--sensor", "S1",
        "--regions", "RegionA", "RegionB",
        "--batch_size", "8",
        "--n_epochs", "1",
        "--out_dir", out_dir,
        "--soup",
        *TINY,
    ]
    main(argv)
    results_path = os.path.join(out_dir, "crossval_S1.json")
    with open(results_path) as f:
        summary = json.load(f)
    assert {f["region"] for f in summary["folds"]} == {"RegionA", "RegionB"}
    assert summary["mean_best_val_iou"] is not None
    for fold in summary["folds"]:
        assert os.path.exists(fold["best_checkpoint"])
        assert fold["best_val_iou"] is not None
        # --soup: greedy top-k soup scored on val after each fold.
        assert fold["soup_val_iou"] is not None
        assert fold["soup_val_iou"] >= fold["soup_base_val_iou"]
        assert os.path.isdir(fold["soup_checkpoint"])

    # Second invocation: every fold recorded -> all skipped, summary still
    # printed from the results file (the past-NameError path), file intact.
    capsys.readouterr()
    main(argv)
    out = capsys.readouterr().out
    assert out.count("already done, skipping") == 2
    assert json.loads(out[out.index("{"):])["folds"] == summary["folds"]
