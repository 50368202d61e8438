"""Cross-validation arm summarizer (tools/summarize_crossval.py)."""

import json
import os

from floodplanet_code_tpu.tools.summarize_crossval import (
    build_pivot,
    format_markdown,
    main,
)

import pytest
pytestmark = pytest.mark.smoke  # sub-minute tier: pure functions, no jit-heavy fits


def _write_arm(root, name, folds, soup=None):
    """One run_crossval out_dir with a crossval_S1.json (+ optional soup)."""
    arm = root / name
    arm.mkdir()
    by_sensor = {}
    for fold in folds:
        by_sensor.setdefault(fold["sensor"], []).append(fold)
    for sensor, records in by_sensor.items():
        with open(arm / f"crossval_{sensor}.json", "w") as handle:
            json.dump({"sensor": sensor, "folds": records}, handle)
    for exp_name, soup_iou in (soup or {}).items():
        soup_dir = arm / exp_name / "checkpoints" / "soup-greedy"
        soup_dir.mkdir(parents=True)
        with open(soup_dir / "soup.json", "w") as handle:
            json.dump({"mode": "greedy", "soup_val_iou": soup_iou}, handle)
    return str(arm)


def test_pivot_partial_arms_and_soup(tmp_path, capsys):
    full = _write_arm(
        tmp_path,
        "arm_full",
        [
            {"sensor": "S1", "region": "A", "best_val_iou": 0.50},
            {"sensor": "S1", "region": "B", "best_val_iou": 0.70},
            {"sensor": "L8", "region": "A", "best_val_iou": 0.60},
        ],
        soup={"S1_A": 0.55},
    )
    partial = _write_arm(
        tmp_path,
        "arm_partial",
        [
            # In-record soup (run_crossval --soup) and a skipped fold.
            {"sensor": "S1", "region": "A", "best_val_iou": 0.52,
             "soup_val_iou": 0.58},
            {"sensor": "S1", "region": "B", "best_val_iou": None},
        ],
    )

    pivot = build_pivot([full, partial])
    assert pivot["arms"] == ["arm_full", "arm_partial"]
    assert pivot["folds"]["S1/A"]["arm_full"] == {
        "iou": 0.50, "soup_iou": 0.55,  # soup.json joined post-hoc
    }
    assert pivot["folds"]["S1/A"]["arm_partial"]["soup_iou"] == 0.58
    assert "arm_partial" not in pivot["folds"]["S1/B"]  # None-IoU skipped
    assert pivot["means"]["arm_full"]["all"] == {
        "mean": (0.50 + 0.70 + 0.60) / 3, "n": 3,
    }
    assert pivot["means"]["arm_partial"]["S1"]["n"] == 1

    table = format_markdown(pivot)
    assert "0.500 (soup 0.550)" in table
    assert "(n=1)" in table  # partial-arm means are flagged
    assert table.count("| mean ") == 3  # S1, L8, all

    # CLI round-trip with --json.
    out_json = str(tmp_path / "pivot.json")
    main([full, partial, "--json", out_json])
    assert "| fold |" in capsys.readouterr().out
    with open(out_json) as handle:
        assert json.load(handle)["arms"] == pivot["arms"]


def test_pivot_ensemble_arm(tmp_path, capsys):
    arm = _write_arm(
        tmp_path,
        "arm",
        [
            {"sensor": "S1", "region": "A", "best_val_iou": 0.50},
            {"sensor": "S1", "region": "B", "best_val_iou": 0.70},
        ],
    )
    ens = tmp_path / "ensemble"
    ens.mkdir()
    with open(ens / "S1_A.json", "w") as handle:
        json.dump(
            {
                "fold": {"sensor": "S1", "eval_region": "A"},
                "ensemble_iou": 0.61,
            },
            handle,
        )
    with open(ens / "notes.json", "w") as handle:
        json.dump({"unrelated": True}, handle)  # ignored: no ensemble_iou

    pivot = build_pivot([arm], [str(ens)])
    assert pivot["arms"] == ["arm", "ensemble"]
    assert pivot["folds"]["S1/A"]["ensemble"] == {"iou": 0.61}
    assert "ensemble" not in pivot["folds"]["S1/B"]
    assert pivot["means"]["ensemble"]["all"] == {"mean": 0.61, "n": 1}

    main([arm, "--ensemble_dir", str(ens)])
    assert "0.610" in capsys.readouterr().out
