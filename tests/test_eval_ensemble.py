"""Deep-ensemble evaluation tool (tools/eval_ensemble.py).

Fits two tiny runs of the same fold with different seeds, then checks
the softmax-average ensemble evaluates end-to-end, re-measures each
member on the shared val split, and refuses to mix folds.
"""

import pytest

from floodplanet_code_tpu.config import compose
from floodplanet_code_tpu.tools.eval_ensemble import evaluate_ensemble


def _fit(synthetic_csdap_root, exp_dir, seed, eval_region="RegionA"):
    from floodplanet_code_tpu.train.fit import fit_model

    cfg = compose(
        overrides=[
            "dataset.sensor=PS",
            f"eval_region={eval_region}",
            f"seed_num={seed}",
            "crop_height=32",
            "crop_width=32",
            "crop_stride=32",
            "batch_size=8",
            "n_epochs=2",
            "n_workers=2",
            "lr=1e-3",
            "limit_train_batches=4",
            "limit_val_batches=4",
            "save_topk_models=2",
            "tpu.compute_dtype=float32",
            "transforms.rotate.active=false",
        ]
    )
    cfg.dataset["dataset_kwargs"] = {"root_dir": synthetic_csdap_root}
    fit_model(cfg, overwrite_exp_dir=str(exp_dir))
    return str(exp_dir)


@pytest.mark.slow
def test_two_seed_ensemble(synthetic_csdap_root, tmp_path):
    a = _fit(synthetic_csdap_root, tmp_path / "seed0", seed=0)
    b = _fit(synthetic_csdap_root, tmp_path / "seed1", seed=1)

    result = evaluate_ensemble([a, b], split="valid")
    assert len(result["members"]) == 2
    for member in result["members"]:
        assert 0.0 <= member["iou"] <= 1.0
    assert result["best_member_iou"] == max(
        m["iou"] for m in result["members"]
    )
    assert 0.0 <= result["ensemble_iou"] <= 1.0
    assert (
        result["ensemble_metrics"]["val_MulticlassJaccardIndex"]
        == result["ensemble_iou"]
    )

    # Members trained on different folds must be rejected (mixing folds
    # leaks the held-out region into a member's training set).
    c = _fit(
        synthetic_csdap_root, tmp_path / "foldB", seed=0,
        eval_region="RegionB",
    )
    with pytest.raises(ValueError, match="different fold"):
        evaluate_ensemble([a, c], split="valid")

    with pytest.raises(ValueError, match="at least 2"):
        evaluate_ensemble([a], split="valid")
