"""Checkpoint-soup tool (tools/soup_checkpoints.py).

The fast test pins the averaging math; the slow test runs the full
pipeline — fit -> top-k checkpoints -> uniform + greedy soup -> the soup
checkpoint loads through the standard predict restore path.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from floodplanet_code_tpu.config import compose
from floodplanet_code_tpu.tools.soup_checkpoints import (
    average_trees,
    soup_experiment,
)


def test_average_trees():
    t1 = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    t2 = {"a": 3.0 * jnp.ones(3), "b": {"c": 2.0 * jnp.ones(2)}}
    t3 = {"a": 2.0 * jnp.ones(3), "b": {"c": 4.0 * jnp.ones(2)}}
    avg = average_trees([t1, t2, t3])
    np.testing.assert_allclose(np.asarray(avg["a"]), 2.0)
    np.testing.assert_allclose(np.asarray(avg["b"]["c"]), 2.0)
    # A single-ingredient "soup" is the identity.
    one = average_trees([t1])
    np.testing.assert_allclose(np.asarray(one["a"]), np.asarray(t1["a"]))


@pytest.mark.slow
def test_soup_end_to_end(synthetic_csdap_root, tmp_path):
    from floodplanet_code_tpu.train.fit import fit_model

    cfg = compose(
        overrides=[
            "dataset.sensor=PS",
            "eval_region=RegionA",
            "crop_height=32",
            "crop_width=32",
            "crop_stride=32",
            "batch_size=8",
            "n_epochs=3",
            "n_workers=2",
            "lr=1e-3",
            "limit_train_batches=4",
            "limit_val_batches=4",
            "save_topk_models=3",
            "tpu.compute_dtype=float32",
            "transforms.rotate.active=false",
        ]
    )
    cfg.dataset["dataset_kwargs"] = {"root_dir": synthetic_csdap_root}
    exp_dir = str(tmp_path / "exp")
    fit_model(cfg, overwrite_exp_dir=exp_dir)

    # Uniform soup without eval: checkpoint written, no metrics claimed.
    summary = soup_experiment(exp_dir, mode="uniform", no_eval=True)
    assert os.path.isdir(summary["checkpoint"])
    assert summary["soup_val_metrics"] == {}
    assert len(summary["ingredients_used"]) == summary[
        "n_ingredients_available"
    ]

    # Greedy soup: evaluated on the val split; never below its base
    # ingredient's re-measured val IoU by construction, and the selection
    # record is written next to the checkpoint.
    greedy = soup_experiment(exp_dir, mode="greedy")
    assert greedy["soup_val_iou"] >= greedy["base_val_iou"]
    assert greedy["ingredients_used"][0] == greedy["per_ingredient"][0]["name"]
    with open(os.path.join(greedy["checkpoint"], "soup.json")) as fh:
        assert json.load(fh)["mode"] == "greedy"
    with open(os.path.join(greedy["checkpoint"], "metrics.json")) as fh:
        metrics = json.load(fh)
    assert metrics["val_MulticlassJaccardIndex"] == pytest.approx(
        greedy["soup_val_iou"]
    )

    # The soup must NOT be registered in the retention index (it is a
    # derived artifact, not a training epoch).
    with open(os.path.join(exp_dir, "checkpoints", "index.json")) as fh:
        names = {e["name"] for e in json.load(fh)["entries"]}
    assert "soup-greedy" not in names and "soup-uniform" not in names

    # And it loads through the standard predict restore path.
    from floodplanet_code_tpu.config import load_experiment_config
    from floodplanet_code_tpu.data import (
        build_dataset,
        generate_image_slice_object,
    )
    from floodplanet_code_tpu.inference.predict import load_model_for_eval

    cfg2 = load_experiment_config(exp_dir)
    slice_params = generate_image_slice_object(
        cfg2.crop_height, cfg2.crop_width, cfg2.crop_stride
    )
    dataset = build_dataset(
        cfg2.dataset.name,
        "valid",
        slice_params,
        sensor=cfg2.dataset.sensor,
        channels=cfg2.dataset.channels,
        norm_mode=cfg2.norm_mode,
        eval_region=cfg2.eval_region,
        ignore_index=cfg2.ignore_index,
        seed_num=cfg2.seed_num,
        train_split_pct=cfg2.train_split_pct,
        **(cfg2.dataset.get("dataset_kwargs") or {}),
    )
    model, variables = load_model_for_eval(cfg2, greedy["checkpoint"], dataset)
    example = dataset.load_example(0, output_metadata=False)
    batch = {"image": example["image"][None]}
    logits = model.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
