"""Multirun sweep surface (reference: Hydra basic sweeper, ``fit.py -m``;
conf/config.yaml:4 ``override hydra/sweeper: basic``)."""

import os

import pytest

from floodplanet_code_tpu.fit import _expand_multirun, main as fit_main
from tests.conftest import make_synthetic_csdap


class TestExpand:
    def test_single_sweep_key(self):
        jobs = _expand_multirun(["lr=1e-3,1e-4", "n_epochs=1"])
        assert jobs == [
            ["lr=1e-3", "n_epochs=1"],
            ["lr=1e-4", "n_epochs=1"],
        ]

    def test_cartesian_product(self):
        jobs = _expand_multirun(["a=1,2", "b=x,y"])
        assert len(jobs) == 4
        assert ["a=2", "b=x"] in jobs

    def test_bracketed_list_not_swept(self):
        jobs = _expand_multirun(["regions=[A,B]", "lr=1e-3"])
        assert jobs == [["regions=[A,B]", "lr=1e-3"]]

    def test_no_sweep_is_one_job(self):
        assert _expand_multirun(["a=1", "b=2"]) == [["a=1", "b=2"]]


@pytest.mark.slow
def test_multirun_e2e(tmp_path, monkeypatch):
    root = make_synthetic_csdap(
        str(tmp_path / "data"),
        regions=("RegionA", "RegionB"),
        sensors=("S1",),
        scenes_per_region=2,
        scene_hw=(64, 64),
    )
    monkeypatch.chdir(tmp_path)
    best = fit_main([
        "-m",
        "lr=1e-3,1e-2",
        "dataset.sensor=S1",
        f"dataset.dataset_kwargs.root_dir={root}",
        "eval_region=RegionA",
        "crop_height=32",
        "crop_width=32",
        "crop_stride=32",
        "batch_size=8",
        "n_epochs=1",
        "n_workers=2",
        "limit_train_batches=2",
        "limit_val_batches=2",
        "tpu.compute_dtype=float32",
        "transforms.rotate.active=false",
    ])
    assert best and os.path.exists(best)
    # Two sequential jobs, each in its own multirun/<date>/<name>/<job> dir.
    dates = os.listdir(tmp_path / "multirun")
    assert len(dates) == 1
    names = os.listdir(tmp_path / "multirun" / dates[0])
    assert len(names) == 1
    jobs = sorted(os.listdir(tmp_path / "multirun" / dates[0] / names[0]))
    assert jobs == ["0", "1"]
    for job in jobs:
        job_dir = tmp_path / "multirun" / dates[0] / names[0] / job
        assert (job_dir / "hydra" / "config.yaml").exists()
