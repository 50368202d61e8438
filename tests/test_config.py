"""Config composition tests (floodplanet_code_tpu/config)."""

import pytest

from floodplanet_code_tpu.config import (
    Config,
    compose,
    load_experiment_config,
    save_config,
)

pytestmark = pytest.mark.smoke  # sub-minute tier: pure functions, no jit-heavy fits


class TestConfigObject:
    def test_attribute_access(self):
        cfg = Config({"a": {"b": 1}})
        assert cfg.a.b == 1
        cfg.a.c = 2
        assert cfg["a"]["c"] == 2

    def test_merge(self):
        cfg = Config({"a": {"b": 1, "c": 2}})
        cfg.merge({"a": {"b": 9}, "d": 3})
        assert cfg.a.b == 9 and cfg.a.c == 2 and cfg.d == 3

    def test_dotted(self):
        cfg = Config()
        cfg.set_dotted("x.y.z", 5)
        assert cfg.select("x.y.z") == 5
        assert cfg.select("x.missing", "dflt") == "dflt"

    def test_yaml_roundtrip(self):
        cfg = Config({"a": 1, "b": {"c": None}})
        import yaml

        data = yaml.safe_load(cfg.to_yaml())
        assert data == {"a": 1, "b": {"c": None}}


class TestCompose:
    def test_defaults_resolved(self):
        cfg = compose()
        # Same key surface as the reference conf/config.yaml.
        assert cfg.dataset.name == "floodplanet"
        assert cfg.model.name == "ef_model"
        assert cfg.crop_height == 300
        assert cfg.crop_stride == 150
        assert cfg.ignore_index == 0
        assert cfg.transforms.hflip.likelihood == 0.5
        assert cfg.norm_mode is None

    def test_group_swap(self):
        cfg = compose(overrides=["model=lf_model"])
        assert cfg.model.name == "lf_model"
        assert cfg.model.model_kwargs.feat_fusion == "concat_conv"

    def test_dotted_overrides(self):
        cfg = compose(
            overrides=[
                "crop_height=512",
                "lr=3e-4",
                "eval_region=[RegionA,RegionB]",
                "norm_mode=local",
                "dataset.sensor=PS",
            ]
        )
        assert cfg.crop_height == 512
        assert cfg.lr == pytest.approx(3e-4)
        assert cfg.eval_region == ["RegionA", "RegionB"]
        assert cfg.norm_mode == "local"
        assert cfg.dataset.sensor == "PS"

    def test_null_override(self):
        cfg = compose(overrides=["eval_region=null"])
        assert cfg.eval_region is None

    def test_experiment_overlay(self):
        cfg = compose(overrides=["+experiment=unet_csdap_baseline"])
        assert cfg.lr == pytest.approx(1e-7)

    def test_unknown_group_file(self):
        with pytest.raises(FileNotFoundError):
            compose(overrides=["model=nope"])

    def test_malformed_override(self):
        with pytest.raises(ValueError):
            compose(overrides=["justakey"])


class TestSnapshot:
    def test_save_and_rediscover(self, tmp_path):
        cfg = compose(overrides=["crop_height=64"])
        exp_dir = str(tmp_path / "exp")
        path = save_config(cfg, exp_dir)
        assert path.endswith("hydra/config.yaml")
        back = load_experiment_config(exp_dir)
        assert back.crop_height == 64
        assert back.dataset.name == "floodplanet"

    def test_missing_snapshot(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_experiment_config(str(tmp_path))
