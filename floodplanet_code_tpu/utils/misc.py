"""Misc utilities: config snapshot save/load.

Reference: st_water_seg/utils/utils_misc.py:4-11 (the stub/dead functions at
:13-26 are intentionally not reproduced — SURVEY.md §7.8).
"""

from __future__ import annotations

from floodplanet_code_tpu.config.core import Config, load_yaml


def save_config(cfg: Config, save_path: str) -> None:
    with open(save_path, "w") as handle:
        handle.write(cfg.to_yaml())


def load_config(load_path: str) -> Config:
    return load_yaml(load_path)
