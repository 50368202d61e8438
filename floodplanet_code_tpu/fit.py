"""CLI training entry point (reference: st_water_seg/fit.py:106-112).

Usage mirrors the reference's Hydra CLI:

    python -m floodplanet_code_tpu.fit [key=value ...]
    python -m floodplanet_code_tpu.fit dataset.sensor=PS eval_region=RegionA \
        crop_height=512 crop_width=512 crop_stride=256 batch_size=32

Group swaps (``model=lf_model``), experiment overlays
(``+experiment=unet_csdap_baseline``) and dotted overrides all work; the
composed config is snapshotted to ``<exp>/hydra/config.yaml``.

Multirun: ``-m``/``--multirun`` sweeps comma-separated override values
through their cartesian product, like Hydra's basic sweeper that the
reference composes (``override hydra/sweeper: basic``, reference
conf/config.yaml:4; ``fit.py -m``):

    python -m floodplanet_code_tpu.fit -m lr=1e-3,1e-4 model=ms_model,lf_model

Jobs run sequentially (the basic sweeper's behavior — and the right one
here: ONE TPU process at a time); each lands in
``multirun/<date>/<name>/<job_num>/``. Bracketed values (``key=[a,b]``)
are lists, not sweeps, matching Hydra's grammar.
"""

from __future__ import annotations

import datetime
import itertools
import os
import sys

from floodplanet_code_tpu.config import compose
from floodplanet_code_tpu.train.fit import fit_model


def _expand_multirun(overrides: list[str]) -> list[list[str]]:
    """Cartesian product of comma-separated override values.

    ``lr=1e-3,1e-4`` contributes two choices; ``regions=[A,B]`` (bracketed)
    and quoted values stay atomic.
    """
    choices_per_key: list[list[str]] = []
    for override in overrides:
        key, _, raw = override.partition("=")
        raw = raw.strip()
        if "," in raw and not raw.startswith(("[", "{", '"', "'")):
            choices_per_key.append([f"{key}={v}" for v in raw.split(",")])
        else:
            choices_per_key.append([override])
    return [list(combo) for combo in itertools.product(*choices_per_key)]


def main(argv: list[str] | None = None) -> str:
    argv = list(sys.argv[1:] if argv is None else argv)
    multirun = False
    for flag in ("-m", "--multirun"):
        while flag in argv:
            argv.remove(flag)
            multirun = True

    if not multirun:
        cfg = compose(overrides=argv)
        best = fit_model(cfg)
        print(f"Best checkpoint: {best}")
        return best

    jobs = _expand_multirun(argv)
    date = datetime.date.today().isoformat()
    best = ""
    for job_num, job_overrides in enumerate(jobs):
        cfg = compose(overrides=job_overrides)
        name = cfg.select("run.name", "default")
        exp_dir = os.path.join("multirun", date, str(name), str(job_num))
        print(f"[multirun] job {job_num}/{len(jobs) - 1}: "
              + " ".join(job_overrides))
        best = fit_model(cfg, overwrite_exp_dir=exp_dir)
        print(f"[multirun] job {job_num} best checkpoint: {best}")
    return best


if __name__ == "__main__":
    main()
