"""CLI training entry point (reference: st_water_seg/fit.py:106-112).

Usage mirrors the reference's Hydra CLI:

    python -m floodplanet_code_tpu.fit [key=value ...]
    python -m floodplanet_code_tpu.fit dataset.sensor=PS eval_region=RegionA \
        crop_height=512 crop_width=512 crop_stride=256 batch_size=32

Group swaps (``model=lf_model``), experiment overlays
(``+experiment=unet_csdap_baseline``) and dotted overrides all work; the
composed config is snapshotted to ``<exp>/hydra/config.yaml``.
"""

from __future__ import annotations

import sys

from floodplanet_code_tpu.config import compose
from floodplanet_code_tpu.train.fit import fit_model


def main(argv: list[str] | None = None) -> str:
    argv = sys.argv[1:] if argv is None else argv
    cfg = compose(overrides=argv)
    best = fit_model(cfg)
    print(f"Best checkpoint: {best}")
    return best


if __name__ == "__main__":
    main()
