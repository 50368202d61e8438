"""Import a reference (torch / PyTorch-Lightning) checkpoint.

The reference framework publishes its trained models as Lightning ``.ckpt``
files whose ``state_dict`` holds the torch UNet weights
(``model.inc.double_conv...``, see /root/reference/st_water_seg/models/
unet.py:80-99 for the module tree and water_seg_model.py:14-44 for the
Lightning wrapper). This tool maps that state_dict onto the flax
params/batch_stats pytrees and writes a COMPLETE experiment directory —
hydra config snapshot, orbax checkpoint, metrics.json/index.json side
files — so ``predict`` / ``infer`` / ``batch_infer`` run on an imported
model exactly as on a natively trained one. This is the migration path
for reference users: bring your trained checkpoints, keep your results.

Weight-mapping notes:
- torch Conv2d kernels are OIHW; flax wants HWIO -> ``transpose(2,3,1,0)``.
- The torch 3x3 convs carry biases; ours are bias-free (BN follows
  immediately). A conv bias ``b`` shifts BN's input by a constant, so it
  folds exactly into the BN running mean (``mean' = running_mean - b``)
  for eval, and is absorbed by freshly computed batch statistics if the
  imported model is trained further (the only loss is the bias as a
  separate degree of freedom going forward).
- torch upsampling is ``nn.Upsample(align_corners=True)`` (reference
  unet.py:43-45); the written config pins
  ``model.model_kwargs.align_corners=true`` so the rebuilt flax model
  reproduces it (models/unet.py ``_upsample2x``).

Usage:
    python -m floodplanet_code_tpu.tools.import_torch_checkpoint \
        path/to/model-epoch=05-val_MulticlassJaccardIndex=0.6077.ckpt \
        --exp_dir outputs/imported_bgd --sensor S1 --eval_region Bangladesh
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np

# torch block prefix -> flax module path, in reference layer order.
_BLOCKS = [
    ("inc.double_conv", "encoder/DoubleConv_0"),
    ("down1.maxpool_conv.1.double_conv", "encoder/Down_0/DoubleConv_0"),
    ("down2.maxpool_conv.1.double_conv", "encoder/Down_1/DoubleConv_0"),
    ("down3.maxpool_conv.1.double_conv", "encoder/Down_2/DoubleConv_0"),
    ("down4.maxpool_conv.1.double_conv", "encoder/Down_3/DoubleConv_0"),
    ("up1.conv.double_conv", "decoder/Up_0/DoubleConv_0"),
    ("up2.conv.double_conv", "decoder/Up_1/DoubleConv_0"),
    ("up3.conv.double_conv", "decoder/Up_2/DoubleConv_0"),
    ("up4.conv.double_conv", "decoder/Up_3/DoubleConv_0"),
]
# Within a torch DoubleConv Sequential: [0]=conv, [1]=bn, [3]=conv, [4]=bn.
_PAIRS = [("0", "1", "Conv_0", "BatchNorm_0"), ("3", "4", "Conv_1", "BatchNorm_1")]


def load_state_dict(ckpt_path: str) -> dict:
    """Raw torch state_dict from a Lightning .ckpt or a bare torch save."""
    import torch

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state.items()}


def convert_unet_state_dict(
    state: dict, root: str = "UNet_0"
) -> tuple[dict, dict, int, int]:
    """torch UNet state_dict -> (params, batch_stats, in_channels, n_classes).

    Accepts keys with or without the Lightning wrapper's ``model.`` prefix.
    """
    prefix = "model." if any(k.startswith("model.") for k in state) else ""

    def get(key: str) -> np.ndarray:
        try:
            return state[prefix + key]
        except KeyError:
            raise KeyError(
                f'checkpoint key "{prefix + key}" not found — is this a '
                "reference WaterSegmentationModel/UNet checkpoint?"
            )

    def setpath(tree: dict, path: str, value: np.ndarray) -> None:
        parts = (root + "/" + path).split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value.astype(np.float32)

    params: dict = {}
    stats: dict = {}
    for tprefix, fprefix in _BLOCKS:
        for conv_i, bn_i, conv_name, bn_name in _PAIRS:
            kernel = get(f"{tprefix}.{conv_i}.weight")  # OIHW
            conv_bias = get(f"{tprefix}.{conv_i}.bias")
            setpath(
                params, f"{fprefix}/{conv_name}/kernel",
                kernel.transpose(2, 3, 1, 0),
            )
            setpath(params, f"{fprefix}/{bn_name}/scale",
                    get(f"{tprefix}.{bn_i}.weight"))
            setpath(params, f"{fprefix}/{bn_name}/bias",
                    get(f"{tprefix}.{bn_i}.bias"))
            # Fold the conv bias into the BN running mean (see module doc).
            setpath(stats, f"{fprefix}/{bn_name}/mean",
                    get(f"{tprefix}.{bn_i}.running_mean") - conv_bias)
            setpath(stats, f"{fprefix}/{bn_name}/var",
                    get(f"{tprefix}.{bn_i}.running_var"))

    out_kernel = get("outc.conv.weight")  # [n_classes, 64, 1, 1]
    setpath(params, "decoder/Conv_0/kernel", out_kernel.transpose(2, 3, 1, 0))
    setpath(params, "decoder/Conv_0/bias", get("outc.conv.bias"))

    in_channels = int(state[prefix + "inc.double_conv.0.weight"].shape[1])
    n_classes = int(out_kernel.shape[0])
    return params, stats, in_channels, n_classes


def import_checkpoint(
    ckpt_path: str,
    exp_dir: str,
    sensor: str = "S1",
    eval_region: str | None = None,
    model_name: str = "ef_model",
    overrides: list[str] | None = None,
) -> str:
    """Write a full experiment dir from a torch checkpoint; returns the
    orbax checkpoint path (feed it to the predict/infer CLIs)."""
    import jax.numpy as jnp

    from floodplanet_code_tpu.config import compose, save_config
    from floodplanet_code_tpu.models import build_model
    from floodplanet_code_tpu.train.checkpoint import CheckpointManager
    from floodplanet_code_tpu.train.state import create_train_state

    state_dict = load_state_dict(ckpt_path)
    params, stats, in_channels, n_classes = convert_unet_state_dict(state_dict)

    cfg = compose(
        overrides=[
            f"dataset.sensor={sensor}",
            f"model={model_name}",
            *([f"eval_region={eval_region}"] if eval_region else []),
            *(overrides or []),
        ]
    )
    # Pin the torch upsampling convention for every later rebuild.
    kwargs = dict(cfg.model.get("model_kwargs") or {})
    kwargs["align_corners"] = True
    cfg.model["model_kwargs"] = kwargs

    model = build_model(
        model_name,
        {"ms_image": in_channels},
        n_classes,
        dtype=jnp.float32,
        align_corners=True,
    )
    example = {"image": np.zeros((1, 64, 64, in_channels), np.float32)}
    state = create_train_state(
        model, example, lr=cfg.lr, optimizer_name=cfg.optimizer
    )

    import jax

    expect = jax.tree.map(lambda x: tuple(x.shape), state.params)
    got = jax.tree.map(lambda x: tuple(x.shape), params)
    if expect != got:
        raise ValueError(
            "converted parameter tree does not match the model's: "
            f"expected {expect}\ngot {got}"
        )
    state = state.replace(
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, stats),
    )

    os.makedirs(exp_dir, exist_ok=True)
    save_config(cfg, exp_dir)
    # Carry the source checkpoint's epoch/metric through to our filename.
    m = re.search(r"epoch=(\d+)", os.path.basename(ckpt_path))
    epoch = int(m.group(1)) if m else 0
    m = re.search(r"=(\d*\.\d+)", os.path.basename(ckpt_path))
    metric = float(m.group(1)) if m else 0.0
    manager = CheckpointManager(exp_dir, save_top_k=1)
    path = manager.save(
        state,
        epoch,
        {
            "val_MulticlassJaccardIndex": metric,
            "imported_from": os.path.abspath(ckpt_path),
        },
    )
    print(f"imported: {path}")
    return path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ckpt_path")
    parser.add_argument("--exp_dir", required=True)
    parser.add_argument("--sensor", default="S1")
    parser.add_argument("--eval_region", default=None)
    parser.add_argument("--model", default="ef_model")
    parser.add_argument(
        "--override", action="append", default=[], help="extra cfg overrides"
    )
    args = parser.parse_args(argv)
    import_checkpoint(
        args.ckpt_path,
        args.exp_dir,
        sensor=args.sensor,
        eval_region=args.eval_region,
        model_name=args.model,
        overrides=args.override,
    )


if __name__ == "__main__":
    main()
