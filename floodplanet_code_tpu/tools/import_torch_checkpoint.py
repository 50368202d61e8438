"""Import a reference (torch / PyTorch-Lightning) checkpoint.

The reference framework publishes its trained models as Lightning ``.ckpt``
files whose ``state_dict`` holds the torch UNet weights
(``model.inc.double_conv...``, see /root/reference/st_water_seg/models/
unet.py:80-99 for the module tree and water_seg_model.py:14-44 for the
Lightning wrapper). Late-fusion checkpoints (``encoders.<modality>...``
ModuleDict + ``concat_convs`` + ``decoder``, lf_model.py:31-45) are
auto-detected and mapped onto the flax LateFusionModel. This tool maps
the state_dict onto the flax params/batch_stats pytrees and writes a
COMPLETE experiment directory —
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
_ENC_BLOCKS = [
    ("inc.double_conv", "DoubleConv_0"),
    ("down1.maxpool_conv.1.double_conv", "Down_0/DoubleConv_0"),
    ("down2.maxpool_conv.1.double_conv", "Down_1/DoubleConv_0"),
    ("down3.maxpool_conv.1.double_conv", "Down_2/DoubleConv_0"),
    ("down4.maxpool_conv.1.double_conv", "Down_3/DoubleConv_0"),
]
_DEC_BLOCKS = [
    ("up1.conv.double_conv", "Up_0/DoubleConv_0"),
    ("up2.conv.double_conv", "Up_1/DoubleConv_0"),
    ("up3.conv.double_conv", "Up_2/DoubleConv_0"),
    ("up4.conv.double_conv", "Up_3/DoubleConv_0"),
]
_BLOCKS = [(t, "encoder/" + f) for t, f in _ENC_BLOCKS] + [
    (t, "decoder/" + f) for t, f in _DEC_BLOCKS
]
# Within a torch DoubleConv Sequential: [0]=conv, [1]=bn, [3]=conv, [4]=bn.
_PAIRS = [("0", "1", "Conv_0", "BatchNorm_0"), ("3", "4", "Conv_1", "BatchNorm_1")]


def load_state_dict(ckpt_path: str) -> dict:
    """Raw torch state_dict from a Lightning .ckpt or a bare torch save."""
    import torch

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state.items()}


def _setpath(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value.astype(np.float32)


def _make_get(state: dict, what: str):
    prefix = "model." if any(k.startswith("model.") for k in state) else ""

    def get(key: str) -> np.ndarray:
        try:
            return state[prefix + key]
        except KeyError:
            raise KeyError(
                f'checkpoint key "{prefix + key}" not found — is this a '
                f"reference {what} checkpoint?"
            )

    return get, prefix


def _convert_double_conv(get, params, stats, tprefix, fprefix) -> None:
    """One torch DoubleConv Sequential -> flax DoubleConv params/stats."""
    for conv_i, bn_i, conv_name, bn_name in _PAIRS:
        kernel = get(f"{tprefix}.{conv_i}.weight")  # OIHW
        conv_bias = get(f"{tprefix}.{conv_i}.bias")
        _setpath(
            params, f"{fprefix}/{conv_name}/kernel",
            kernel.transpose(2, 3, 1, 0),
        )
        _setpath(params, f"{fprefix}/{bn_name}/scale",
                 get(f"{tprefix}.{bn_i}.weight"))
        _setpath(params, f"{fprefix}/{bn_name}/bias",
                 get(f"{tprefix}.{bn_i}.bias"))
        # Fold the conv bias into the BN running mean (see module doc).
        _setpath(stats, f"{fprefix}/{bn_name}/mean",
                 get(f"{tprefix}.{bn_i}.running_mean") - conv_bias)
        _setpath(stats, f"{fprefix}/{bn_name}/var",
                 get(f"{tprefix}.{bn_i}.running_var"))


def convert_unet_state_dict(
    state: dict, root: str = "UNet_0"
) -> tuple[dict, dict, int, int]:
    """torch UNet state_dict -> (params, batch_stats, in_channels, n_classes).

    Accepts keys with or without the Lightning wrapper's ``model.`` prefix.
    """
    get, prefix = _make_get(state, "WaterSegmentationModel/UNet")

    params: dict = {}
    stats: dict = {}
    for tprefix, fprefix in _BLOCKS:
        _convert_double_conv(get, params, stats, tprefix, f"{root}/{fprefix}")

    out_kernel = get("outc.conv.weight")  # [n_classes, 64, 1, 1]
    _setpath(params, f"{root}/decoder/Conv_0/kernel",
             out_kernel.transpose(2, 3, 1, 0))
    _setpath(params, f"{root}/decoder/Conv_0/bias", get("outc.conv.bias"))

    in_channels = int(state[prefix + "inc.double_conv.0.weight"].shape[1])
    n_classes = int(out_kernel.shape[0])
    return params, stats, in_channels, n_classes


def convert_lf_state_dict(state: dict) -> tuple[dict, dict, dict, int]:
    """torch LateFusionModel state_dict -> (params, batch_stats,
    in_channels_dict, n_classes).

    Reference module tree (lf_model.py:31-45): ``encoders.<modality>``
    ModuleDict of UNetEncoders, ``concat_convs.<i>`` 1x1 fuse convs,
    ``decoder`` UNetDecoder. The flax tree (models/water_seg.py
    LateFusionModel) maps modality-for-modality; concat channel order is
    ms_image first then AUX_FEATURE_KEYS order, exactly the reference's
    forward() concatenation order (lf_model.py:59-83).
    """
    from floodplanet_code_tpu.models.water_seg import AUX_FEATURE_KEYS

    get, prefix = _make_get(state, "LateFusionModel")

    present = {
        k[len(prefix) + len("encoders."):].split(".")[0]
        for k in state
        if k.startswith(prefix + "encoders.")
    }
    modalities = [
        m for m in ("ms_image", *AUX_FEATURE_KEYS) if m in present
    ]
    unknown = present - set(modalities)
    if unknown:
        raise KeyError(f"unrecognized late-fusion modalities: {sorted(unknown)}")

    params: dict = {}
    stats: dict = {}
    in_channels: dict = {}
    for mod in modalities:
        for tprefix, fprefix in _ENC_BLOCKS:
            _convert_double_conv(
                get, params, stats,
                f"encoders.{mod}.{tprefix}", f"encoder_{mod}/{fprefix}",
            )
        in_channels[mod] = int(
            get(f"encoders.{mod}.inc.double_conv.0.weight").shape[1]
        )

    n_fuse = len([
        k for k in state
        if k.startswith(prefix + "concat_convs.") and k.endswith(".weight")
    ])
    for i in range(n_fuse):
        w = get(f"concat_convs.{i}.weight")  # [out, in, 1, 1]
        _setpath(params, f"concat_conv_{i}/kernel", w.transpose(2, 3, 1, 0))
        _setpath(params, f"concat_conv_{i}/bias", get(f"concat_convs.{i}.bias"))

    for tprefix, fprefix in _DEC_BLOCKS:
        _convert_double_conv(
            get, params, stats, f"decoder.{tprefix}", f"UNetDecoder_0/{fprefix}"
        )
    out_kernel = get("decoder.outc.conv.weight")
    _setpath(params, "UNetDecoder_0/Conv_0/kernel",
             out_kernel.transpose(2, 3, 1, 0))
    _setpath(params, "UNetDecoder_0/Conv_0/bias", get("decoder.outc.conv.bias"))

    return params, stats, in_channels, int(out_kernel.shape[0])


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
    is_lf = any(
        k.split("model.", 1)[-1].startswith("encoders.") for k in state_dict
    )
    if is_lf:
        params, stats, in_channels_dict, n_classes = convert_lf_state_dict(
            state_dict
        )
        model_name = "lf_model"
    else:
        params, stats, in_channels, n_classes = convert_unet_state_dict(
            state_dict
        )
        in_channels_dict = {"ms_image": in_channels}

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
        in_channels_dict,
        n_classes,
        dtype=jnp.float32,
        align_corners=True,
    )
    example = {
        "image": np.zeros(
            (1, 64, 64, in_channels_dict["ms_image"]), np.float32
        )
    }
    for mod, c in in_channels_dict.items():
        if mod != "ms_image":
            example[mod] = np.zeros((1, 64, 64, c), np.float32)
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
