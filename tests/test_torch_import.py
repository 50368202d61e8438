"""Torch-checkpoint importer (tools/import_torch_checkpoint.py).

CI-side validation uses a state_dict built programmatically from the known
reference schema plus a block-level torch oracle (conv->bn->relu twice,
built inline from torch primitives). The full-model golden run against the
actual reference torch UNet was done offline on real reference code:
max abs err 1.0e-7, argmax agreement 1.0 (see the tool's docstring).
"""

import numpy as np
import pytest
import torch

from floodplanet_code_tpu.tools.import_torch_checkpoint import (
    _BLOCKS,
    _PAIRS,
    convert_unet_state_dict,
    load_state_dict,
)

# Per-block (in_ch, mid_ch, out_ch) for the reference UNet at base width 64
# with bilinear=True (reference unet.py:80-99).
_BLOCK_CHANNELS = [
    (4, 64, 64),        # inc
    (64, 128, 128),     # down1
    (128, 256, 256),    # down2
    (256, 512, 512),    # down3
    (512, 512, 512),    # down4 (1024 // factor)
    (1024, 512, 256),   # up1: DoubleConv(in, out, in//2)
    (512, 256, 128),    # up2
    (256, 128, 64),     # up3
    (128, 64, 64),      # up4
]


def build_reference_state_dict(rng, in_channels=4, n_classes=3):
    """Random-valued state_dict with the reference's exact key schema."""
    state = {}
    blocks = [(p, *_BLOCK_CHANNELS[i]) for i, (p, _) in enumerate(_BLOCKS)]
    blocks[0] = (blocks[0][0], in_channels, 64, 64)
    for tprefix, cin, cmid, cout in blocks:
        for (conv_i, bn_i, _, _), (ci, co) in zip(
            _PAIRS, [(cin, cmid), (cmid, cout)]
        ):
            state[f"model.{tprefix}.{conv_i}.weight"] = rng.standard_normal(
                (co, ci, 3, 3)
            ).astype(np.float32) * 0.1
            state[f"model.{tprefix}.{conv_i}.bias"] = rng.standard_normal(
                (co,)
            ).astype(np.float32)
            state[f"model.{tprefix}.{bn_i}.weight"] = rng.uniform(
                0.5, 1.5, (co,)
            ).astype(np.float32)
            state[f"model.{tprefix}.{bn_i}.bias"] = rng.standard_normal(
                (co,)
            ).astype(np.float32)
            state[f"model.{tprefix}.{bn_i}.running_mean"] = rng.standard_normal(
                (co,)
            ).astype(np.float32)
            state[f"model.{tprefix}.{bn_i}.running_var"] = rng.uniform(
                0.5, 1.5, (co,)
            ).astype(np.float32)
            state[f"model.{tprefix}.{bn_i}.num_batches_tracked"] = np.asarray(
                7, np.int64
            )
    state["model.outc.conv.weight"] = rng.standard_normal(
        (n_classes, 64, 1, 1)
    ).astype(np.float32) * 0.1
    state["model.outc.conv.bias"] = rng.standard_normal(
        (n_classes,)
    ).astype(np.float32)
    return state


def test_converted_tree_matches_model_init():
    import jax
    import jax.numpy as jnp

    from floodplanet_code_tpu.models import build_model

    rng = np.random.default_rng(0)
    state_dict = build_reference_state_dict(rng)
    params, stats, cin, ncls = convert_unet_state_dict(state_dict)
    assert (cin, ncls) == (4, 3)

    model = build_model("ef_model", {"ms_image": 4}, 3)
    variables = model.init(
        jax.random.key(0), {"image": jnp.zeros((1, 32, 32, 4))}
    )
    want_p = jax.tree.map(lambda x: tuple(x.shape), variables["params"])
    got_p = jax.tree.map(lambda x: tuple(x.shape), params)
    assert jax.tree.structure(want_p) == jax.tree.structure(got_p)
    assert want_p == got_p
    want_s = jax.tree.map(lambda x: tuple(x.shape), variables["batch_stats"])
    got_s = jax.tree.map(lambda x: tuple(x.shape), stats)
    assert want_s == got_s


def test_double_conv_block_matches_torch_oracle():
    """conv(bias)->bn->relu twice, torch eval vs converted flax DoubleConv.

    Validates the OIHW->HWIO transpose, the conv-bias -> running-mean fold,
    and the BN epsilon/affine semantics at the block level.
    """
    import jax.numpy as jnp

    from floodplanet_code_tpu.models.unet import DoubleConv

    torch.manual_seed(1)
    block = torch.nn.Sequential(
        torch.nn.Conv2d(5, 8, 3, padding=1),
        torch.nn.BatchNorm2d(8),
        torch.nn.ReLU(),
        torch.nn.Conv2d(8, 6, 3, padding=1),
        torch.nn.BatchNorm2d(6),
        torch.nn.ReLU(),
    )
    block.eval()
    for m in block.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    x = np.random.default_rng(2).standard_normal((2, 5, 16, 16)).astype(
        np.float32
    )
    with torch.no_grad():
        want = block(torch.from_numpy(x)).numpy()

    def conv_params(conv, bn):
        return (
            np.asarray(conv.weight.detach()).transpose(2, 3, 1, 0),
            np.asarray(bn.weight.detach()),
            np.asarray(bn.bias.detach()),
            np.asarray(bn.running_mean.detach())
            - np.asarray(conv.bias.detach()),
            np.asarray(bn.running_var.detach()),
        )

    k0, s0, b0, m0, v0 = conv_params(block[0], block[1])
    k1, s1, b1, m1, v1 = conv_params(block[3], block[4])
    variables = {
        "params": {
            "Conv_0": {"kernel": jnp.asarray(k0)},
            "BatchNorm_0": {"scale": jnp.asarray(s0), "bias": jnp.asarray(b0)},
            "Conv_1": {"kernel": jnp.asarray(k1)},
            "BatchNorm_1": {"scale": jnp.asarray(s1), "bias": jnp.asarray(b1)},
        },
        "batch_stats": {
            "BatchNorm_0": {"mean": jnp.asarray(m0), "var": jnp.asarray(v0)},
            "BatchNorm_1": {"mean": jnp.asarray(m1), "var": jnp.asarray(v1)},
        },
    }
    model = DoubleConv(out_channels=6, mid_channels=8)
    got = np.asarray(
        model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_align_corners_upsample_matches_torch():
    from floodplanet_code_tpu.models.unet import _upsample2x
    import jax.numpy as jnp

    x = np.random.default_rng(3).standard_normal((2, 7, 9, 3)).astype(
        np.float32
    )
    want = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            scale_factor=2,
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(_upsample2x(jnp.asarray(x), align_corners=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow  # >80s on a contended 1-core box; sibling tests cover the surface in the fast lane
def test_end_to_end_import_cli(tmp_path):
    """Fake Lightning ckpt -> import_checkpoint -> restorable via orbax."""
    import jax
    import jax.numpy as jnp

    from floodplanet_code_tpu.inference.predict import load_experiment_config
    from floodplanet_code_tpu.models import build_model
    from floodplanet_code_tpu.tools.import_torch_checkpoint import (
        import_checkpoint,
    )
    from floodplanet_code_tpu.train.checkpoint import CheckpointManager
    from floodplanet_code_tpu.train.state import create_train_state

    rng = np.random.default_rng(4)
    state_dict = build_reference_state_dict(rng)
    ckpt = tmp_path / "model-epoch=05-val_MulticlassJaccardIndex=0.6077.ckpt"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.array(v)) for k, v in
                        state_dict.items()}},
        str(ckpt),
    )

    exp_dir = tmp_path / "imported"
    path = import_checkpoint(str(ckpt), str(exp_dir), sensor="PS")
    assert "epoch=05" in path and "0.6077" in path

    cfg = load_experiment_config(str(exp_dir))
    assert cfg.model.model_kwargs["align_corners"] is True

    model = build_model(
        "ef_model", {"ms_image": 4}, 3, align_corners=True
    )
    example = {"image": np.zeros((1, 32, 32, 4), np.float32)}
    template = create_train_state(model, example, lr=1e-4)
    manager = CheckpointManager(str(exp_dir))
    state = manager.restore(path, template)
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        {"image": jnp.ones((1, 32, 32, 4))},
        train=False,
    )
    assert np.isfinite(np.asarray(logits)).all()


# ---------------------------------------------------------------------------
# Late-fusion importer (reference lf_model.py:31-45).
# ---------------------------------------------------------------------------


class _TorchDoubleConv(torch.nn.Module):
    """Key schema: <name>.double_conv.{0,1,3,4} (reference unet.py:6-20)."""

    def __init__(self, cin, cmid, cout):
        super().__init__()
        self.double_conv = torch.nn.Sequential(
            torch.nn.Conv2d(cin, cmid, 3, padding=1),
            torch.nn.BatchNorm2d(cmid),
            torch.nn.ReLU(),
            torch.nn.Conv2d(cmid, cout, 3, padding=1),
            torch.nn.BatchNorm2d(cout),
            torch.nn.ReLU(),
        )

    def forward(self, x):
        return self.double_conv(x)


class _TorchDown(torch.nn.Module):
    """Key schema: <name>.maxpool_conv.1.double_conv (unet.py:23-32)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.maxpool_conv = torch.nn.Sequential(
            torch.nn.MaxPool2d(2), _TorchDoubleConv(cin, cout, cout)
        )

    def forward(self, x):
        return self.maxpool_conv(x)


class _TorchEncoder(torch.nn.Module):
    """Reference UNetEncoder contract (unet.py:134-159), inline oracle."""

    def __init__(self, n_channels):
        super().__init__()
        self.inc = _TorchDoubleConv(n_channels, 64, 64)
        for i, (ci, co) in enumerate(
            [(64, 128), (128, 256), (256, 512), (512, 512)]
        ):
            setattr(self, f"down{i + 1}", _TorchDown(ci, co))

    def forward(self, x):
        feats = [self.inc(x)]
        for i in range(1, 5):
            feats.append(getattr(self, f"down{i}")(feats[-1]))
        return feats


class _TorchUp(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.up = torch.nn.Upsample(
            scale_factor=2, mode="bilinear", align_corners=True
        )
        self.conv = _TorchDoubleConv(cin, cin // 2, cout)

    def forward(self, x1, x2):
        x1 = self.up(x1)
        return self.conv(torch.cat([x2, x1], dim=1))


class _TorchDecoder(torch.nn.Module):
    """Reference UNetDecoder contract (unet.py:162-201), inline oracle."""

    def __init__(self, n_classes):
        super().__init__()
        self.up1 = _TorchUp(1024, 256)
        self.up2 = _TorchUp(512, 128)
        self.up3 = _TorchUp(256, 64)
        self.up4 = _TorchUp(128, 64)
        self.outc = torch.nn.Sequential()
        self.outc.conv = torch.nn.Conv2d(64, n_classes, 1)

    def forward(self, feats):
        x1, x2, x3, x4, x5 = feats
        x = self.up1(x5, x4)
        x = self.up2(x, x3)
        x = self.up3(x, x2)
        x = self.up4(x, x1)
        return self.outc.conv(x)


class _TorchLF(torch.nn.Module):
    """Reference LateFusionModel contract (lf_model.py:29-92), inline."""

    def __init__(self, in_channels: dict, n_classes: int):
        super().__init__()
        self.encoders = torch.nn.ModuleDict(
            {k: _TorchEncoder(c) for k, c in in_channels.items()}
        )
        self.decoder = _TorchDecoder(n_classes)
        self.concat_convs = torch.nn.ModuleList(
            [
                torch.nn.Conv2d(fs * len(in_channels), fs, 1, 1)
                for fs in [64, 128, 256, 512, 512]
            ]
        )

    def forward(self, batch):
        feats = self.encoders["ms_image"](batch["image"])
        for name, enc in self.encoders.items():
            if name == "ms_image":
                continue
            extra = enc(batch[name])
            feats = [torch.cat([a, b], dim=1) for a, b in zip(feats, extra)]
        fused = [cc(f) for cc, f in zip(self.concat_convs, feats)]
        return self.decoder(fused)


def _randomize_bn(module, rng):
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)


def test_lf_import_forward_parity():
    """Full late-fusion forward: torch oracle (eval) vs imported flax model."""
    import jax
    import jax.numpy as jnp

    from floodplanet_code_tpu.models import build_model
    from floodplanet_code_tpu.tools.import_torch_checkpoint import (
        convert_lf_state_dict,
    )

    torch.manual_seed(7)
    in_channels = {"ms_image": 4, "dem": 1}
    oracle = _TorchLF(in_channels, 3)
    _randomize_bn(oracle, None)
    oracle.eval()

    state = {k: np.asarray(v.detach()) for k, v in oracle.state_dict().items()}
    params, stats, got_in, n_classes = convert_lf_state_dict(state)
    assert got_in == in_channels and n_classes == 3

    model = build_model(
        "lf_model", got_in, n_classes, dtype=jnp.float32, align_corners=True
    )
    rng = np.random.default_rng(11)
    batch_np = {
        "image": rng.standard_normal((2, 4, 32, 32)).astype(np.float32),
        "dem": rng.standard_normal((2, 1, 32, 32)).astype(np.float32),
    }
    with torch.no_grad():
        want = oracle(
            {k: torch.from_numpy(v) for k, v in batch_np.items()}
        ).numpy()

    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    got = np.asarray(
        model.apply(
            variables,
            {k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in batch_np.items()},
            train=False,
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert (got.argmax(1) == want.argmax(1)).mean() > 0.999
