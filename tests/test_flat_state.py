"""Flat-packed train state (train/flat.py) vs the nested-pytree step.

The flat step must be numerically identical (same XLA math, different
packing) to make_train_step for every supported optimizer, and the
flatten/unflatten round-trip must reproduce the nested TrainState exactly
— that is what keeps orbax checkpoints interoperable between the two
paths.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from floodplanet_code_tpu.data.augment import TransformParams
from floodplanet_code_tpu.models import build_model
from floodplanet_code_tpu.train.fit import make_train_step
from floodplanet_code_tpu.train.flat import (
    flatten_train_state,
    make_flat_train_step,
    unflatten_train_state,
)
from floodplanet_code_tpu.train.state import create_train_state

NO_AUG = TransformParams(False, 0, False, 0, False, 0)


def _make_batch(b=2, hw=32, c=4, seed=0):
    rng = np.random.default_rng(seed)
    image = rng.standard_normal((b, hw, hw, c)).astype(np.float32)
    target = (image[..., 0] > 0).astype(np.int32)
    return {"image": jnp.asarray(image), "target": jnp.asarray(target)}


def _make_state(optimizer_name="adam", model_name="ef_model"):
    batch = _make_batch()
    model = build_model(model_name, {"ms_image": 4}, 3, base_feat_channels=8)
    state = create_train_state(
        model, batch, lr=1e-3, optimizer_name=optimizer_name
    )
    return model, state, batch


# Fast lane runs adam only: the flatten/unflatten mechanism is optimizer
# -shape-generic, and each extra parametrization is a full train-state
# build (~20-40s of CPU compile). adamw/sgd stay covered nightly.
@pytest.mark.parametrize(
    "optimizer_name",
    [
        "adam",
        pytest.param("adamw", marks=pytest.mark.slow),
        pytest.param("sgd", marks=pytest.mark.slow),
    ],
)
def test_roundtrip_identity(optimizer_name):
    _, state, _ = _make_state(optimizer_name)
    fstate, spec = flatten_train_state(state)
    rebuilt = unflatten_train_state(fstate, spec)
    jax.tree.map(
        np.testing.assert_array_equal, state.params, rebuilt.params
    )
    jax.tree.map(
        np.testing.assert_array_equal, state.batch_stats, rebuilt.batch_stats
    )
    jax.tree.map(
        np.testing.assert_array_equal,
        jax.tree.leaves(state.opt_state),
        jax.tree.leaves(rebuilt.opt_state),
    )
    assert int(rebuilt.step) == int(state.step)


def test_flat_state_is_small():
    _, state, _ = _make_state()
    fstate, _ = flatten_train_state(state)
    n = len(jax.tree.leaves(fstate))
    assert n <= 8, f"flat state has {n} leaves; packing failed"


def test_ema_flat_matches_nested():
    # EMA update (d*ema + (1-d)*params) must agree between the nested step
    # and the flat step's single-buffer pass, and round-trip unflatten.
    batch = _make_batch()
    model = build_model("ef_model", {"ms_image": 4}, 3, base_feat_channels=8)
    state = create_train_state(model, batch, lr=1e-3, ema=True)
    assert state.ema_params is not None
    d = 0.5
    nested_step = make_train_step(model, 0, NO_AUG, ema_decay=d)
    fstate, spec = flatten_train_state(state)
    flat_step = make_flat_train_step(model, 0, NO_AUG, spec, ema_decay=d)

    key = jax.random.key(0)
    n_state = state
    for i in range(3):
        key, sub = jax.random.split(key)
        n_state, _ = nested_step(n_state, batch, sub)
    key = jax.random.key(0)
    for i in range(3):
        key, sub = jax.random.split(key)
        fstate, _ = flat_step(fstate, batch, sub)
    rebuilt = unflatten_train_state(fstate, spec)
    assert rebuilt.ema_params is not None
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        n_state.ema_params,
        rebuilt.ema_params,
    )
    # EMA lags the raw params (decay 0.5 over 3 steps from shared init).
    flat_p, _ = jax.flatten_util.ravel_pytree(n_state.params)
    flat_e, _ = jax.flatten_util.ravel_pytree(n_state.ema_params)
    assert float(jnp.abs(flat_p - flat_e).max()) > 0


def test_ema_eval_step_uses_averaged_params():
    from floodplanet_code_tpu.train.fit import make_eval_step

    batch = _make_batch()
    model = build_model("ef_model", {"ms_image": 4}, 3, base_feat_channels=8)
    state = create_train_state(model, batch, lr=1e-3, ema=True)
    eval_step = make_eval_step(model, 0)
    ebatch = dict(batch, valid=jnp.ones(batch["image"].shape[0], bool))
    base = eval_step(state, ebatch)
    # Zeroing the EMA params must change the eval output; zeroing the raw
    # params must NOT (eval reads the EMA copy).
    zeros = jax.tree.map(jnp.zeros_like, state.params)
    changed = eval_step(state.replace(ema_params=zeros), ebatch)
    unchanged = eval_step(state.replace(params=zeros), ebatch)
    assert float(changed["loss"]) != pytest.approx(float(base["loss"]))
    assert float(unchanged["loss"]) == pytest.approx(float(base["loss"]))


# adam-only in the fast lane (see test_roundtrip_identity's note).
@pytest.mark.parametrize(
    "optimizer_name",
    [
        "adam",
        pytest.param("adamw", marks=pytest.mark.slow),
        pytest.param("sgd", marks=pytest.mark.slow),
    ],
)
def test_flat_step_matches_nested(optimizer_name):
    model, state, batch = _make_state(optimizer_name)
    fstate, spec = flatten_train_state(state)

    nested_step = make_train_step(
        model, ignore_index=0, transform_params=NO_AUG, fuse_augmentation=False
    )
    flat_step = make_flat_train_step(
        model, ignore_index=0, transform_params=NO_AUG, spec=spec
    )

    rng = jax.random.key(0)
    for i in range(3):
        batch_i = _make_batch(seed=i)
        state, logs_n = nested_step(state, batch_i, rng)
        fstate, logs_f = flat_step(fstate, batch_i, rng)
        np.testing.assert_allclose(
            float(logs_n["loss"]), float(logs_f["loss"]), rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(logs_n["confusion"]), np.asarray(logs_f["confusion"])
        )

    rebuilt = unflatten_train_state(fstate, spec)
    flat_p = jax.tree.leaves(state.params)
    for a, b in zip(flat_p, jax.tree.leaves(rebuilt.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )
    for a, b in zip(
        jax.tree.leaves(state.batch_stats),
        jax.tree.leaves(rebuilt.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )
    assert int(rebuilt.step) == int(state.step) == 3


@pytest.mark.slow  # >80s on a contended 1-core box; sibling tests cover the surface in the fast lane
def test_flat_step_late_fusion_model():
    """LateFusion has per-modality encoders — deeper tree, same packing."""
    batch = _make_batch()
    batch["dem"] = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 32, 32, 1)), jnp.float32
    )
    model = build_model(
        "lf_model", {"ms_image": 4, "dem": 1}, 3, base_feat_channels=8
    )
    state = create_train_state(model, batch, lr=1e-3)
    fstate, spec = flatten_train_state(state)
    flat_step = make_flat_train_step(
        model, ignore_index=0, transform_params=NO_AUG, spec=spec
    )
    nested_step = make_train_step(
        model, ignore_index=0, transform_params=NO_AUG, fuse_augmentation=False
    )
    rng = jax.random.key(0)
    state, logs_n = nested_step(state, batch, rng)
    fstate, logs_f = flat_step(fstate, batch, rng)
    np.testing.assert_allclose(
        float(logs_n["loss"]), float(logs_f["loss"]), rtol=1e-5
    )


def test_flat_step_sharded_mesh():
    """Flat step under the data-parallel mesh (8 virtual CPU devices)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from floodplanet_code_tpu.parallel.mesh import make_mesh, replicate_state

    mesh = make_mesh()
    model, state, _ = _make_state()
    fstate, spec = flatten_train_state(state)
    fstate = replicate_state(fstate, mesh)
    batch = _make_batch(b=8)
    batch = jax.device_put(batch, NamedSharding(mesh, P("data")))
    flat_step = make_flat_train_step(
        model, ignore_index=0, transform_params=NO_AUG, spec=spec
    )
    fstate, logs = flat_step(fstate, batch, jax.random.key(0))
    assert np.isfinite(float(logs["loss"]))
    # ignore_index=0 drops target-class-0 pixels from the CM.
    total = int(np.asarray(logs["confusion"]).sum())
    assert 0 < total <= 8 * 32 * 32


@pytest.mark.slow
def test_fit_model_flat_vs_nested(tmp_path, synthetic_csdap_root):
    """One fit epoch with tpu.flat_state on/off lands the same val metric."""
    import json

    from floodplanet_code_tpu.config import compose
    from floodplanet_code_tpu.train.fit import fit_model

    results = {}
    for flag in (True, False):
        cfg = compose(
            overrides=[
                "dataset.sensor=S1",
                "eval_region=RegionB",
                "n_epochs=1",
                "crop_height=32",
                "crop_width=32",
                "crop_stride=32",
                "batch_size=4",
                "n_workers=1",
                f"tpu.flat_state={str(flag).lower()}",
                "transforms.hflip.active=false",
                "transforms.vflip.active=false",
                "transforms.rotate.active=false",
            ]
        )
        cfg.dataset["dataset_kwargs"] = {"root_dir": synthetic_csdap_root}
        best = fit_model(
            cfg, overwrite_exp_dir=str(tmp_path / f"flat_{flag}")
        )
        with open(f"{best}/metrics.json") as handle:
            results[flag] = json.load(handle)["val_MulticlassJaccardIndex"]
    # The two paths are different HLO programs: XLA fusion/reassociation
    # drift (float-level) compounds over an epoch of Adam steps, so
    # equality is only approximate at the epoch scale. Step-level
    # equivalence is asserted tightly in test_flat_step_matches_nested.
    assert results[True] == pytest.approx(results[False], abs=0.01)


def test_ema_warmup_schedule_values():
    """ema_decay_at = min(decay, (1+t)/(10+t)) with t = completed updates."""
    from floodplanet_code_tpu.train.state import ema_decay_at

    assert float(ema_decay_at(1, 0.999)) == pytest.approx(2 / 11)
    assert float(ema_decay_at(90, 0.999)) == pytest.approx(91 / 100)
    assert float(ema_decay_at(10**6, 0.999)) == pytest.approx(0.999)
    # A decay below the ramp's range is simply the fixed decay.
    assert float(ema_decay_at(100, 0.5)) == pytest.approx(0.5)
    # Traced/jitted usage (the train steps call it on state.step).
    assert float(jax.jit(lambda t: ema_decay_at(t, 0.999))(jnp.int32(1))) == (
        pytest.approx(2 / 11)
    )


@pytest.mark.slow  # >80s on a contended 1-core box; sibling tests cover the surface in the fast lane
def test_ema_warmup_tracks_where_fixed_decay_lags():
    """At d=0.999 on a 5-step run, the warmed EMA follows the raw params
    while the fixed-decay EMA is still ~stuck at the random init — the
    failure mode measured on the short round-3 CV folds (RESULTS.md)."""
    batch = _make_batch()
    model = build_model("ef_model", {"ms_image": 4}, 3, base_feat_channels=8)

    def run(ema_warmup):
        state = create_train_state(model, batch, lr=1e-2, ema=True)
        step = make_train_step(
            model, 0, NO_AUG, ema_decay=0.999, ema_warmup=ema_warmup
        )
        key = jax.random.key(0)
        for _ in range(5):
            key, sub = jax.random.split(key)
            state, _ = step(state, batch, sub)
        p, _ = jax.flatten_util.ravel_pytree(state.params)
        e, _ = jax.flatten_util.ravel_pytree(state.ema_params)
        return float(jnp.linalg.norm(e - p))

    lag_warm = run(True)
    lag_fixed = run(False)
    # Warmed decay at t<=5 is <= 6/15, so the EMA sits within ~40% of the
    # params' trajectory; fixed 0.999 retains ~99.5% of the init offset.
    assert lag_warm < 0.5 * lag_fixed
