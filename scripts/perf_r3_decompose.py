"""Round-3 perf: decompose the 92.9 ms train step on the real chip.

Writes incremental JSONL to outputs/perf_r3/decompose.jsonl so a tunnel
hang loses nothing. Each timed program chains a scalar carry through the
input (the tunnel's block_until_ready does not reliably block) and reduces
every output to scalars inside jit.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

OUT = "/root/repo/outputs/perf_r3/decompose.jsonl"
os.makedirs(os.path.dirname(OUT), exist_ok=True)

import jax
import jax.numpy as jnp

B, T, C, NC = 8, 512, 4, 3


def rec(name, ms=None, **extra):
    row = {"name": name, **({"ms": round(ms, 2)} if ms is not None else {}), **extra}
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def timeit(make_call, n=10, warmup=3):
    """make_call(carry_scalar) -> scalar jax array; chained for sync."""
    c = jnp.float32(0.0)
    for _ in range(warmup):
        c = make_call(c) * 0.0
    float(c)
    t0 = time.perf_counter()
    for _ in range(n):
        c = make_call(c) * 0.0
    float(c)
    return (time.perf_counter() - t0) / n * 1000.0


def cost(lowered_compiled):
    ca = lowered_compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "gflop": round(ca.get("flops", 0) / 1e9, 1),
        "gb": round(ca.get("bytes accessed", 0) / 1e9, 2),
    }


def main():
    from floodplanet_code_tpu.data.augment import TransformParams
    from floodplanet_code_tpu.models import build_model
    from floodplanet_code_tpu.ops.losses import cross_entropy_ignore
    from floodplanet_code_tpu.train.flat import (
        flatten_train_state,
        make_flat_train_step,
    )
    from floodplanet_code_tpu.train.state import create_train_state

    rec("platform", platform=jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.standard_normal((B, T, T, C)).astype(np.float32)
    )
    target = jnp.asarray((np.asarray(image[..., 0]) > 0).astype(np.int32))
    batch = {"image": image, "target": target}

    model = build_model("ef_model", {"ms_image": C}, NC, dtype=jnp.bfloat16)
    state0 = create_train_state(model, batch, lr=1e-4, optimizer_name="adam")
    params, bstats = state0.params, state0.batch_stats

    # ---- 1. full flat train step (baseline) ----
    fstate, spec = flatten_train_state(state0)
    noaug = TransformParams(False, 0, False, 0, False, 0)
    step = make_flat_train_step(
        model, ignore_index=0, transform_params=noaug, spec=spec,
        fuse_augmentation=False,
    )
    key = jax.random.key(0)
    carry = {"s": fstate}

    def full_step(c):
        b = {"image": image + c, "target": target}
        new_state, logs = step(carry["s"], b, key)
        carry["s"] = new_state
        return logs["loss"]

    ms = timeit(full_step)
    rec("full_flat_step", ms, tiles_s=round(B / ms * 1000, 1))

    # ---- 2. fwd-only train-mode loss ----
    def loss_fn(p, bs, im, tg):
        logits, upd = model.apply(
            {"params": p, "batch_stats": bs}, {"image": im},
            train=True, mutable=["batch_stats"],
        )
        return cross_entropy_ignore(logits, tg, 0)

    fwd = jax.jit(loss_fn)
    ms = timeit(lambda c: fwd(params, bstats, image + c, target))
    rec("fwd_loss", ms, **cost(fwd.lower(params, bstats, image, target).compile()))

    # ---- 3. fwd+bwd, grads reduced to scalar ----
    def gsum(p, bs, im, tg):
        l, g = jax.value_and_grad(loss_fn)(p, bs, im, tg)
        return l + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    gr = jax.jit(gsum)
    ms = timeit(lambda c: gr(params, bstats, image + c, target))
    rec("fwd_bwd", ms, **cost(gr.lower(params, bstats, image, target).compile()))

    # ---- 4. fwd+bwd with full remat (nothing saved) ----
    def gsum_remat(p, bs, im, tg):
        f = jax.checkpoint(
            loss_fn, policy=jax.checkpoint_policies.nothing_saveable
        )
        l, g = jax.value_and_grad(f)(p, bs, im, tg)
        return l + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    grr = jax.jit(gsum_remat)
    ms = timeit(lambda c: grr(params, bstats, image + c, target))
    rec("fwd_bwd_full_remat", ms,
        **cost(grr.lower(params, bstats, image, target).compile()))

    # ---- 5. plain flax BN (unfused) for comparison ----
    model_nf = build_model(
        "ef_model", {"ms_image": C}, NC, dtype=jnp.bfloat16, fused_bn=False
    )
    state_nf = create_train_state(model_nf, batch, lr=1e-4, optimizer_name="adam")

    def loss_nf(p, bs, im, tg):
        logits, upd = model_nf.apply(
            {"params": p, "batch_stats": bs}, {"image": im},
            train=True, mutable=["batch_stats"],
        )
        return cross_entropy_ignore(logits, tg, 0)

    def gsum_nf(p, bs, im, tg):
        l, g = jax.value_and_grad(loss_nf)(p, bs, im, tg)
        return l + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    gnf = jax.jit(gsum_nf)
    ms = timeit(
        lambda c: gnf(state_nf.params, state_nf.batch_stats, image + c, target)
    )
    rec("fwd_bwd_flax_bn", ms,
        **cost(gnf.lower(state_nf.params, state_nf.batch_stats, image,
                         target).compile()))

    # ---- 6. maxpool vs reshape-max fwd+bwd at the 4 encoder scales ----
    from flax import linen as nn

    for (h, c) in [(512, 64), (256, 128), (128, 256), (64, 512)]:
        x = jnp.asarray(
            rng.standard_normal((B, h, h, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        r = jnp.asarray(
            rng.standard_normal((B, h // 2, h // 2, c)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def f_max(x_, s):
            y = nn.max_pool(x_ + s.astype(x_.dtype), (2, 2), strides=(2, 2))
            return jnp.sum((y * r).astype(jnp.float32))

        def f_resh(x_, s):
            x_ = x_ + s.astype(x_.dtype)
            b_, hh, ww, cc = x_.shape
            y = x_.reshape(b_, hh // 2, 2, ww // 2, 2, cc).max(axis=(2, 4))
            return jnp.sum((y * r).astype(jnp.float32))

        for tag, f in [("max_pool", f_max), ("reshape_max", f_resh)]:
            g = jax.jit(
                lambda x_, s, f=f: (lambda l, gg: l + jnp.sum(gg))(
                    *jax.value_and_grad(f)(x_, s)
                )
            )
            ms = timeit(lambda c_: g(x, c_))
            rec(f"pool_{tag}_{h}x{c}", ms, **cost(g.lower(x, 0.0).compile()))

    # ---- 7. bilinear 2x up: jax.image.resize vs manual stencil ----
    def up_resize(x_):
        b_, hh, ww, cc = x_.shape
        return jax.image.resize(
            x_, (b_, 2 * hh, 2 * ww, cc), method="linear"
        ).astype(x_.dtype)

    def up_stencil(x_):
        # half-pixel-centers 2x linear: even out = 0.25*prev + 0.75*cur,
        # odd out = 0.75*cur + 0.25*next (edge-clamped).
        def axis_up(v, axis):
            prev = jnp.concatenate(
                [jax.lax.slice_in_dim(v, 0, 1, axis=axis),
                 jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1, axis=axis)],
                axis=axis)
            nxt = jnp.concatenate(
                [jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis),
                 jax.lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis],
                                      axis=axis)], axis=axis)
            even = 0.25 * prev + 0.75 * v
            odd = 0.75 * v + 0.25 * nxt
            out = jnp.stack([even, odd], axis=axis + 1)
            shp = list(v.shape)
            shp[axis] *= 2
            return out.reshape(shp)

        return axis_up(axis_up(x_, 1), 2)

    for (h, c) in [(32, 512), (64, 512), (128, 256), (256, 128)]:
        x = jnp.asarray(
            rng.standard_normal((B, h, h, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        r = jnp.asarray(
            rng.standard_normal((B, 2 * h, 2 * h, c)).astype(np.float32)
        ).astype(jnp.bfloat16)

        for tag, f in [("resize", up_resize), ("stencil", up_stencil)]:
            def loss_u(x_, s, f=f):
                y = f(x_ + s.astype(x_.dtype))
                return jnp.sum((y * r).astype(jnp.float32))

            g = jax.jit(
                lambda x_, s, loss_u=loss_u: (lambda l, gg: l + jnp.sum(gg))(
                    *jax.value_and_grad(loss_u)(x_, s)
                )
            )
            ms = timeit(lambda c_: g(x, c_))
            rec(f"up_{tag}_{h}x{c}", ms, **cost(g.lower(x, 0.0).compile()))

    rec("done")


if __name__ == "__main__":
    main()
