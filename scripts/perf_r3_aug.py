"""Round-3: new fused dihedral + bf16 + cyclic-roll augmentation on TPU.

Measures the standalone augment program, the full augmented pipeline
(the honest-recipe bench number), and the fused-into-step variant.
Also dumps the optimized HLO of the fwd+bwd program for byte analysis.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

OUT = "/root/repo/outputs/perf_r3/aug.jsonl"
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
    c = jnp.float32(0.0)
    for _ in range(warmup):
        c = make_call(c) * 0.0
    float(c)
    t0 = time.perf_counter()
    for _ in range(n):
        c = make_call(c) * 0.0
    float(c)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    from floodplanet_code_tpu.data.augment import TransformParams, augment_batch
    from floodplanet_code_tpu.models import build_model
    from floodplanet_code_tpu.train.fit import make_augment_step
    from floodplanet_code_tpu.train.flat import (
        flatten_train_state,
        make_flat_train_step,
    )
    from floodplanet_code_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((B, T, T, C)).astype(np.float32))
    target = jnp.asarray((np.asarray(image[..., 0]) > 0).astype(np.int32))
    batch = {"image": image, "target": target}
    key = jax.random.key(0)

    # ---- standalone augment program: f32 vs bf16 ----
    for tag, params in [
        ("aug_f32", TransformParams()),
        ("aug_bf16", TransformParams(dtype="bfloat16")),
    ]:

        def call(c, params=params):
            img, tgt = augment_batch(
                jax.random.key(1), image + c, target, params, 0
            )
            return jnp.sum(img.astype(jnp.float32)) + jnp.sum(tgt)

        f = jax.jit(call)
        ms = timeit(lambda c: f(c))
        rec(tag, ms)

    # ---- full pipeline: augment program -> flat train step ----
    model = build_model("ef_model", {"ms_image": C}, NC, dtype=jnp.bfloat16)
    state = create_train_state(model, batch, lr=1e-4, optimizer_name="adam")
    fstate, spec = flatten_train_state(state)
    noaug = TransformParams(False, 0, False, 0, False, 0)

    def pipeline(tag, transform_params, fuse):
        step = make_flat_train_step(
            model, ignore_index=0, transform_params=transform_params,
            spec=spec, fuse_augmentation=fuse,
        )
        augment = (
            None if fuse else make_augment_step(transform_params, ignore_index=0)
        )
        # The flat step donates its state input: give each pipeline its own
        # copy or the second pipeline starts from a deleted buffer.
        carry = {"s": jax.tree.map(jnp.copy, fstate)}

        def one(c):
            b = {"image": image + c, "target": target}
            if augment is not None:
                b = augment(jax.random.key(2), b)
            new_state, logs = step(carry["s"], b, key)
            carry["s"] = new_state
            return logs["loss"]

        ms = timeit(one)
        rec(tag, ms, tiles_s=round(B / ms * 1000, 1))

    pipeline("step_noaug", noaug, False)
    pipeline("step_aug_bf16", TransformParams(dtype="bfloat16"), False)
    pipeline("step_aug_bf16_fused", TransformParams(dtype="bfloat16"), True)
    pipeline("step_aug_f32", TransformParams(), False)

    # ---- HLO dump of fwd+bwd for byte-bloat analysis ----
    from floodplanet_code_tpu.ops.losses import cross_entropy_ignore

    def loss_fn(p, bs, im, tg):
        logits, upd = model.apply(
            {"params": p, "batch_stats": bs}, {"image": im},
            train=True, mutable=["batch_stats"],
        )
        return cross_entropy_ignore(logits, tg, 0)

    def gsum(p, bs, im, tg):
        l, g = jax.value_and_grad(loss_fn)(p, bs, im, tg)
        return l + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    compiled = jax.jit(gsum).lower(
        state.params, state.batch_stats, image, target
    ).compile()
    txt = compiled.as_text()
    with open("/root/repo/outputs/perf_r3/fwd_bwd_hlo.txt", "w") as f:
        f.write(txt)
    try:
        mem = compiled.memory_analysis()
        rec("hlo_dump", bytes=len(txt),
            temp_gb=round(getattr(mem, "temp_size_in_bytes", 0) / 1e9, 2),
            argument_gb=round(getattr(mem, "argument_size_in_bytes", 0) / 1e9, 2),
            output_gb=round(getattr(mem, "output_size_in_bytes", 0) / 1e9, 2))
    except Exception as e:
        rec("hlo_dump", bytes=len(txt), mem_err=str(e)[:100])

    rec("done")


if __name__ == "__main__":
    main()
