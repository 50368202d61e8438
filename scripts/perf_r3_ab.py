"""Round-3 A/B: pool/upsample implementations in the full model, fwd+bwd.

Also probes the lane-padding hypothesis (C=64 bf16 tensors padded to 128
lanes would double physical HBM traffic) with plain elementwise copies.
Incremental JSONL to outputs/perf_r3/ab.jsonl.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

OUT = "/root/repo/outputs/perf_r3/ab.jsonl"
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


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "gflop": round(ca.get("flops", 0) / 1e9, 1),
        "gb": round(ca.get("bytes accessed", 0) / 1e9, 2),
    }


def main():
    from floodplanet_code_tpu.models import build_model
    from floodplanet_code_tpu.ops.losses import cross_entropy_ignore
    from floodplanet_code_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((B, T, T, C)).astype(np.float32))
    target = jnp.asarray((np.asarray(image[..., 0]) > 0).astype(np.int32))
    batch = {"image": image, "target": target}

    # ---- lane-padding probe: elementwise x*1.0001 + r at three shapes ----
    for shape in [(8, 512, 512, 64), (8, 512, 512, 128), (8, 512, 256, 128),
                  (8, 512, 512, 6), (8, 512, 512, 4)]:
        x = jnp.asarray(
            rng.standard_normal(shape).astype(np.float32)
        ).astype(jnp.bfloat16)

        f = jax.jit(lambda x_, s: jnp.sum((x_ * (1.0 + s)).astype(jnp.float32)))
        ms = timeit(lambda c_: f(x, c_))
        gb_logical = 2 * np.prod(shape) * 2 / 1e9
        rec(
            f"copy_{'x'.join(map(str, shape[1:]))}", ms,
            gb_logical=round(float(gb_logical), 3),
            gbps=round(float(gb_logical / ms * 1000), 0),
        )

    # ---- whole-model fwd+bwd A/B ----
    variants = [
        ("xla_resize", dict(pool_impl="xla", upsample_impl="resize")),
        ("quad_resize", dict(pool_impl="quadrant", upsample_impl="resize")),
        ("xla_stencil", dict(pool_impl="xla", upsample_impl="stencil")),
        ("quad_stencil", dict(pool_impl="quadrant", upsample_impl="stencil")),
    ]
    for tag, kw in variants:
        model = build_model(
            "ef_model", {"ms_image": C}, NC, dtype=jnp.bfloat16, **kw
        )
        state = create_train_state(model, batch, lr=1e-4, optimizer_name="adam")
        params, bstats = state.params, state.batch_stats

        def loss_fn(p, bs, im, tg):
            logits, upd = model.apply(
                {"params": p, "batch_stats": bs}, {"image": im},
                train=True, mutable=["batch_stats"],
            )
            return cross_entropy_ignore(logits, tg, 0)

        def gsum(p, bs, im, tg):
            l, g = jax.value_and_grad(loss_fn)(p, bs, im, tg)
            return l + sum(jnp.sum(x) for x in jax.tree.leaves(g))

        gr = jax.jit(gsum)
        ms = timeit(lambda c: gr(params, bstats, image + c, target))
        rec(f"fwd_bwd_{tag}", ms,
            **cost(gr.lower(params, bstats, image, target).compile()))

        fw = jax.jit(loss_fn)
        ms = timeit(lambda c: fw(params, bstats, image + c, target))
        rec(f"fwd_{tag}", ms,
            **cost(fw.lower(params, bstats, image, target).compile()))

    rec("done")


if __name__ == "__main__":
    main()
