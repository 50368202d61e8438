"""Round-3 gates 2-3: whole-model A/B, conv_impl xla vs pallas_fused.

Eval forward and train fwd+bwd at the production shape (512x512x4, b8,
bf16). Outputs reduced to scalars inside jit. JSONL to
outputs/perf_r3/pallas_model.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = "/root/repo/outputs/perf_r3/pallas_model.jsonl"
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

    rec("platform", platform=jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((B, T, T, C)).astype(np.float32))
    target = jnp.asarray((np.asarray(image[..., 0]) > 0).astype(np.int32))

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    for impl in ("xla", "pallas_fused"):
        if which != "both" and impl != which:
            continue
        model = build_model(
            "ef_model", {"ms_image": C}, NC, dtype=jnp.bfloat16, conv_impl=impl
        )
        state = create_train_state(
            model, {"image": image, "target": target}, lr=1e-4,
            optimizer_name="adam",
        )

        # eval forward
        def fwd(p, bs, im):
            logits = model.apply(
                {"params": p, "batch_stats": bs}, {"image": im}, train=False
            )
            return jnp.sum(logits)

        f = jax.jit(fwd)
        ms = timeit(lambda c: f(state.params, state.batch_stats, image + c))
        rec(f"eval_fwd_{impl}", ms, tiles_s=round(B / ms * 1000, 1),
            **cost(f.lower(state.params, state.batch_stats, image).compile()))

        # train fwd+bwd
        def loss_fn(p, bs, im, tg):
            logits, upd = model.apply(
                {"params": p, "batch_stats": bs}, {"image": im},
                train=True, mutable=["batch_stats"],
            )
            return cross_entropy_ignore(logits, tg, 0)

        def gsum(p, bs, im, tg):
            l, g = jax.value_and_grad(loss_fn)(p, bs, im, tg)
            return l + sum(jnp.sum(v) for v in jax.tree.leaves(g))

        gr = jax.jit(gsum)
        ms = timeit(lambda c: gr(state.params, state.batch_stats,
                                 image + c, target))
        rec(f"fwd_bwd_{impl}", ms, tiles_s=round(B / ms * 1000, 1),
            **cost(gr.lower(state.params, state.batch_stats, image,
                            target).compile()))
    rec("done")


if __name__ == "__main__":
    main()
