"""Round-3 A/B part 2: conv-based upsample, batch-16 scaling, conv MFU.

Incremental JSONL to outputs/perf_r3/ab2.jsonl.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

OUT = "/root/repo/outputs/perf_r3/ab2.jsonl"
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

    # ---- conv MFU micro: isolated L0-shape convs fwd only ----
    for (h, cin, cout) in [(512, 64, 64), (256, 128, 128), (128, 256, 256),
                           (64, 512, 512), (512, 4, 64)]:
        x = jnp.asarray(
            rng.standard_normal((B, h, h, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        k = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.01
        ).astype(jnp.bfloat16)

        def conv(x_, s):
            y = jax.lax.conv_general_dilated(
                x_ + s.astype(x_.dtype), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(y.astype(jnp.float32))

        f = jax.jit(conv)
        ms = timeit(lambda c_: f(x, c_))
        tflop = 2 * B * h * h * 9 * cin * cout / 1e12
        rec(f"conv_{h}x{cin}to{cout}", ms, tflop=round(tflop, 3),
            mfu_pct=round(tflop / (ms / 1000) / 197 * 100, 1))

    # ---- whole-model fwd+bwd: resize vs conv upsample ----
    def model_ab(tag, bsz, **kw):
        image = jnp.asarray(
            rng.standard_normal((bsz, T, T, C)).astype(np.float32)
        )
        target = jnp.asarray((np.asarray(image[..., 0]) > 0).astype(np.int32))
        model = build_model(
            "ef_model", {"ms_image": C}, NC, dtype=jnp.bfloat16, **kw
        )
        state = create_train_state(
            model, {"image": image, "target": target}, lr=1e-4,
            optimizer_name="adam",
        )

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
        rec(f"fwd_bwd_{tag}", ms,
            tiles_s=round(bsz / ms * 1000, 1),
            **cost(gr.lower(state.params, state.batch_stats, image,
                            target).compile()))

    model_ab("conv_up_b8", B, upsample_impl="conv")
    # Explicit: the recorded ab2.jsonl rows predate the conv-upsample
    # default flip (ff73815); pin the resize build so reruns stay honest.
    model_ab("resize_b16", 16, upsample_impl="resize")

    rec("done")


if __name__ == "__main__":
    main()
