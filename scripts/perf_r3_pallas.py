"""Round-3 gate 1: Pallas fused BN+ReLU+conv3x3 vs the XLA chain, per level.

Forward-only, per UNet level at the production 512x512 b8 shapes. The XLA
chain jits relu(y*a+b) -> conv (z materialized by XLA); the Pallas path is
ops/conv_fused.relu_affine_conv3x3. Outputs reduced to scalars inside jit
(tunnel rule). Incremental JSONL to outputs/perf_r3/pallas.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = "/root/repo/outputs/perf_r3/pallas.jsonl"
os.makedirs(os.path.dirname(OUT), exist_ok=True)

import jax
import jax.numpy as jnp

from floodplanet_code_tpu.ops.conv_fused import relu_affine_conv3x3, xla_reference


def rec(name, ms=None, **extra):
    row = {"name": name, **({"ms": round(ms, 3)} if ms is not None else {}), **extra}
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def timeit(make_call, n=20, warmup=3):
    c = jnp.float32(0.0)
    for _ in range(warmup):
        c = make_call(c) * 0.0
    float(c)
    t0 = time.perf_counter()
    for _ in range(n):
        c = make_call(c) * 0.0
    float(c)
    return (time.perf_counter() - t0) / n * 1000.0


LEVELS = [
    ("L0_512x64to64", 512, 64, 64),
    ("L1_256x128to128", 256, 128, 128),
    ("L2_128x256to256", 128, 256, 256),
    ("L3_64x512to512", 64, 512, 512),
    ("L4_32x512to512", 32, 512, 512),
    ("up1_64x512to256", 64, 512, 256),
]


def main():
    rec("platform", platform=jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    B = 8
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, h, c1, c2 in LEVELS:
        if only and only not in name:
            continue
        y = jnp.asarray(
            rng.standard_normal((B, h, h, c1)).astype(np.float32)
        ).astype(jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal(c1).astype(np.float32) * 0.1 + 1)
        b = jnp.asarray(rng.standard_normal(c1).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.standard_normal((3, 3, c1, c2)).astype(np.float32) * 0.05)

        def xla_chain(y_, s):
            out = xla_reference(y_ + s.astype(y_.dtype), a, b, w)
            return jnp.sum(out.astype(jnp.float32))

        def pallas_chain(y_, s):
            out = relu_affine_conv3x3(y_ + s.astype(y_.dtype), a, b, w)
            return jnp.sum(out.astype(jnp.float32))

        fx = jax.jit(xla_chain)
        fp = jax.jit(pallas_chain)

        # numerics first (cheap, on-device)
        dv = float(
            jnp.max(
                jnp.abs(
                    relu_affine_conv3x3(y, a, b, w).astype(jnp.float32)
                    - xla_reference(y, a, b, w).astype(jnp.float32)
                )
            )
        )
        ms_x = timeit(lambda c: fx(y, c))
        ms_p = timeit(lambda c: fp(y, c))
        gflop = 2 * B * h * h * 9 * c1 * c2 / 1e9
        rec(
            name,
            xla_ms=round(ms_x, 3),
            pallas_ms=round(ms_p, 3),
            maxdiff=dv,
            gflop=round(gflop, 1),
            pallas_mfu_pct=round(gflop / 1e3 / (ms_p / 1e3) / 197 * 100, 1),
            xla_mfu_pct=round(gflop / 1e3 / (ms_x / 1e3) / 197 * 100, 1),
        )
    rec("done")


if __name__ == "__main__":
    main()
