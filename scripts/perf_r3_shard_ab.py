"""Round-3: ``tpu.spmd_impl=shard_map`` vs GSPMD whole-model A/B (real chip).

The round-3 session-2 plan (PERF.md "Session-2 additions") scoped this but
the relay outage preempted it. On ONE chip the collectives are self-edges,
so the question this answers is narrower than the multi-chip overlap study
(which needs hardware the tunnel doesn't expose): does the explicit
shard_map lowering itself cost anything vs the partitioner-derived GSPMD
program — extra copies around the manual-collective boundary, lost
fusions, donation differences? Numerical parity on a real 8-way mesh is
already proven on CPU (tests/test_shard_step.py).

Measures the production train-step shapes (early-fusion UNet, 512^2 x 4,
batch 8, bf16 compute / f32 params) with the log's conventions: scalar
carry chained through inputs for sync, outputs reduced to scalars, costs
from cost_analysis(). Writes incremental JSONL to
outputs/perf_r3/shard_ab.jsonl.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

OUT = "/root/repo/outputs/perf_r3/shard_ab.jsonl"
os.makedirs(os.path.dirname(OUT), exist_ok=True)

import jax
import jax.numpy as jnp

B, T, C, NC = 8, 512, 4, 3


def rec(name, ms=None, **extra):
    row = {"name": name, **({"ms": round(ms, 2)} if ms is not None else {}), **extra}
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def timeit(make_call, n=20, warmup=3):
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


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "gflop": round(ca.get("flops", 0) / 1e9, 1),
        "gb": round(ca.get("bytes accessed", 0) / 1e9, 2),
    }


def main():
    from floodplanet_code_tpu.data.augment import TransformParams
    from floodplanet_code_tpu.models import build_model
    from floodplanet_code_tpu.parallel.mesh import make_mesh
    from floodplanet_code_tpu.parallel.shard_step import make_shard_train_step
    from floodplanet_code_tpu.train.fit import make_train_step
    from floodplanet_code_tpu.train.state import create_train_state

    rec("platform", platform=jax.devices()[0].platform,
        n_devices=jax.device_count())
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((B, T, T, C)).astype(np.float32))
    target = jnp.asarray((np.asarray(image[..., 0]) > 0).astype(np.int32))
    batch = {"image": image, "target": target}
    noaug = TransformParams(False, 0, False, 0, False, 0)
    key = jax.random.key(0)
    mesh = make_mesh()

    def time_step(name, step, state):
        carry = {"s": state}

        def call(c):
            b = {"image": image + c, "target": target}
            new_state, logs = step(carry["s"], b, key)
            carry["s"] = new_state
            return logs["loss"]

        ms = timeit(call)
        extra = {}
        try:
            # Lower a fresh call for cost analysis (donation-safe: lower
            # doesn't execute, and carry['s'] still owns live buffers).
            extra = cost(step.lower(carry["s"], batch, key).compile())
        except Exception as exc:  # pragma: no cover - tunnel quirk guard
            extra = {"cost_error": str(exc)[:120]}
        rec(name, ms, tiles_s=round(B / ms * 1000, 1), **extra)

    # ---- GSPMD (partitioner-derived collectives; production default) ----
    gspmd_model = build_model("ef_model", {"ms_image": C}, NC,
                              dtype=jnp.bfloat16)
    gspmd_state = create_train_state(
        gspmd_model, {k: np.asarray(v) for k, v in batch.items()},
        lr=1e-4, optimizer_name="adam")
    time_step("gspmd_train_step", make_train_step(gspmd_model, 0, noaug),
              gspmd_state)

    # ---- shard_map (explicit collectives, SyncBN via bn_axis_name) ----
    sync_model = build_model("ef_model", {"ms_image": C}, NC,
                             dtype=jnp.bfloat16,
                             bn_axis_name=mesh.axis_names[0])
    sync_state = create_train_state(
        sync_model, {k: np.asarray(v) for k, v in batch.items()},
        lr=1e-4, optimizer_name="adam")
    time_step("shard_map_train_step",
              make_shard_train_step(sync_model, mesh, 0), sync_state)


if __name__ == "__main__":
    main()
