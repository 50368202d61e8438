"""Inference-path tuning sweep (round-4 VERDICT stretch #8).

Measures, on the real chip, the sliding-window inference path at several
batch sizes: (a) the bare predict forward (softmax consumed on device)
and (b) forward + on-device scatter-add stitching into a scene canvas —
the production cadence of inference/sliding.py. Emits one JSON line per
configuration to stdout and appends to outputs/perf_r5/infer_sweep.jsonl.

Tunnel methodology (PERF.md): outputs reduced to scalars inside jit;
sync via float(); no big tensors cross the host boundary.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

TILE = 512
CHANNELS = 4
N_CLASSES = 3
SCENE = 2048  # synthetic scene edge; 16 tile offsets at stride 512


def main() -> None:
    import jax
    import jax.numpy as jnp

    from floodplanet_code_tpu.inference.sliding import make_predict_step
    from floodplanet_code_tpu.inference.stitcher import stitch_batch
    from floodplanet_code_tpu.models import build_model

    model = build_model(
        "ef_model", {"ms_image": CHANNELS}, N_CLASSES, dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    image_max = jnp.asarray(
        rng.standard_normal((32, TILE, TILE, CHANNELS)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), {"image": image_max[:1]})
    predict = make_predict_step(model)

    # All stride-512 offsets of the synthetic scene, cycled per batch.
    offs = np.array(
        [(y, x) for y in range(0, SCENE, TILE) for x in range(0, SCENE, TILE)],
        np.int32,
    )
    offs = np.concatenate([offs, offs])  # >= 32 rows for the largest batch

    fwd = jax.jit(lambda v, im: predict(v, {"image": im}).sum())

    def fwd_stitch(v, im, canvas, weights, offsets, valid):
        probs = predict(v, {"image": im})
        return stitch_batch(canvas, weights, probs, offsets, valid)

    fwd_stitch = jax.jit(fwd_stitch, donate_argnums=(2, 3))

    os.makedirs("/root/repo/outputs/perf_r5", exist_ok=True)
    out_path = "/root/repo/outputs/perf_r5/infer_sweep.jsonl"
    results = []
    for batch in (4, 8, 16, 32):
        im = image_max[:batch]
        valid = jnp.ones((batch, TILE, TILE), jnp.float32)

        # --- bare forward ---
        float(fwd(variables, im))  # compile + sync
        n = max(1, 256 // batch)
        start = time.perf_counter()
        for _ in range(n):
            acc = fwd(variables, im)
        float(acc)
        fwd_tps = n * batch / (time.perf_counter() - start)

        # --- forward + stitch (production cadence) ---
        pad = SCENE + TILE
        canvas = jnp.zeros((pad, pad, N_CLASSES), jnp.float32)
        weights = jnp.zeros((pad, pad), jnp.float32)
        off = jnp.asarray(offs[:batch])
        canvas, weights = fwd_stitch(variables, im, canvas, weights, off, valid)
        float(weights.sum())  # compile + sync
        # Constant offsets: re-stitching the same windows accumulates
        # harmlessly and keeps per-call host->device traffic at zero
        # (a fresh offsets transfer per call would be tunnel artifact).
        start = time.perf_counter()
        for _ in range(n):
            canvas, weights = fwd_stitch(
                variables, im, canvas, weights, off, valid
            )
        float(weights.sum())
        st_tps = n * batch / (time.perf_counter() - start)

        row = {
            "platform": jax.devices()[0].platform,
            "batch": batch,
            "forward_tiles_per_sec": round(fwd_tps, 2),
            "forward_stitch_tiles_per_sec": round(st_tps, 2),
            "stitch_overhead_pct": round(100 * (1 - st_tps / fwd_tps), 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        if row["platform"] != "cpu":  # keep CPU sanity runs out of the record
            with open(out_path, "a") as handle:
                handle.write(json.dumps(row) + "\n")

    best = max(results, key=lambda r: r["forward_stitch_tiles_per_sec"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
