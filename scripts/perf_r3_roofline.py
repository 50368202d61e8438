"""Round-3 roofline accounting for the production fwd+bwd step.

Dumps the optimized HLO of the current default build (conv upsample,
fused BN, bf16), then accounts HBM bytes per instruction class and per
UNet level, and compares against the analytic minimum traffic. Written
for PERF.md's "per-fusion bytes" table (VERDICT round-2 item 2).

Outputs: outputs/perf_r3/fwd_bwd_hlo2.txt (dump),
outputs/perf_r3/roofline.json (table).
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

OUT_DIR = "/root/repo/outputs/perf_r3"
os.makedirs(OUT_DIR, exist_ok=True)

import jax
import jax.numpy as jnp

B, T, C, NC = 8, 512, 4, 3


def main():
    from floodplanet_code_tpu.models import build_model
    from floodplanet_code_tpu.ops.losses import cross_entropy_ignore
    from floodplanet_code_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((B, T, T, C)).astype(np.float32))
    target = jnp.asarray((np.asarray(image[..., 0]) > 0).astype(np.int32))
    model = build_model("ef_model", {"ms_image": C}, NC, dtype=jnp.bfloat16)
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

    compiled = jax.jit(gsum).lower(
        state.params, state.batch_stats, image, target
    ).compile()
    hlo = compiled.as_text()
    with open(os.path.join(OUT_DIR, "fwd_bwd_hlo2.txt"), "w") as f:
        f.write(hlo)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("cost:", ca.get("flops", 0) / 1e12, "TFLOP",
          ca.get("bytes accessed", 0) / 1e9, "GB")

    # ---- per-instruction byte accounting over the entry computation ----
    # Shared parser helpers live in analyze_hlo.py — one dtype table /
    # shape regex to maintain.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from analyze_hlo import shape_bytes

    m = re.search(r"ENTRY [^\{]+\{(.*?)\n\}", hlo, re.S)
    body = m.group(1)

    op_re = re.compile(r" ([a-z][\w\-]*)\(")
    sizes, opcodes, operands = {}, {}, {}
    for line in body.splitlines():
        line = line.strip()
        if not line.startswith(("%", "ROOT")) or " = " not in line:
            continue
        name, rhs = line.split(" = ", 1)
        name = name.replace("ROOT ", "").strip()
        m2 = op_re.search(rhs)
        if not m2:
            continue
        sizes[name] = shape_bytes(rhs[: m2.start()])
        opcodes[name] = m2.group(1)
        args = re.findall(r"(%[\w.\-]+)", rhs[m2.start():])
        operands[name] = args

    # HBM traffic estimate per top-level instruction: bytes written
    # (its output) + bytes read (operands that are other top-level values).
    per_op = defaultdict(lambda: [0, 0, 0])  # opcode -> [count, write, read]
    rows = []
    for name, opc in opcodes.items():
        wr = sizes.get(name, 0)
        rd = sum(sizes.get(a, 0) for a in operands.get(name, []))
        per_op[opc][0] += 1
        per_op[opc][1] += wr
        per_op[opc][2] += rd
        rows.append((wr + rd, name, opc))

    table = {
        opc: {"n": n, "write_gb": round(w / 1e9, 2), "read_gb": round(r / 1e9, 2)}
        for opc, (n, w, r) in sorted(
            per_op.items(), key=lambda kv: -(kv[1][1] + kv[1][2])
        )
    }
    rows.sort(reverse=True)
    top = [
        {"gb": round(t / 1e9, 3), "op": opc, "name": nm[:80]}
        for t, nm, opc in rows[:40]
    ]
    out = {"cost_tflop": round(ca.get("flops", 0) / 1e12, 2),
           "cost_gb": round(ca.get("bytes accessed", 0) / 1e9, 2),
           "by_opcode": table, "top_instructions": top}
    with open(os.path.join(OUT_DIR, "roofline.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(table, indent=2)[:3000])


if __name__ == "__main__":
    main()
