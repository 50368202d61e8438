"""Rough byte accounting over an optimized HLO text dump.

For each top-level instruction in the entry computation, estimate HBM
traffic as (output bytes + operand bytes where operands are other
top-level values). Groups by opcode. This over-counts fused reads a bit
but ranks where the bytes go well enough to target optimizations.

Usage: python scripts/analyze_hlo.py outputs/perf_r3/fwd_bwd_hlo.txt
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1,
    "f16": 2, "s64": 8, "u64": 8, "f64": 8,
}

SHAPE_RE = re.compile(r"(f32|bf16|s32|u32|pred|s8|u8|f16|s64|u64|f64)\[([0-9,]*)\]")


def shape_bytes(type_str: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(type_str):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main(path: str) -> None:
    text = open(path).read()
    # Find the entry computation: the one marked ENTRY.
    m = re.search(r"ENTRY [^\{]+\{(.*?)\n\}", text, re.S)
    if not m:
        print("no ENTRY computation found")
        return
    body = m.group(1)

    # instruction lines: "%name = <type-with-layout-tiles> opcode(...)".
    # Types may contain parens (tile specs T(8,128)) and tuple commas, so
    # locate the opcode token (lowercase word followed by '(') and treat
    # everything between '=' and it as the result type.
    sizes = {}
    opcodes = {}
    op_re = re.compile(r" ([a-z][\w\-]*)\(")
    for line in body.splitlines():
        line = line.strip()
        if not line.startswith(("%", "ROOT")):
            continue
        if " = " not in line:
            continue
        name, rhs = line.split(" = ", 1)
        name = name.replace("ROOT ", "").strip()
        m2 = op_re.search(rhs)
        if not m2:
            continue
        type_str = rhs[: m2.start()]
        sizes[name] = shape_bytes(type_str)
        opcodes[name] = m2.group(1)

    by_op = defaultdict(lambda: [0, 0])  # opcode -> [count, bytes_out]
    rows = []
    for name, opcode in opcodes.items():
        out_b = sizes[name]
        by_op[opcode][0] += 1
        by_op[opcode][1] += out_b
        rows.append((out_b, opcode, name))

    print("== output bytes by opcode (entry computation) ==")
    for opcode, (cnt, b) in sorted(by_op.items(), key=lambda kv: -kv[1][1]):
        print(f"{opcode:30s} n={cnt:4d}  out={b/1e9:7.2f} GB")
    total = sum(b for _, (_, b) in by_op.items())
    print(f"{'TOTAL out':30s}        {total/1e9:7.2f} GB")

    print("\n== top 30 instructions by output bytes ==")
    for out_b, opcode, name in sorted(rows, reverse=True)[:30]:
        print(f"{out_b/1e6:9.1f} MB  {opcode:24s} {name[:80]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "outputs/perf_r3/fwd_bwd_hlo.txt")
