"""Attribute HBM traffic in an optimized HLO dump.

Parses the entry computation (and fusion bodies for metadata only),
estimating per-op traffic as output bytes + operand bytes (operands
resolved by name within the same computation when possible, else
skipped), then reports the top contributors grouped by the op_name
metadata prefix (the JAX source region).

Usage: python tools/hlo_traffic.py /tmp/fused_r5.hlo [top_n]
"""
import re
import sys
from collections import defaultdict

DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
            "s8": 1, "u8": 1, "pred": 1, "f16": 2, "s64": 8, "u64": 8,
            "f64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
OP_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(?:\(([^)]*)\)|(\w+\[[\d,]*\][^\s]*))\s+(\w+)\(")
META_RE = re.compile(r'op_name="([^"]+)"')


def shape_bytes(s):
    total = 0
    for dt, dims in SHAPE_RE.findall(s):
        if dt not in DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fused_r5.hlo"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    txt = open(path).read()

    # entry computation: the block beginning with "ENTRY"
    m = re.search(r"^ENTRY [^{]*\{(.*?)^\}", txt, re.S | re.M)
    if not m:
        print("no ENTRY computation found")
        return
    body = m.group(1)

    rows = []
    groups = defaultdict(float)
    kinds = defaultdict(float)
    total = 0.0
    for line in body.splitlines():
        om = OP_RE.match(line)
        if not om:
            continue
        name, tup, single, kind = om.groups()
        if kind in ("parameter", "constant", "get-tuple-element", "tuple",
                    "bitcast"):
            continue
        out_b = shape_bytes(tup or single or "")
        # rough traffic: output written once; operands read once (count
        # the operand SHAPES mentioned on the line after the opcode)
        args_part = line.split(kind + "(", 1)[-1]
        in_b = shape_bytes(args_part)
        b = out_b + in_b
        if b < 1e6:
            continue
        meta = META_RE.search(line)
        tag = meta.group(1) if meta else f"<{kind}>"
        # compress the tag to the interesting suffix
        tag = "/".join(tag.split("/")[-3:])[:90]
        rows.append((b, name, kind, tag, out_b))
        groups[tag] += b
        kinds[kind] += b
        total += b

    print(f"total estimated traffic (ops >= 1 MB): {total/1e9:.2f} GB")
    print("\n--- by op kind ---")
    for k, v in sorted(kinds.items(), key=lambda x: -x[1])[:15]:
        print(f"{v/1e9:8.2f} GB  {k}")
    print(f"\n--- top {top_n} source regions ---")
    for k, v in sorted(groups.items(), key=lambda x: -x[1])[:top_n]:
        print(f"{v/1e9:8.2f} GB  {k}")
    print(f"\n--- top {top_n} single ops ---")
    rows.sort(reverse=True)
    for b, name, kind, tag, out_b in rows[:top_n]:
        print(f"{b/1e6:9.1f} MB (out {out_b/1e6:7.1f})  {kind:28s} {tag}")


if __name__ == "__main__":
    main()
