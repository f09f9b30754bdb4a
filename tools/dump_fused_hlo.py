"""Dump the optimized HLO + cost analysis of the fused frame program.

Captures the exact dispatch args at steady state (like bench_fused),
AOT-lowers and compiles, then reports:
 - total bytes accessed / flops from compiled.cost_analysis()
 - every op in the optimized HLO whose output is >= 64 MB (the copy and
   fusion ops that would explain a donation/aliasing failure)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dump_fused_hlo.py [out.hlo]
"""
import re
import sys

import numpy as np


def main():
    import jax

    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.slam import SLAM

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fused.hlo"
    ht, wd = 480, 752
    cfg = get_cfg()
    cfg.MOTION_PROBE_THR = -1.0
    slam = SLAM(cfg, network="cdv", ht=ht, wd=wd)

    rng = np.random.RandomState(0)
    frames = [(rng.rand(ht, wd, 3) * 255).astype(np.uint8) for _ in range(8)]
    intr = np.array([458.654, 457.296, 367.215, 248.375], np.float32)

    captured = {}
    WARM = 60
    for f in range(WARM):
        slam(f, frames[f % len(frames)], intr)
        if getattr(slam, "_fused_fn", None) is not None and "wrapped" not in captured:
            captured["wrapped"] = True
            inner = slam._fused_fn

            def wrapper(*args, **kw):
                captured["args"] = args
                captured["kw"] = kw
                return inner(*args, **kw)

            slam._fused_fn = wrapper
            captured["inner"] = inner
    jax.block_until_ready(slam.pg.poses_)

    args, kw, fn = captured["args"], captured["kw"], captured["inner"]
    print("static kw:", kw, file=sys.stderr)
    lowered = fn.lower(*args, **kw)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print({k: f"{v:.3e}" for k, v in ca.items()
           if k in ("bytes accessed", "flops", "transcendentals",
                    "bytes accessed output", "optimal_seconds")})

    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"HLO written to {out_path} ({len(txt)/1e6:.1f} MB)")

    # find ops with big outputs
    pat = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\w+)\[([\d,]*)\]")
    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1, "f16": 2, "s64": 8, "u64": 8}
    rows = []
    for line in txt.splitlines():
        m = pat.match(line)
        if not m:
            continue
        name, dt, dims = m.groups()
        if dt not in dt_bytes or not dims:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * dt_bytes[dt]
        if b >= 64 * 1024 * 1024:
            op = line.strip().split("=", 1)[1].strip()[:140]
            rows.append((b, name, op))
    rows.sort(reverse=True)
    print(f"\nops with outputs >= 64 MB: {len(rows)}")
    for b, name, op in rows[:60]:
        print(f"{b/1e6:9.1f} MB  {name:40s} {op}")


if __name__ == "__main__":
    main()
