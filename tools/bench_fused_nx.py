"""Separate per-dispatch transport service from device compute.

Chains the fused frame body K times INSIDE one jitted program (state
threads through; image/packed stay fixed -- shapes identical, state
evolution defeats transport dedup) and compares ms/frame against the
K=1 dependent chain. If K=2 halves the per-frame cost, the steady-state
loop is bounded by program-boundary service time, not device compute.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_fused_nx.py [K] [iters]
"""
import sys
import time

import numpy as np


def main():
    import jax

    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.slam import SLAM

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
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

    args = list(captured["args"])
    kw = captured["kw"]
    fn = captured["inner"]

    pg = slam.pg
    live = [pg.poses_, pg.patches_, pg.intrinsics_, pg.imap_, pg.gmap_,
            pg.fmap1_, pg.fmap2_, pg.colors_dev, pg.seg_dev, pg.scale_,
            pg.score_dev]
    for slot, val in zip(range(3, 14), live):
        args[slot] = val
    args[17], args[18], args[19] = pg.net, pg.target, pg.weight
    args[29] = -1  # no pending shift

    state_in = [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 17, 18, 19]

    def chain_k(*a):
        aa = list(a)
        outs = None
        for _ in range(K):
            outs = fn(*aa, **kw)
            for slot, val in zip(state_in, outs[:14]):
                aa[slot] = val
        return outs

    cfn = jax.jit(chain_k, donate_argnums=tuple(state_in))

    def set_state(a, out):
        for slot, val in zip(state_in, out[:14]):
            a[slot] = val
        return a

    out = cfn(*args)
    jax.block_until_ready(out[0])
    args = set_state(args, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = cfn(*args)
        args = set_state(args, out)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"K={K}: {dt*1e3:.2f} ms/dispatch = {dt*1e3/K:.2f} ms/frame "
          f"(chain of {iters})")


if __name__ == "__main__":
    main()
