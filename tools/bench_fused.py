"""Measure the fused frame program's device service time at real shapes.

Builds a SLAM, runs the loop to steady state, captures the exact args of
the last _fused_fn dispatch, then re-dispatches in a dependent chain
(outputs feed the next call's state buffers; image/packed stay fixed but
the evolving state prevents transport dedup).

Usage: PYTHONPATH=... python tools/bench_fused.py [iters]
Env: CORR_ABL / CORR_NOSLOW etc. apply (kernel is traced in-process).
"""
import sys
import time

import numpy as np


def main():
    import jax

    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.slam import SLAM

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    ht, wd = 480, 752
    cfg = get_cfg()
    cfg.MOTION_PROBE_THR = -1.0
    slam = SLAM(cfg, network="cdv", ht=ht, wd=wd)

    rng = np.random.RandomState(0)
    frames = [(rng.rand(ht, wd, 3) * 255).astype(np.uint8) for _ in range(8)]
    intr = np.array([458.654, 457.296, 367.215, 248.375], np.float32)

    captured = {}
    orig_build = slam._build_fused

    real_fn = slam._fused_fn if getattr(slam, "_fused_fn", None) else None

    # capture by wrapping the bound _fused_fn attribute after it exists
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
    print("static kw:", {k: v for k, v in kw.items()}, file=sys.stderr)

    # the captured args are from the LAST warmup dispatch, whose donated
    # buffers were consumed by that dispatch -- refresh every donated slot
    # from the live post-warmup state before re-dispatching
    pg = slam.pg
    live = [pg.poses_, pg.patches_, pg.intrinsics_, pg.imap_, pg.gmap_,
            pg.fmap1_, pg.fmap2_, pg.colors_dev, pg.seg_dev, pg.scale_,
            pg.score_dev]
    for slot, val in zip(range(3, 14), live):
        args[slot] = val
    args[17], args[18], args[19] = pg.net, pg.target, pg.weight

    # arg positions (see runtime._fused_frame_update):
    # 0 params, 1 image, 2 seed, 3 poses, 4 patches, 5 intr, 6 imap,
    # 7 gmap, 8 f1, 9 f2, 10 colors, 11 seg, 12 scale, 13 score, 14 n,
    # 15 fac, 16 intr_row, 17 net, 18 target, 19 weight, 20 weight_mul,
    # 21 packed, 22 t0, 23 k0, 24 net_valid, 25 ht4, 26 wd4, 27 mi,
    # 28 mj, 29 shift_k, 30 shift_np
    # donated: 3..10, 17, 18, 19 -> refresh them from outputs each call
    state_in = [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 17, 18, 19]
    # fused returns: poses, patches, intr, imap, gmap, f1, f2, colors,
    # seg, scale, score, net, target, weight, mm, dP
    out = fn(*args, **kw)
    jax.block_until_ready(out[0])

    def set_state(args, out):
        for slot, val in zip(state_in, out[:14]):
            args[slot] = val
        return args

    args = set_state(args, out)
    args[29] = -1  # no pending shift in the chain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
        args = set_state(args, out)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"fused frame program: {dt*1e3:.2f} ms/call (chain of {iters})")


if __name__ == "__main__":
    main()
