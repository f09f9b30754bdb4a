"""FUSE_ABL knockout budget in ONE process.

bench_fused.py per ablation re-pays the full 60-frame warmup compile
(~13 min on the remote transport); this tool warms up once, captures the
steady-state args, then for each ablation sets FUSE_ABL in-process,
builds a fresh fused_fn via slam._build_fused() (the env is read at
TRACE time), and times a dependent chain -- one fused-program compile
(~1-2 min) per ablation instead of a dozen warmup compiles.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python tools/bench_abl_sweep.py [iters] [abl1 abl2 ...]

Tokens of the form ``ENV:VAR=VAL[,VAR2=VAL2...]`` sweep trace-time env
knobs instead of FUSE_ABL (e.g. ``ENV:BA_ASSEMBLY=onehot``): the knob is
set, the fused program re-traced, timed, and the knob restored. Only
works for knobs read at TRACE time (BA_ASSEMBLY); corr module constants
(CORR_YC etc.) are import-time and need a fresh process.
"""
import os
import sys
import time

import numpy as np

DEFAULT_ABLS = ["", "no_frame", "no_corr", "no_shiftg", "no_ba",
                "no_update", "no_updatebody", "no_feat", "no_dino",
                "no_netgather", "no_transform"]


def main():
    import jax

    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.slam import SLAM

    args_cli = sys.argv[1:]
    iters = int(args_cli[0]) if args_cli else 30
    abls = args_cli[1:] if len(args_cli) > 1 else DEFAULT_ABLS

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

            def wrapper(*a, **kw):
                captured["args"] = a
                captured["kw"] = kw
                return inner(*a, **kw)

            slam._fused_fn = wrapper
            captured["inner"] = inner
    jax.block_until_ready(slam.pg.poses_)

    kw = dict(captured["kw"])
    print("static kw:", kw, file=sys.stderr)
    base_args = list(captured["args"])
    pg = slam.pg
    live = [pg.poses_, pg.patches_, pg.intrinsics_, pg.imap_, pg.gmap_,
            pg.fmap1_, pg.fmap2_, pg.colors_dev, pg.seg_dev, pg.scale_,
            pg.score_dev]
    # hold HOST copies of every donated slot so each ablation starts from
    # identical state and chains on its own outputs
    state_in = [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 17, 18, 19]
    for slot, val in zip(range(3, 14), live):
        base_args[slot] = val
    base_args[17], base_args[18], base_args[19] = pg.net, pg.target, pg.weight
    base_args[29] = -1
    host_copies = {i: np.asarray(base_args[i]) for i in state_in}

    results = {}
    for abl in abls:
        envset = {}
        if abl.startswith("ENV:"):
            for kv in abl[4:].split(","):
                k, _, v = kv.partition("=")
                envset[k] = v
            os.environ["FUSE_ABL"] = ""
            os.environ.update(envset)
        else:
            os.environ["FUSE_ABL"] = abl
        fn = slam._build_fused()           # re-traces with the new env
        args = list(base_args)
        for i in state_in:
            args[i] = jax.device_put(host_copies[i])
        try:
            out = fn(*args, **kw)
            jax.block_until_ready(out[0])

            # outputs: 11 buffers, net, target, weight, mm, dP
            def set_state(a, o):
                for slot, val in zip(range(3, 14), o[:11]):
                    a[slot] = val
                a[17], a[18], a[19] = o[11], o[12], o[13]
                return a

            args = set_state(args, out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args, **kw)
                args = set_state(args, out)
            jax.block_until_ready(out[0])
            dt = (time.perf_counter() - t0) / iters * 1e3
            results[abl] = dt
            print(f"FUSE_ABL={abl or '(none)':<16s} {dt:7.2f} ms/call")
        except Exception as e:  # noqa: BLE001
            print(f"FUSE_ABL={abl or '(none)':<16s} FAILED: {type(e).__name__}: {e}")
        for k in envset:
            os.environ.pop(k, None)
        sys.stdout.flush()
    os.environ.pop("FUSE_ABL", None)

    if "" in results:
        total = results[""]
        print(f"\nmarginals vs total {total:.2f} ms:")
        for abl, dt in results.items():
            if abl:
                print(f"  {abl:<16s} {total - dt:6.2f} ms")


if __name__ == "__main__":
    main()
