"""Measure the per-dispatch transport/service floor of the fused program.

Replays the EXACT captured fused-dispatch signature (same arg count,
same buffer shapes/dtypes, same donation pattern, same output count)
through a TRIVIAL passthrough program (one add per donated buffer so
nothing is DCE'd and state still evolves to defeat transport dedup).
Whatever this chain costs per call is pure dispatch/service overhead --
the compute-independent floor of the current one-dispatch-per-frame
design.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_dispatch_floor.py [iters] [nscalars]
  nscalars: with a second arg N, also measures a variant whose 12 host
  scalars are pre-packed into one device array (tests per-arg cost).
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

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
    pg = slam.pg
    live = [pg.poses_, pg.patches_, pg.intrinsics_, pg.imap_, pg.gmap_,
            pg.fmap1_, pg.fmap2_, pg.colors_dev, pg.seg_dev, pg.scale_,
            pg.score_dev]
    for slot, val in zip(range(3, 14), live):
        args[slot] = val
    args[17], args[18], args[19] = pg.net, pg.target, pg.weight
    args[29] = -1

    DONATED = (3, 4, 5, 6, 7, 8, 9, 10, 17, 18, 19)

    # passthrough with the same in/out surface as fused_fn: touch every
    # donated buffer (+1 on a cast of poses[0,0] threads data dependence)
    @jax.jit
    def passthrough(*a):
        bump = a[3][0, 0] * 1e-6
        outs = []
        for i in (3, 4, 5, 6, 7, 8, 9, 10):     # state buffers
            outs.append(a[i] + bump.astype(a[i].dtype))
        for i in (11, 12, 13):                   # seg/scale/score
            outs.append(a[i])
        for i in (17, 18, 19):                   # net/target/weight
            outs.append(a[i] + bump.astype(a[i].dtype))
        mm = jnp.zeros((2,), jnp.float32) + bump.astype(jnp.float32)
        dP = jnp.asarray([0., 0., 0., 0., 0., 0., 1.], jnp.float32)
        # reorder to the fused output layout (11 bufs, net, target, weight,
        # mm, dP)
        return (outs[0], outs[1], outs[2], outs[3], outs[4], outs[5],
                outs[6], outs[7], outs[8], outs[9], outs[10],
                outs[11], outs[12], outs[13], mm, dP)

    pfn = jax.jit(passthrough, donate_argnums=DONATED)

    def set_state(a, out):
        for slot, val in zip((3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13), out[:11]):
            a[slot] = val
        a[17], a[18], a[19] = out[11], out[12], out[13]
        return a

    # strip static kwargs: passthrough takes positional only
    out = pfn(*args)
    jax.block_until_ready(out[0])
    args = set_state(args, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pfn(*args)
        args = set_state(args, out)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"passthrough (31 args, 16 outs, donated): {dt*1e3:.2f} ms/call")

    # variant: only the 14 BIG buffers as args (scalars baked as consts)
    big_idx = (3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 17, 18, 19)

    @jax.jit
    def pass_small(*bufs):
        bump = bufs[0][0, 0] * 1e-6
        outs = [b + bump.astype(b.dtype) for b in bufs]
        return tuple(outs)

    psmall = jax.jit(pass_small, donate_argnums=tuple(range(14)))
    bufs = [args[i] for i in big_idx]
    out = psmall(*bufs)
    jax.block_until_ready(out[0])
    bufs = list(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = psmall(*bufs)
        bufs = list(out)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"passthrough (14 buf args only, donated): {dt*1e3:.2f} ms/call")

    # variant: ONE big buffer in/out
    @jax.jit
    def pass_one(x):
        return x + (x[0, 0, 0] * 1e-6).astype(x.dtype)

    pone = jax.jit(pass_one, donate_argnums=(0,))
    b = bufs[5]  # fmap1 (the biggest)
    b = pone(b)
    jax.block_until_ready(b)
    t0 = time.perf_counter()
    for _ in range(iters):
        b = pone(b)
    jax.block_until_ready(b)
    dt = (time.perf_counter() - t0) / iters
    print(f"passthrough (1 fmap1-sized arg, donated): {dt*1e3:.2f} ms/call")

    # variant: ONE small buffer in/out
    ps = jax.jit(lambda x: x + x[0] * 1e-6, donate_argnums=(0,))
    import jax.numpy as jnp
    s = jnp.zeros((4096, 7), jnp.float32)  # poses-sized (args[3] was donated away)
    s = ps(s)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = ps(s)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / iters
    print(f"passthrough (1 poses-sized arg, donated): {dt*1e3:.2f} ms/call")


if __name__ == "__main__":
    main()
