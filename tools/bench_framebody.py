"""Dependent-chain timing of the standalone frame insert program.

Runs the SLAM to steady state, then re-dispatches slam._frame_fn (the
jitted frame_body: XFeat + DINO + selection + patchify + buffer insert)
in a dependent chain threading the donated state buffers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_framebody.py [iters]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.slam import SLAM

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ht, wd = 480, 752
    cfg = get_cfg()
    cfg.MOTION_PROBE_THR = -1.0
    slam = SLAM(cfg, network="cdv", ht=ht, wd=wd)

    rng = np.random.RandomState(0)
    frames = [(rng.rand(ht, wd, 3) * 255).astype(np.uint8) for _ in range(8)]
    intr = np.array([458.654, 457.296, 367.215, 248.375], np.float32)
    WARM = 60
    for f in range(WARM):
        slam(f, frames[f % len(frames)], intr)
    jax.block_until_ready(slam.pg.poses_)

    pg = slam.pg
    fn = slam._frame_fn
    img_dev = jax.device_put(
        jnp.asarray(frames[0].reshape(-1)))
    intr_row = jnp.asarray(intr / 4.0)

    state = [pg.poses_, pg.patches_, pg.intrinsics_, pg.imap_, pg.gmap_,
             pg.fmap1_, pg.fmap2_, pg.colors_dev, pg.seg_dev, pg.scale_,
             pg.score_dev]
    n = pg.n - 1
    out = fn(slam.cparams, img_dev, 0, *state, n, 1.0, True, intr_row)
    jax.block_until_ready(out[0])
    state = list(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(slam.cparams, img_dev, i, *state, n, 1.0, True, intr_row)
        state = list(out)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"frame_body program: {dt*1e3:.2f} ms/call (chain of {iters})")


if __name__ == "__main__":
    main()
