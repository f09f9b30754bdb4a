"""Profile the HOST side of the steady-state loop (cProfile over bench's
loop shape) to find where per-frame wall time goes beyond the device
program. Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_host.py [frames]
"""
import cProfile
import pstats
import sys
import time

import numpy as np


def main():
    import jax

    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.slam import SLAM

    nframes = int(sys.argv[1]) if len(sys.argv) > 1 else 60
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

    pr = cProfile.Profile()
    slam.prefetch(frames[WARM % len(frames)])
    t0 = time.perf_counter()
    pr.enable()
    for f in range(WARM, WARM + nframes):
        img = frames[f % len(frames)]
        slam.prefetch(frames[(f + 1) % len(frames)])
        slam(f, img, intr)
    pr.disable()
    jax.block_until_ready(slam.pg.poses_)
    dt = time.perf_counter() - t0
    print(f"{nframes} frames: {dt:.2f}s = {nframes/dt:.2f} fps "
          f"({dt/nframes*1e3:.1f} ms/frame)", file=sys.stderr)
    st = pstats.Stats(pr, stream=sys.stderr)
    st.sort_stats("cumulative").print_stats(35)


if __name__ == "__main__":
    main()
