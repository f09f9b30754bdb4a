"""Host-side per-frame cost breakdown of the steady-state loop.

The box driving the TPU has ONE CPU core: any host work that does not
overlap device execution is frame time. This runs the bench loop with
runtime timers on and prints the median/total of every Timer segment
plus the end-to-end FPS, so host-bound and device-bound regimes are
distinguishable.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_host.py [frames]
"""
import sys
import time

import numpy as np


def main():
    frames_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    import jax

    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.slam import SLAM
    from cdvslam_tpu.utils.timer import ALL_TIMES

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
    ALL_TIMES.clear()
    slam.enable_timing = True

    slam.prefetch(frames[WARM % len(frames)])
    t0 = time.perf_counter()
    for f in range(WARM, WARM + frames_n):
        img = frames[f % len(frames)]
        slam.prefetch(frames[(f + 1) % len(frames)])
        slam(f, img, intr)
    jax.block_until_ready(slam.pg.poses_)
    dt = time.perf_counter() - t0
    print(f"loop: {frames_n / dt:.2f} FPS ({dt / frames_n * 1e3:.1f} ms/frame)")
    for name, vals in sorted(ALL_TIMES.items()):
        v = np.array(vals) * 1e3
        print(f"  {name:12s} n={len(v):4d} med={np.median(v):7.2f} ms "
              f"mean={v.mean():7.2f} total={v.sum():8.1f} ms "
              f"({v.sum() / (dt * 1e3) * 100:4.1f}% of loop)")


if __name__ == "__main__":
    main()
