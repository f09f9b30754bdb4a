"""Per-section breakdown of the steady-state frame loop (TPU).

Same workload as bench.py but with slam.enable_timing, which blocks on
device results per section (so the absolute total is slower than the
pipelined loop; the split is what matters).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_frame.py [frames]
"""
import sys

import numpy as np


def main():
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
    TIMED = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    for f in range(WARM):
        slam(f, frames[f % len(frames)], intr)
    jax.block_until_ready(slam.pg.poses_)

    slam.enable_timing = True
    ALL_TIMES.clear()
    for f in range(WARM, WARM + TIMED):
        slam(f, frames[f % len(frames)], intr)
    jax.block_until_ready(slam.pg.poses_)

    total = 0.0
    for name, ts in sorted(ALL_TIMES.items()):
        ts = ts[2:] if len(ts) > 4 else ts
        m = float(np.mean(ts)) * 1e3
        total += m * len(ts) / max(len(ts), 1)
        print(f"{name:16s} {m:8.2f} ms  (n={len(ts)}, med={np.median(ts)*1e3:.2f})")
    print(f"{'TOTAL(sum)':16s} {total:8.2f} ms")


if __name__ == "__main__":
    main()
