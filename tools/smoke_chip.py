"""On-chip smoke test: MUST run green before every end-of-round snapshot.

Runs ~20 frames of the full CDV loop on the REAL device (no forced-CPU
conftest): motion probe + init (12x update) + fused steady state +
keyframe shift, then asserts finite poses and patches. Exits 0 on
success, 1 on failure, printing a one-line verdict.

Round-3 postmortem: the 116-test CPU suite was green while HEAD crashed
every update-shaped program on the TPU (packed-row misalignment fed the
Pallas corr kernel out-of-range frame ids). Interpret-mode parity cannot
catch device-only faults -- this tool is the gate that can.

Usage: python tools/smoke_chip.py  [~2 min incl. compilation]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    backend = jax.default_backend()
    print(f"backend: {backend}; devices: {jax.devices()}", file=sys.stderr)

    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.slam import SLAM

    ht, wd = 480, 752
    cfg = get_cfg()
    # exercise the REAL motion-probe dispatch (bench.py skips it via
    # THR=-1; the smoke must cover it -- it was the round-3 crash site).
    # THR=0.0 still gates nothing (probe >= 0) but dispatches + syncs.
    cfg.MOTION_PROBE_THR = 0.0

    slam = SLAM(cfg, network="cdv", ht=ht, wd=wd)

    rng = np.random.RandomState(0)
    frames = [(rng.rand(ht, wd, 3) * 255).astype(np.uint8) for _ in range(6)]
    intr = np.array([458.654, 457.296, 367.215, 248.375], np.float32)

    NFRAMES = 20
    t0 = time.perf_counter()
    for f in range(NFRAMES):
        slam(f, frames[f % len(frames)], intr)
    jax.block_until_ready(slam.pg.poses_)
    dt = time.perf_counter() - t0

    poses = np.asarray(slam.pg.poses_)
    patches = np.asarray(slam.pg.patches_)
    n = slam.pg.n
    ok = (
        slam.is_initialized
        and n >= 8
        and np.isfinite(poses[:n]).all()
        and np.isfinite(patches[: n * slam.M]).all()
        and np.abs(np.linalg.norm(poses[:n, 3:], axis=-1) - 1.0).max() < 1e-3
    )
    status = "PASS" if ok else "FAIL"
    print(
        f"smoke_chip {status}: backend={backend} frames={NFRAMES} n={n} "
        f"init={slam.is_initialized} finite_poses={np.isfinite(poses[:n]).all()} "
        f"wall={dt:.1f}s"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        print(f"smoke_chip FAIL: {type(e).__name__}: {e}")
        sys.exit(1)
