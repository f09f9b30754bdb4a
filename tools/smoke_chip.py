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


def corr_parity():
    """Value-level parity of the Pallas corr kernel vs the XLA gather
    oracle ON THE DEVICE, both pyramid levels, fast path AND forced
    fallback path. A wrong-but-finite kernel (layout/plan bug) passes
    the finite-poses smoke; this catches it. Returns (ok, report)."""
    import jax
    import jax.numpy as jnp

    from cdvslam_tpu.ops import corr as corr_xla
    from cdvslam_tpu.ops.corr_pallas import (
        corr_epad, corr_pallas_padded, make_cell_plan, pad_fmap,
        plan_corr_order)

    rng = np.random.RandomState(3)
    K, C, P, NF, E = 256, 24, 3, 6, 512
    report, ok = [], True
    for lvl, (H, W) in enumerate([(120, 188), (30, 47)]):
        gmap = jnp.asarray(rng.randn(1, K, C, P, P), jnp.bfloat16)
        fmap = jnp.asarray(rng.randn(1, NF, C, H, W), jnp.bfloat16)
        fpad = pad_fmap(fmap)
        ii = jnp.asarray(rng.randint(0, K, E), jnp.int32)
        jj = jnp.asarray(np.sort(rng.randint(0, NF, E)), jnp.int32)
        # coords spread over the frame INCLUDING out-of-image borders
        # (taps past the edge must read zero, reference semantics)
        x = rng.uniform(-4, W + 3, (1, E, 1, 1)) + rng.uniform(-1, 1, (1, E, P, P))
        y = rng.uniform(-4, H + 3, (1, E, 1, 1)) + rng.uniform(-1, 1, (1, E, P, P))
        coords = jnp.asarray(np.stack([x, y], 2).astype(np.float32))
        EP = corr_epad(E, NF)

        want = np.asarray(corr_xla(
            gmap.astype(jnp.float32), fmap.astype(jnp.float32), coords,
            ii, jj)).astype(np.float32)
        scale = max(np.abs(want).max(), 1.0)

        plans = {
            "cell": jax.jit(make_cell_plan, static_argnums=(2, 3, 4, 5))(
                coords[0], jj, NF, EP, H, W),
            # frame-only plan: poor locality, most chunks take the exact
            # slow-path fallback -- covers the fallback code path
            "frame-only": tuple(map(jnp.asarray, plan_corr_order(
                np.asarray(jj), NF, EP))),
        }
        for tag, plan in plans.items():
            got = np.asarray(corr_pallas_padded(
                gmap, fpad, coords, ii, jj, H, W, plan=plan)
            ).astype(np.float32)
            err = np.abs(got - want).max() / scale
            good = bool(err < 3e-2)  # bf16 kernel vs f32 oracle
            ok &= good
            report.append(f"corr parity L{lvl + 1}/{tag}: "
                          f"rel_err={err:.4f} {'ok' if good else 'FAIL'}")
    return ok, report


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

    # VALUE-level corr parity on the device (wrong-but-finite kernel
    # output would pass the loop check above; this catches it)
    pok, report = corr_parity()
    for line in report:
        print(line)
    ok = ok and pok

    status = "PASS" if ok else "FAIL"
    print(
        f"smoke_chip {status}: backend={backend} frames={NFRAMES} n={n} "
        f"init={slam.is_initialized} finite_poses={np.isfinite(poses[:n]).all()} "
        f"corr_parity={pok} wall={dt:.1f}s"
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
