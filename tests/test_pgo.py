"""Sim3 PGO test: drifted chain + perfect loop constraint -> drift removed."""
import numpy as np
import jax
import jax.numpy as jnp

from cdvslam_tpu.lie import SE3, Sim3, se3_inv, se3_mul, sim3_mul, sim3_inv
from cdvslam_tpu.ba.pgo import perform_updates, se3_to_sim3


def test_pgo_closes_loop():
    n = 20
    rng = np.random.RandomState(0)
    # GT: straight line returning to start (loop): frame n-1 == frame 0 pose
    gt = np.zeros((n, 7), np.float32)
    gt[:, 6] = 1.0
    th = np.linspace(0, 2 * np.pi, n)
    gt[:, 0] = np.sin(th)
    gt[:, 2] = 1 - np.cos(th)

    # drifted estimate: accumulate noisy relative motions
    est = [gt[0]]
    for i in range(1, n):
        rel = np.asarray(se3_mul(jnp.asarray(gt[i]), se3_inv(jnp.asarray(gt[i - 1]))))
        noise = np.asarray(
            SE3.exp(jnp.asarray(0.02 * rng.randn(6), jnp.float32)).data
        )
        rel = np.asarray(se3_mul(jnp.asarray(noise), jnp.asarray(rel)))
        est.append(np.asarray(se3_mul(jnp.asarray(rel), jnp.asarray(est[-1]))))
    est = np.stack(est).astype(np.float32)

    # loop constraint between last and first frame: the PHYSICAL relative
    # Sim3 mapping points in cam_{n-1}'s frame to cam_0's frame,
    # C = G_0 @ G_{n-1}^-1 with G = world->cam (what RANSAC-Umeyama
    # measures and what perform_updates' loop edges expect)
    Gi = se3_to_sim3(gt[n - 1])
    Gj = se3_to_sim3(gt[0])
    C = np.asarray(sim3_mul(jnp.asarray(Gj), sim3_inv(jnp.asarray(Gi))))[None]

    out = perform_updates(est, C, np.array([n - 1]), np.array([0]), iters=30)
    # out rows are corrected world->cam Sim3: the corrected relative
    # between frames n-1 and 0 must match the measurement
    rel = np.asarray(sim3_mul(jnp.asarray(out[0]),
                              sim3_inv(jnp.asarray(out[n - 1]))))
    err = np.abs(rel - C[0]).max()
    assert err < 2e-2, f"loop constraint violated by {err}"
    assert not np.any(np.isnan(out))


def test_pgo_wrong_frame_convention_is_detected():
    """Regression for the cam->world parameterization bug: feeding the
    physical measurement must ALSO recover the true absolute poses (up to
    gauge), not just satisfy the constraint in a conjugated frame. Uses a
    large-rotation trajectory where the conjugation error is ~90 deg."""
    from cdvslam_tpu.ba.pgo import run_pgo
    from cdvslam_tpu.lie import se3_exp

    n = 16
    rng = np.random.RandomState(1)
    gt = []
    for i in range(n):
        th = 2 * np.pi * i / (n - 1)
        xi = np.array([np.sin(th), 0, 1 - np.cos(th), 0.0, th, 0.0], np.float32)
        gt.append(np.asarray(se3_exp(jnp.asarray(xi))))
    gt = np.stack(gt)

    est = [gt[0]]
    for i in range(1, n):
        rel = np.asarray(se3_mul(jnp.asarray(gt[i]), se3_inv(jnp.asarray(gt[i - 1]))))
        noise = np.asarray(SE3.exp(jnp.asarray(0.03 * rng.randn(6), jnp.float32)).data)
        rel = np.asarray(se3_mul(jnp.asarray(noise), jnp.asarray(rel)))
        est.append(np.asarray(se3_mul(jnp.asarray(rel), jnp.asarray(est[-1]))))
    est = np.stack(est).astype(np.float32)

    C = np.asarray(sim3_mul(jnp.asarray(se3_to_sim3(gt[0])),
                            sim3_inv(jnp.asarray(se3_to_sim3(gt[n - 1])))))[None]
    safe_i, out = run_pgo(est, C, np.array([n - 1]), np.array([0]), iters=40)
    rel = np.array(sim3_mul(jnp.asarray(out[0]),
                            sim3_inv(jnp.asarray(out[n - 1]))))
    # quaternion double cover: q and -q are the same rotation
    if np.dot(rel[3:7], C[0, 3:7]) < 0:
        rel[3:7] = -rel[3:7]
    # endpoint relative must match the measurement tightly -- under the
    # conjugated (buggy) frame it lands ~2 rad away on this trajectory
    assert np.abs(rel - C[0]).max() < 5e-2, np.abs(rel - C[0]).max()
