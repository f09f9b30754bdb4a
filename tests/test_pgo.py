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

    # loop constraint between last and first frame with the TRUE relative
    # Sim3: C = Tj_true @ Ti_true^-1 where T = Sim3(inv(pose))
    Ti = se3_to_sim3(np.asarray(se3_inv(jnp.asarray(gt[n - 1]))))
    Tj = se3_to_sim3(np.asarray(se3_inv(jnp.asarray(gt[0]))))
    C = np.asarray(sim3_mul(jnp.asarray(Tj), sim3_inv(jnp.asarray(Ti))))[None]

    drift_before = np.linalg.norm(
        np.asarray(se3_inv(jnp.asarray(est[n - 1])))[:3]
        - np.asarray(se3_inv(jnp.asarray(gt[n - 1])))[:3]
    )

    out = perform_updates(est, C, np.array([n - 1]), np.array([0]), iters=30)
    # out is Sim3 Exp(Ginv)^-1 ~ Sim3(inv(pose))^-1 = Sim3(pose)... check loop:
    # the corrected relative between frames n-1 and 0 must match C
    Gi = np.asarray(sim3_inv(jnp.asarray(out[n - 1])))
    Gj = np.asarray(sim3_inv(jnp.asarray(out[0])))
    rel = np.asarray(sim3_mul(jnp.asarray(Gj), sim3_inv(jnp.asarray(Gi))))
    err = np.abs(rel - C[0]).max()
    assert err < 2e-2, f"loop constraint violated by {err}"
    assert not np.any(np.isnan(out))
