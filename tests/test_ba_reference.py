"""Prove ba_solve matches the REFERENCE CUDA BA semantics, and that the
fixed-lag-window drift profile is the windowing POLICY, not our solver.

VERDICT r2 item 4: BASELINE.md claims the 11.4%-of-path oracle drift at
OPT_WINDOW=10 is what the reference's own window policy produces on the
fast-yaw orbit. These tests back that with numbers: a literal numpy
transcription of ba_cuda.cu (tests/ba_numpy_ref.py) (a) agrees with
ba_solve step-for-step on random problems, and (b) produces the same
drift when swapped into the full runtime via SLAM.ba_override.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cdvslam_tpu.ba import ba_solve, INFERENCE_PARAMS
from cdvslam_tpu.config import get_cfg
from cdvslam_tpu.eval import ate_rmse
from cdvslam_tpu.lie import se3_exp, se3_inv
from cdvslam_tpu.slam import SLAM

from ba_numpy_ref import ba_numpy_reference
from synth import SynthScene, OracleUpdate, make_gt_poses


def _random_problem(seed, NP=6, K=24, E=96, P=3):
    rng = np.random.RandomState(seed)
    intr = np.array([120.0, 120.0, 96.0, 64.0], np.float32)
    xi = rng.randn(NP, 6).astype(np.float32) * 0.05
    xi[:, :3] += np.linspace(0, 1, NP)[:, None] * np.array([0.3, 0.0, 0.1])
    poses = np.asarray(se3_exp(jnp.asarray(xi)))
    patches = np.zeros((K, 3, P, P), np.float32)
    px = rng.uniform(20, 170, K).astype(np.float32)
    py = rng.uniform(20, 110, K).astype(np.float32)
    gx, gy = np.meshgrid(np.arange(P) - P // 2, np.arange(P) - P // 2)
    patches[:, 0] = px[:, None, None] + gx
    patches[:, 1] = py[:, None, None] + gy
    patches[:, 2] = rng.uniform(0.3, 1.5, K)[:, None, None]
    ii = rng.randint(0, NP, E)
    jj = (ii + 1 + rng.randint(0, NP - 1, E)) % NP
    kk = rng.randint(0, K, E)
    # target = reprojection at perturbed state + noise
    from cdvslam_tpu.geom import transform
    from cdvslam_tpu.lie import SE3
    coords = transform(SE3(jnp.asarray(poses)[None]),
                       jnp.asarray(patches)[None],
                       jnp.broadcast_to(jnp.asarray(intr), (1, NP, 4)),
                       jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk))
    target = np.asarray(coords[0, :, P // 2, P // 2, :]) + \
        rng.randn(E, 2).astype(np.float32) * 1.5
    weight = rng.uniform(0.3, 1.0, (E, 2)).astype(np.float32)
    return poses, patches, intr, target, weight, ii, jj, kk


@pytest.mark.parametrize("seed,t0,iters", [(0, 1, 2), (1, 2, 2), (2, 1, 4)])
def test_ba_matches_reference_transcription(seed, t0, iters):
    """ba_solve (scatter assembly) == the literal ba_cuda.cu transcription."""
    poses, patches, intr, target, weight, ii, jj, kk = _random_problem(seed)
    NP, K = poses.shape[0], patches.shape[0]
    N = NP - t0

    p_ref, pt_ref = ba_numpy_reference(
        poses, patches, intr, target, weight, ii, jj, kk,
        t0=t0, t1=NP, iterations=iters)

    p_our, pt_our = ba_solve(
        jnp.asarray(poses), jnp.asarray(patches), jnp.asarray(intr),
        jnp.asarray(target), jnp.asarray(weight),
        jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32),
        jnp.asarray(kk, jnp.int32), jnp.ones(len(ii), bool), t0,
        N=N, K=K, iterations=iters, params=INFERENCE_PARAMS)
    p_our, pt_our = np.asarray(p_our), np.asarray(pt_our)

    # quaternion sign is gauge
    qs = np.sign(np.sum(p_our[:, 3:] * p_ref[:, 3:], axis=1))[:, None]
    assert np.allclose(p_our[:, :3], p_ref[:, :3], atol=2e-3), \
        np.abs(p_our[:, :3] - p_ref[:, :3]).max()
    assert np.allclose(p_our[:, 3:] * qs, p_ref[:, 3:], atol=2e-3)
    assert np.allclose(pt_our[:, 2, 0, 0], pt_ref[:, 2, 0, 0], atol=2e-3), \
        np.abs(pt_our[:, 2, 0, 0] - pt_ref[:, 2, 0, 0]).max()


def _orbit_ate(ba_override, F=40, opt_window=10):
    cfg = get_cfg()
    cfg.PATCHES_PER_FRAME = 24
    cfg.BUFFER_SIZE = 96
    cfg.CENTROID_SEL_STRAT = "RANDOM"
    cfg.MOTION_PROBE_THR = 0.2
    cfg.KEYFRAME_THRESH = 0.5
    cfg.LOOP_CLOSURE = False
    cfg.MAX_EDGE_AGE = 96
    cfg.OPTIMIZATION_WINDOW = opt_window
    F_ = F
    ht, wd = 192, 256
    intr = np.array([200.0, 200.0, 128.0, 96.0], np.float32)
    gt = make_gt_poses(F_, motion="orbit", step=2 * np.pi / (F_ - 14),
                       yaw_factor=1.0)
    scene = SynthScene(intr / 4)
    slam = SLAM(cfg, network="dpv", ht=ht, wd=wd,
                update_override=lambda *a: None)
    oracle = OracleUpdate(slam, scene, gt)
    slam.update_override = oracle
    slam.ba_override = ba_override
    img = (np.random.RandomState(0).rand(ht, wd, 3) * 255).astype(np.uint8)
    for f in range(F_):
        before = slam.pg.counter
        slam(f, img, intr)
        oracle.register_frame(before)
    poses, _ = slam.terminate()
    gt_wc = np.asarray(se3_inv(jnp.asarray(gt)))
    ate = ate_rmse(poses[:, :3], gt_wc[:, :3])
    path = float(np.sum(np.linalg.norm(np.diff(gt_wc[:, :3], axis=0), axis=1)))
    return ate / path


def _numpy_ref_adapter(poses, patches_win, intr, target, weight,
                       ii, jj, kk, mask, t0, NW, iters):
    """SLAM.ba_override shim: run the reference-semantics numpy BA on the
    valid edges and return updated (poses, window patches)."""
    poses = np.asarray(poses)
    sel = np.asarray(mask).astype(bool)
    p, pw = ba_numpy_reference(
        poses, np.asarray(patches_win), np.asarray(intr),
        np.asarray(target)[sel], np.asarray(weight)[sel],
        np.asarray(ii)[sel], np.asarray(jj)[sel], np.asarray(kk)[sel],
        t0=int(t0), t1=min(int(t0) + NW, poses.shape[0]),
        iterations=int(iters))
    return p, pw


@pytest.mark.slow
def test_window_drift_matches_reference_semantics():
    """At the reference's own OPT_WINDOW=10 the fast-yaw orbit drifts the
    same way under OUR solver and under the literal reference-semantics
    numpy BA: the drift is the fixed-lag windowing policy (BASELINE.md),
    not our solver numerics."""
    drift_ours = _orbit_ate(None)
    drift_ref = _orbit_ate(_numpy_ref_adapter)
    # same profile: both drift substantially (policy) and within a band
    # of each other (solver parity at trajectory level)
    assert drift_ref > 0.05, \
        f"reference semantics did NOT drift at OPT_WINDOW=10: {drift_ref:.3f}"
    assert 0.5 < drift_ours / drift_ref < 2.0, \
        f"drift mismatch: ours {drift_ours:.3f} vs reference {drift_ref:.3f}"
