"""Proximity loop closure + global BA end-to-end test.

A 44-frame orbit closes a full circle; with LOOP_CLOSURE enabled the
proximity backend must generate long-range edges and the block-sparse
global BA must run and keep the trajectory consistent.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cdvslam_tpu.config import get_cfg
from cdvslam_tpu.eval import ate_rmse
from cdvslam_tpu.slam import SLAM
from cdvslam_tpu.lie import se3_inv

from synth import SynthScene, OracleUpdate, make_gt_poses


def _run(lc: bool, F=56):
    cfg = get_cfg()
    cfg.PATCHES_PER_FRAME = 24
    cfg.BUFFER_SIZE = 96
    cfg.CENTROID_SEL_STRAT = "RANDOM"
    cfg.MOTION_PROBE_THR = 0.2
    cfg.KEYFRAME_THRESH = 0.5
    cfg.LOOP_CLOSURE = lc
    cfg.BACKEND_THRESH = 40.0
    cfg.GLOBAL_OPT_FREQ = 10
    cfg.MAX_EDGE_AGE = 96

    ht, wd = 192, 256
    intr = np.array([200.0, 200.0, 128.0, 96.0], np.float32)
    gt = make_gt_poses(F, motion="orbit", step=2 * np.pi / (F - 14), yaw_factor=1.0)
    scene = SynthScene(intr / 4)

    slam = SLAM(cfg, network="dpv", ht=ht, wd=wd, update_override=lambda *a: None)
    oracle = OracleUpdate(slam, scene, gt)
    slam.update_override = oracle
    img = (np.random.RandomState(0).rand(ht, wd, 3) * 255).astype(np.uint8)
    for f in range(F):
        before = slam.pg.counter
        slam(f, img, intr)
        oracle.register_frame(before)
    poses, tstamps = slam.terminate()
    gt_wc = np.asarray(se3_inv(jnp.asarray(gt)))
    ate = ate_rmse(poses[:, :3], gt_wc[:, :3])
    path = float(np.sum(np.linalg.norm(np.diff(gt_wc[:, :3], axis=0), axis=1)))
    return ate, path, slam


@pytest.mark.slow
def test_loop_closure_runs_and_tracks():
    ate_lc, path, slam = _run(lc=True)
    # global BA must actually have been triggered by long-range edges
    assert slam.ran_global_ba[: slam.pg.n + 1].any(), "global BA never ran"
    assert np.isfinite(ate_lc)
    assert ate_lc < 0.08 * path, f"ATE {ate_lc} vs path {path}"
