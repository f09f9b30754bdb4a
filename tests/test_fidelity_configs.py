"""Five fidelity-config smoke runs (VERDICT r2 Next #8).

Each BASELINE.md fidelity config executes END-TO-END through the real
eval path (eval.harness.run_sequence: reader thread, calib parsing, SLAM
loop, terminate) on a committed-code rendered sequence with random
weights -- catching wiring rot in any preset so real-checkpoint runs are
turnkey. Configs (BASELINE.md targets table):

  1. CDVO odometry             (config/default_cdvo.yaml, version=cdv)
  2. EuRoC-style CDVO          (default_cdvo.yaml, stride 2 -- the
                                evaluate_euroc.py invocation)
  3. CDV-SLAM with proximity LC (default_cdvslam.yaml)
  4. CDV-SLAM++ classic LC + seg/depth heads (default_cdvslam++.yaml,
     heads forced to random init -- no checkpoints in this environment)
  5. DPVO backward-compat mode (default_dpvo.yaml, version=dpv)
"""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cdvslam_tpu.eval.harness import load_cfg, run_sequence

from render_plane import PlaneScene, overhead_loop_poses

HT, WD = 192, 256
INTR = np.array([220.0, 220.0, 128.0, 96.0], np.float32)
F = 20


@pytest.fixture(scope="module")
def sequence_dir(tmp_path_factory):
    """Render a 20-frame textured-plane sequence to PNGs + calib file."""
    d = tmp_path_factory.mktemp("seq")
    imgdir = d / "images"
    imgdir.mkdir()
    scene = PlaneScene(INTR, HT, WD, seed=5)
    gt = overhead_loop_poses(F)
    for f in range(F):
        img = scene.render(gt[f])
        cv2.imwrite(str(imgdir / f"{f:06d}.png"), img[..., ::-1])
    calib = d / "calib.txt"
    calib.write_text(" ".join(str(float(x)) for x in INTR))
    return str(imgdir), str(calib)


class _Args:
    def __init__(self, config):
        self.config = config
        self.backend_thresh = 96.0
        self.opts = []


def _smoke(sequence_dir, config, version, stride=1, opts=()):
    imagedir, calib = sequence_dir
    cfg = load_cfg(_Args(config))
    cfg.merge_from_list(list(opts))
    cfg.BUFFER_SIZE = 64
    traj, tstamps = run_sequence(cfg, imagedir, calib, stride=stride,
                                 version=version)
    nexp = len(range(0, F, stride))
    assert traj.shape == (nexp, 7), traj.shape
    assert np.all(np.isfinite(traj)), "non-finite poses"
    return traj


@pytest.mark.slow
def test_config_cdvo(sequence_dir):
    _smoke(sequence_dir, "config/default_cdvo.yaml", "cdv")


@pytest.mark.slow
def test_config_euroc_stride2(sequence_dir):
    # the evaluate_euroc.py invocation: default_cdvo at stride 2
    _smoke(sequence_dir, "config/default_cdvo.yaml", "cdv", stride=2)


@pytest.mark.slow
def test_config_cdvslam_proximity_lc(sequence_dir):
    # TUM-style: proximity loop closure on, classic off
    _smoke(sequence_dir, "config/default_cdvslam.yaml", "cdv",
           opts=["CLASSIC_LOOP_CLOSURE", "False"])


@pytest.mark.slow
def test_config_cdvslam_pp_classic(sequence_dir):
    # KITTI-style CDV-SLAM++: classic LC backend + seg/depth heads; heads
    # forced to random init (checkpoints don't exist here), SCORE
    # selection exercises the seg-filter path
    _smoke(sequence_dir, "config/default_cdvslam++.yaml", "cdv",
           opts=["SEG_HEAD", "random", "DEPTH_HEAD", "random",
                 "LOOP_RETR_THRESH", "2.0"])


@pytest.mark.slow
def test_config_dpvo_compat(sequence_dir):
    _smoke(sequence_dir, "config/default_dpvo.yaml", "dpv")
