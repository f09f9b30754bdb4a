"""Five fidelity-config smoke runs (VERDICT r2 Next #8, r3 Next #6).

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

Round-4 hardening (VERDICT r3 Weak #5): with random weights the motion
probe rejected every frame, so 4 of the 5 smokes never initialized --
update, BA, keyframing and BOTH loop-closure paths never executed in the
tests named after them. Every run now forces probe acceptance
(MOTION_PROBE_THR=-1, the bench trick; the probe dispatch is skipped
entirely, runtime.py) and asserts the NAMED feature fired via the
runtime's stats counters: updates ran, proximity edges were appended,
a classic-LC closure was attempted.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cdvslam_tpu.eval.harness import load_cfg, run_sequence

from render_plane import PlaneScene, overhead_loop_poses

HT, WD = 192, 256
INTR = np.array([220.0, 220.0, 128.0, 96.0], np.float32)
F = 20          # frames for the short smokes
F_LONG = 44     # proximity LC needs loop pairs with j - i >= 30


@pytest.fixture(scope="module")
def sequence_dir(tmp_path_factory):
    """Render textured-plane sequences to PNGs + calib file: a 20-frame
    loop (short smokes) and a 44-frame double loop (proximity LC, whose
    NMS requires j - i >= 30, loop/proximity.py reduce_edges)."""
    d = tmp_path_factory.mktemp("seq")
    scene = PlaneScene(INTR, HT, WD, seed=5)
    dirs = {}
    for name, nf in (("images", F), ("images_long", F_LONG)):
        imgdir = d / name
        imgdir.mkdir()
        gt = overhead_loop_poses(nf)
        for f in range(nf):
            img = scene.render(gt[f])
            cv2.imwrite(str(imgdir / f"{f:06d}.png"), img[..., ::-1])
        dirs[name] = str(imgdir)
    calib = d / "calib.txt"
    calib.write_text(" ".join(str(float(x)) for x in INTR))
    return dirs, str(calib)


class _Args:
    def __init__(self, config):
        self.config = config
        self.backend_thresh = 96.0
        self.opts = []


def _smoke(sequence_dir, config, version, stride=1, opts=(), images="images",
           nframes=F):
    dirs, calib = sequence_dir
    cfg = load_cfg(_Args(config))
    cfg.merge_from_list(list(opts))
    cfg.BUFFER_SIZE = 64
    # random weights predict ~zero motion; force probe acceptance so every
    # config exercises init + update + BA + keyframing (the features these
    # smokes exist to guard)
    cfg.MOTION_PROBE_THR = -1.0
    sink = []
    traj, tstamps = run_sequence(cfg, dirs[images], calib, stride=stride,
                                 version=version, slam_sink=sink)
    nexp = len(range(0, nframes, stride))
    assert traj.shape == (nexp, 7), traj.shape
    assert np.all(np.isfinite(traj)), "non-finite poses"
    slam = sink[0]
    assert slam.is_initialized, "SLAM never initialized"
    assert slam.stats["updates"] > 0, "update/BA never executed"
    return traj, slam


@pytest.mark.slow
def test_config_cdvo(sequence_dir):
    _smoke(sequence_dir, "config/default_cdvo.yaml", "cdv")


@pytest.mark.slow
def test_config_euroc_stride2(sequence_dir):
    # the evaluate_euroc.py invocation: default_cdvo at stride 2
    _smoke(sequence_dir, "config/default_cdvo.yaml", "cdv", stride=2)


@pytest.mark.slow
def test_config_cdvslam_proximity_lc(sequence_dir):
    # TUM-style: proximity loop closure on, classic off. Proximity edges
    # need j - i >= 30 (reduce_edges NMS), so: a 44-frame sequence, no
    # keyframe removal (KEYFRAME_THRESH=0 -> n grows 1/frame), fewer
    # patches (CPU time), and a permissive flow gate so the candidate
    # pairs of the rendered loop qualify deterministically.
    _, slam = _smoke(
        sequence_dir, "config/default_cdvslam.yaml", "cdv",
        opts=["CLASSIC_LOOP_CLOSURE", "False",
              "KEYFRAME_THRESH", "0.0",
              "PATCHES_PER_FRAME", "16",
              "BACKEND_THRESH", "999.0"],
        images="images_long", nframes=F_LONG)
    assert slam.stats["loop_edges"] > 0, \
        "proximity LC never appended loop edges"
    assert slam.stats["global_ba"] > 0, "loop edges never triggered global BA"


@pytest.mark.slow
def test_config_cdvslam_pp_classic(sequence_dir):
    # KITTI-style CDV-SLAM++: classic LC backend + seg/depth heads; heads
    # forced to random init (checkpoints don't exist here), SCORE
    # selection exercises the seg-filter path. The rendered 20-frame loop
    # revisits its start, so with the retrieval radius shrunk to the
    # sequence scale the BoW must fire and a closure must be ATTEMPTED
    # (downstream RANSAC/PGO success depends on pose quality, which random
    # weights cannot guarantee -- the attempt is the wiring assertion).
    _, slam = _smoke(
        sequence_dir, "config/default_cdvslam++.yaml", "cdv",
        opts=["SEG_HEAD", "random", "DEPTH_HEAD", "random",
              "LOOP_RETR_THRESH", "0.0", "LOOP_RETR_RADIUS", "8",
              "LOOP_CLOSE_NMS", "4", "CLASSIC_LOOP_SYNC", "True",
              "KEYFRAME_THRESH", "0.0"])
    assert slam.long_term_lc is not None, "classic LC not constructed"
    assert slam.stats["lc_attempts"] > 0, \
        "classic LC never attempted a closure"


@pytest.mark.slow
def test_config_dpvo_compat(sequence_dir):
    _smoke(sequence_dir, "config/default_dpvo.yaml", "dpv")
