"""Interactive web viewer: serves the page and live state JSON."""
import json
import urllib.request

import numpy as np

from cdvslam_tpu.config import get_cfg
from cdvslam_tpu.slam import SLAM


def test_web_viewer_serves_live_state():
    cfg = get_cfg()
    cfg.PATCHES_PER_FRAME = 8
    cfg.BUFFER_SIZE = 32
    cfg.MOTION_PROBE_THR = -1.0
    ht, wd = 64, 96
    slam = SLAM(cfg, network="dpv", ht=ht, wd=wd, viz=True)
    assert slam.viewer is not None and hasattr(slam.viewer, "port")
    rng = np.random.RandomState(0)
    intr = np.array([50.0, 50.0, 48.0, 32.0], np.float32)
    for f in range(8):
        slam((rng.rand() , )[0] if False else f,
             (rng.rand(ht, wd, 3) * 255).astype(np.uint8), intr)
    slam.viewer.refresh()
    base = f"http://127.0.0.1:{slam.viewer.port}"
    page = urllib.request.urlopen(base + "/", timeout=5).read().decode()
    assert "three" in page and "OrbitControls" in page
    state = json.loads(urllib.request.urlopen(base + "/state.json", timeout=5).read())
    assert state["n"] >= 2
    assert len(state["points"]) % 3 == 0 and len(state["points"]) > 0
    assert len(state["colors"]) == len(state["points"])
    assert len(state["traj"]) == state["n"] * 3
    assert len(state["frustum"]) == 8 * 2 * 3
    poses, _ = slam.terminate()
