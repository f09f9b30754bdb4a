"""Seg/depth-head SLAM integration: runs end-to-end with random heads."""
import numpy as np
import jax.numpy as jnp

from cdvslam_tpu.config import get_cfg
from cdvslam_tpu.slam import SLAM


def test_cdv_with_heads_runs():
    cfg = get_cfg()
    cfg.PATCHES_PER_FRAME = 8
    cfg.BUFFER_SIZE = 32
    cfg.SEG_HEAD = "random"
    cfg.DEPTH_HEAD = "random"
    cfg.FILTER_DYNAMIC_CLASS = True
    cfg.MOTION_PROBE_THR = -1.0  # accept all frames (random weights)
    ht, wd = 64, 96
    slam = SLAM(cfg, network="cdv", ht=ht, wd=wd)
    assert slam.seg_params is not None and slam.depth_params is not None
    rng = np.random.RandomState(0)
    intr = np.array([50.0, 50.0, 48.0, 32.0], np.float32)
    for f in range(10):
        img = (rng.rand(ht, wd, 3) * 255).astype(np.uint8)
        slam(f, img, intr)
    # seg classes recorded; depth-head init gave non-default depths
    assert slam.pg.n >= 8
    seg = np.asarray(slam.pg.seg_dev[: slam.pg.n])
    assert seg.shape[1] == 8
    scale = np.asarray(slam.pg.scale_[: slam.pg.n])
    assert np.all(np.isfinite(scale)) and np.all(scale > 0)
    poses, tstamps = slam.terminate()
    assert not np.any(np.isnan(poses))
