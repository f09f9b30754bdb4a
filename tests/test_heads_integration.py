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


def test_cdv_with_dpt_head_runs():
    cfg = get_cfg()
    cfg.PATCHES_PER_FRAME = 8
    cfg.BUFFER_SIZE = 32
    cfg.DEPTH_HEAD = "dpt_random"
    cfg.MOTION_PROBE_THR = -1.0
    ht, wd = 64, 96
    slam = SLAM(cfg, network="cdv", ht=ht, wd=wd)
    assert slam.depth_is_dpt and slam.depth_params is not None
    rng = np.random.RandomState(1)
    intr = np.array([50.0, 50.0, 48.0, 32.0], np.float32)
    for f in range(8):
        img = (rng.rand(ht, wd, 3) * 255).astype(np.uint8)
        slam(f, img, intr)
    assert slam.pg.n >= 6
    scale = np.asarray(slam.pg.scale_[: slam.pg.n])
    assert np.all(np.isfinite(scale)) and np.all(scale > 0)
    poses, tstamps = slam.terminate()
    assert not np.any(np.isnan(poses))


def test_dpt_converter_roundtrip(tmp_path):
    """Structural converter test: a torch-like state dict with the exact
    reference key names/shapes loads and drives the flax DPTHead."""
    import torch
    import jax

    from cdvslam_tpu.models.convert import load_dpt_head
    from cdvslam_tpu.models.dpt import DPTHead

    C, ch = 384, 256
    out_ch = [48, 96, 192, 384]
    rng = np.random.RandomState(0)
    sd = {}

    def T(*shape):
        return torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.05)

    for i in range(4):
        sd[f"decode_head.reassemble_blocks.readout_projects.{i}.0.weight"] = T(C, 2 * C)
        sd[f"decode_head.reassemble_blocks.readout_projects.{i}.0.bias"] = T(C)
        sd[f"decode_head.reassemble_blocks.projects.{i}.conv.weight"] = T(out_ch[i], C, 1, 1)
        sd[f"decode_head.reassemble_blocks.projects.{i}.conv.bias"] = T(out_ch[i])
        sd[f"decode_head.convs.{i}.conv.weight"] = T(ch, out_ch[i], 3, 3)
        sd[f"decode_head.fusion_blocks.{i}.project.conv.weight"] = T(ch, ch, 1, 1)
        sd[f"decode_head.fusion_blocks.{i}.project.conv.bias"] = T(ch)
        for u in ([1, 2] if i > 0 else [2]):
            for c in [1, 2]:
                sd[f"decode_head.fusion_blocks.{i}.res_conv_unit{u}.conv{c}.conv.weight"] = T(ch, ch, 3, 3)
    sd["decode_head.reassemble_blocks.resize_layers.0.weight"] = T(out_ch[0], out_ch[0], 4, 4)
    sd["decode_head.reassemble_blocks.resize_layers.0.bias"] = T(out_ch[0])
    sd["decode_head.reassemble_blocks.resize_layers.1.weight"] = T(out_ch[1], out_ch[1], 2, 2)
    sd["decode_head.reassemble_blocks.resize_layers.1.bias"] = T(out_ch[1])
    sd["decode_head.reassemble_blocks.resize_layers.3.weight"] = T(out_ch[3], out_ch[3], 3, 3)
    sd["decode_head.reassemble_blocks.resize_layers.3.bias"] = T(out_ch[3])
    sd["decode_head.project.conv.weight"] = T(ch, ch, 3, 3)
    sd["decode_head.project.conv.bias"] = T(ch)
    sd["decode_head.conv_depth.head.0.weight"] = T(ch // 2, ch, 3, 3)
    sd["decode_head.conv_depth.head.0.bias"] = T(ch // 2)
    sd["decode_head.conv_depth.head.2.weight"] = T(32, ch // 2, 3, 3)
    sd["decode_head.conv_depth.head.2.bias"] = T(32)
    sd["decode_head.conv_depth.head.4.weight"] = T(1, 32, 1, 1)
    sd["decode_head.conv_depth.head.4.bias"] = T(1)

    path = tmp_path / "dpt_head.pth"
    torch.save({"state_dict": sd}, str(path))
    variables = load_dpt_head(str(path))

    head = DPTHead()
    h, w = 6, 8
    taps = [(jnp.asarray(rng.randn(1, h, w, C), jnp.float32),
             jnp.asarray(rng.randn(1, C), jnp.float32)) for _ in range(4)]
    out = head.apply(variables, taps)
    assert out.shape[0] == 1 and out.shape[-1] == 1
    assert np.all(np.isfinite(np.asarray(out)))
    # structural exactness: converting must consume exactly the flax tree
    ref = jax.tree_util.tree_structure(head.init(jax.random.PRNGKey(0), taps))
    got = jax.tree_util.tree_structure(variables)
    assert ref == got
