"""Weight-converter parity: torch modules built exactly like the
reference's (same layer structure and state_dict names) are randomly
initialized, converted via models/convert.py, and must produce matching
activations in flax. This validates every kernel/layout convention in the
converter without needing the published checkpoints."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from cdvslam_tpu.models.convert import (
    convert_encoder4, convert_update_cdv, convert_dino,
)


def _sd(module, prefix=""):
    return {prefix + k: v.detach() for k, v in module.state_dict().items()}


def test_encoder4_parity():
    """BasicEncoder4 (reference extractor.py:207-271), instance norm."""
    DIM = 32

    class ResidualBlock(tnn.Module):
        def __init__(self, in_planes, planes, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(in_planes, planes, 3, padding=1, stride=stride)
            self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1)
            self.relu = tnn.ReLU()
            self.norm1 = tnn.InstanceNorm2d(planes)
            self.norm2 = tnn.InstanceNorm2d(planes)
            if stride != 1:
                self.norm3 = tnn.InstanceNorm2d(planes)
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(in_planes, planes, 1, stride=stride), self.norm3)
            else:
                self.downsample = None

        def forward(self, x):
            y = self.relu(self.norm1(self.conv1(x)))
            y = self.relu(self.norm2(self.conv2(y)))
            if self.downsample is not None:
                x = self.downsample(x)
            return self.relu(x + y)

    class Encoder4(tnn.Module):
        def __init__(self, output_dim=48):
            super().__init__()
            self.norm1 = tnn.InstanceNorm2d(DIM)
            self.conv1 = tnn.Conv2d(3, DIM, 7, stride=2, padding=3)
            self.relu1 = tnn.ReLU()
            self.layer1 = tnn.Sequential(ResidualBlock(DIM, DIM, 1),
                                         ResidualBlock(DIM, DIM, 1))
            self.layer2 = tnn.Sequential(ResidualBlock(DIM, 2 * DIM, 2),
                                         ResidualBlock(2 * DIM, 2 * DIM, 1))
            self.conv2 = tnn.Conv2d(2 * DIM, output_dim, 1)

        def forward(self, x):
            x = self.relu1(self.norm1(self.conv1(x)))
            x = self.layer1(x)
            x = self.layer2(x)
            return self.conv2(x)

    torch.manual_seed(0)
    tenc = Encoder4().eval()
    x = torch.randn(1, 3, 32, 48)
    with torch.no_grad():
        ref = tenc(x).numpy()

    sd = {k: v.numpy() for k, v in _sd(tenc, "patchify.fnet.").items()}
    params = convert_encoder4(sd, "patchify.fnet.", "instance")

    from cdvslam_tpu.models.encoder import BasicEncoder4
    fenc = BasicEncoder4(output_dim=48, norm_fn="instance")
    out = fenc.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_update_cdv_parity():
    """CDV update operator (reference net_cdv.py:29-156) on one group."""
    DIMI = 384
    M, G = 4, 3
    E = M * G

    class TorchSoftAgg(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.f = tnn.Linear(dim, dim)
            self.g = tnn.Linear(dim, dim)
            self.h = tnn.Linear(dim, dim)

        def forward(self, x, seg, nseg):
            # scatter softmax per segment (reference blocks.py SoftAgg)
            g = self.g(x)
            out = torch.zeros_like(x)
            for s in range(nseg):
                m = seg == s
                if m.any():
                    sm = torch.softmax(g[:, m], dim=1)
                    y = (self.f(x[:, m]) * sm).sum(dim=1, keepdim=True)
                    out[:, m] = self.h(y)
            return out

    class TorchUpdate(tnn.Module):
        """Mirrors reference Update('pa') structure + names."""
        def __init__(self, p=3):
            super().__init__()
            self.c1 = tnn.Sequential(tnn.Linear(DIMI, DIMI), tnn.ReLU(), tnn.Linear(DIMI, DIMI))
            self.c2 = tnn.Sequential(tnn.Linear(DIMI, DIMI), tnn.ReLU(), tnn.Linear(DIMI, DIMI))
            self.norm = tnn.LayerNorm(DIMI, eps=1e-3)
            self.agg_kk = TorchSoftAgg(DIMI)
            self.norm2 = tnn.LayerNorm(DIMI, eps=1e-3)
            self.gatten = tnn.Module()
            self.gatten.gate = tnn.Sequential(tnn.Linear(DIMI, DIMI), tnn.Sigmoid())
            enc = tnn.Module()
            enc.q_proj = tnn.Linear(DIMI, DIMI, bias=False)
            enc.k_proj = tnn.Linear(DIMI, DIMI, bias=False)
            enc.v_proj = tnn.Linear(DIMI, DIMI, bias=False)
            enc.merge = tnn.Linear(DIMI, DIMI, bias=False)
            enc.mlp = tnn.Sequential(tnn.Linear(2 * DIMI, 2 * DIMI, bias=False),
                                     tnn.ReLU(),
                                     tnn.Linear(2 * DIMI, DIMI, bias=False))
            enc.norm1 = tnn.LayerNorm(DIMI, eps=1e-6)
            enc.norm2 = tnn.LayerNorm(DIMI, eps=1e-6)
            self.gatten.encoder = enc
            self.corr = tnn.Sequential(
                tnn.Linear(2 * 49 * p * p, DIMI), tnn.ReLU(),
                tnn.Linear(DIMI, DIMI), tnn.LayerNorm(DIMI, eps=1e-3),
                tnn.ReLU(), tnn.Linear(DIMI, DIMI))
            self.d = tnn.Sequential(tnn.ReLU(), tnn.Linear(DIMI, 2))
            self.w = tnn.Sequential(tnn.ReLU(), tnn.Linear(DIMI, 2), tnn.Sigmoid())

        def encoder_forward(self, x):
            enc = self.gatten.encoder
            bs, L, _ = x.shape
            h, dd = 8, DIMI // 8
            q = enc.q_proj(x).view(bs, L, h, dd)
            k = enc.k_proj(x).view(bs, L, h, dd)
            v = enc.v_proj(x).view(bs, L, h, dd)
            # ELU+1 linear attention, no rotary (posenc None path)
            Q = torch.nn.functional.elu(q) + 1
            K = torch.nn.functional.elu(k) + 1
            Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + 1e-6)
            vl = v.size(1)
            v = v / vl
            KV = torch.einsum("nshd,nshv->nhdv", K, v)
            msg = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * vl
            msg = enc.merge(msg.reshape(bs, L, DIMI))
            msg = enc.norm1(msg)
            msg = enc.mlp(torch.cat([x, msg], dim=2))
            return enc.norm2(msg)

        def forward(self, net, inp, corr, ix, jx_n, kseg, nseg, perm, inv):
            net = net + inp + self.corr(corr)
            net = self.norm(net)
            mask_ix = (ix >= 0).float().reshape(1, -1, 1)
            mask_jx = (jx_n >= 0).float().reshape(1, -1, 1)
            gi = net[:, ix.clamp(min=0)]
            gj = net[:, jx_n.clamp(min=0)]
            net = net + self.c1(mask_ix * gi) + self.c2(mask_jx * gj)
            net = net + self.agg_kk(net, kseg, nseg)
            tokens = net[:, perm.reshape(-1), :].view(-1, M, DIMI)
            tokens = self.norm2(tokens)
            tokens = tokens + self.gatten.gate(tokens) * self.encoder_forward(tokens)
            net = tokens.reshape(1, -1, DIMI)[:, inv, :]
            return net, self.d(net), self.w(net)

    torch.manual_seed(1)
    tup = TorchUpdate().eval()

    rng = np.random.RandomState(2)
    net0 = rng.randn(1, E, DIMI).astype(np.float32) * 0.1
    inp = rng.randn(1, E, DIMI).astype(np.float32) * 0.1
    corr = rng.randn(1, E, 882).astype(np.float32) * 0.1

    # simple consistent index structure
    ii = np.repeat(np.arange(G), M)
    jj = np.zeros(E, np.int64)
    kk = np.arange(E)
    from cdvslam_tpu.models import build_update_aux
    aux = build_update_aux(ii, jj, kk, 0, E, M=M, E_pad=E)
    ix, jx = np.asarray(aux.ix), np.asarray(aux.jx)

    with torch.no_grad():
        tnet, td, tw = tup(
            torch.from_numpy(net0), torch.from_numpy(inp), torch.from_numpy(corr),
            torch.from_numpy(ix.astype(np.int64)), torch.from_numpy(jx.astype(np.int64)),
            torch.from_numpy(np.asarray(aux.kseg).astype(np.int64)), E,
            torch.from_numpy(np.asarray(aux.perm).astype(np.int64)),
            torch.from_numpy(np.asarray(aux.inv_perm).astype(np.int64)),
        )

    sd = {k: v.numpy() for k, v in _sd(tup, "update.").items()}
    params = convert_update_cdv(sd)["update_op"]

    from cdvslam_tpu.models.update import UpdateCDV
    mod = UpdateCDV()
    fnet, fd, fw = mod.apply(
        {"params": params}, jnp.asarray(net0), jnp.asarray(inp),
        jnp.asarray(corr), aux, E, posenc=None,
    )
    np.testing.assert_allclose(np.asarray(fnet), tnet.numpy(), atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fd), td.numpy(), atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fw), tw.numpy(), atol=3e-4, rtol=1e-3)


def test_dino_block_parity():
    """One DINOv2 transformer block (reference DINO_modules/layers/block.py)."""
    dim, heads = 384, 6

    class TorchBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
            self.attn = tnn.Module()
            self.attn.qkv = tnn.Linear(dim, 3 * dim)
            self.attn.proj = tnn.Linear(dim, dim)
            self.ls1 = tnn.Module()
            self.ls1.gamma = tnn.Parameter(torch.randn(dim) * 0.1 + 1)
            self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
            self.mlp = tnn.Module()
            self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
            self.mlp.fc2 = tnn.Linear(4 * dim, dim)
            self.ls2 = tnn.Module()
            self.ls2.gamma = tnn.Parameter(torch.randn(dim) * 0.1 + 1)

        def forward(self, x):
            B, L, C = x.shape
            y = self.norm1(x)
            qkv = self.attn.qkv(y).reshape(B, L, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = torch.softmax(q @ k.transpose(-2, -1) * (C // heads) ** -0.5, dim=-1)
            y = (a @ v).transpose(1, 2).reshape(B, L, C)
            x = x + self.ls1.gamma * self.attn.proj(y)
            y = self.norm2(x)
            y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
            return x + self.ls2.gamma * y

    torch.manual_seed(3)
    tb = TorchBlock().eval()
    x = torch.randn(1, 10, dim)
    with torch.no_grad():
        ref = tb(x).numpy()

    sd = {("patchify.dino.blocks.0." + k): v.numpy() for k, v in tb.state_dict().items()}
    sd["patchify.dino.cls_token"] = np.zeros((1, 1, dim), np.float32)
    sd["patchify.dino.pos_embed"] = np.zeros((1, 37 * 37 + 1, dim), np.float32)
    sd["patchify.dino.patch_embed.proj.weight"] = np.zeros((dim, 3, 14, 14), np.float32)
    sd["patchify.dino.patch_embed.proj.bias"] = np.zeros((dim,), np.float32)
    sd["patchify.dino.norm.weight"] = np.ones((dim,), np.float32)
    sd["patchify.dino.norm.bias"] = np.zeros((dim,), np.float32)
    # fill remaining blocks with block 0's weights
    for i in range(1, 12):
        for k, v in tb.state_dict().items():
            sd[f"patchify.dino.blocks.{i}." + k] = v.numpy()
    params = convert_dino(sd)

    from cdvslam_tpu.models.dinov2 import Block
    blk = Block(dim, heads)
    out = blk.apply({"params": params["block0"]}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_xfeat_trunk_parity():
    """XFeat blocks 1-2 + skip + instance norms (the matching-feature
    trunk the reference takes from torch.hub 'verlab/accelerated_features'
    and slices in net_cdv.py:160-201). The torch side transcribes the
    public XFeat BasicLayer/trunk structure inline (hub is unavailable
    offline); state_dict names match, so this validates convert_xfeat's
    layout AND XFeatF's semantics (gray mean, norms, skip add)."""

    class BasicLayer(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.layer = tnn.Sequential(
                tnn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False),
                tnn.BatchNorm2d(cout, affine=False),
                tnn.ReLU(inplace=True),
            )

        def forward(self, x):
            return self.layer(x)

    class XFeatSlice(tnn.Module):
        """Exactly the kept sub-net: norm, block1, skip1, block2."""

        def __init__(self):
            super().__init__()
            self.norm = tnn.InstanceNorm2d(1)
            self.block1 = tnn.Sequential(
                BasicLayer(1, 4, 1), BasicLayer(4, 8, 2),
                BasicLayer(8, 8, 1), BasicLayer(8, 24, 2))
            self.skip1 = tnn.Sequential(
                tnn.AvgPool2d(4, stride=4), tnn.Conv2d(1, 24, 1))
            self.block2 = tnn.Sequential(
                BasicLayer(24, 24, 1), BasicLayer(24, 24, 1))

    class PatchifySlice(tnn.Module):
        """get_f (net_cdv.py:190-205) on a (B, 3, H, W) [0,1] batch."""

        def __init__(self):
            super().__init__()
            self.xfeat = XFeatSlice()
            self.norm_f = tnn.InstanceNorm2d(24)

        def forward(self, img):
            img = img * 2 - 0.5
            x = img.mean(dim=1, keepdim=True)
            x = self.xfeat.norm(x)
            x1 = self.xfeat.block1(x)
            x2 = self.xfeat.block2(x1 + self.xfeat.skip1(x))
            return self.norm_f(x2)

    torch.manual_seed(3)
    mod = PatchifySlice().eval()
    # non-trivial BN running stats (a fresh BN has mean 0 / var 1)
    with torch.no_grad():
        for m in mod.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)

    rng = np.random.RandomState(11)
    img = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        y_t = mod(torch.from_numpy(img)).numpy()      # (1, 24, 16, 24)

    from cdvslam_tpu.models.convert import convert_xfeat
    from cdvslam_tpu.models.xfeat import XFeatF

    sd = {"patchify." + k: v.detach().numpy()
          for k, v in mod.state_dict().items()}
    params, stats = convert_xfeat(sd)
    variables = {"params": {"xfeat": params}, "batch_stats": {"xfeat": stats}}
    y_j = XFeatF().apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)))
    y_j = np.asarray(y_j).transpose(0, 3, 1, 2)

    assert y_j.shape == y_t.shape, (y_j.shape, y_t.shape)
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-4)
