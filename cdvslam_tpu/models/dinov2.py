"""DINOv2 ViT-S/14 backbone in flax.

Architecture per the reference's vendored DINOv2
(reference: DINO_modules/dinov2.py:42-260, hub/backbones.py:18-61):
patch 14, dim 384, 12 blocks, 6 heads, MLP ratio 4, LayerScale
(init 1.0), LayerNorm eps 1e-6, bicubic pos-embed interpolation with the
+0.1 anti-FP-error trick, cls token. Exposes intermediate layer taps
(blocks [2,5,8,11] are what CDVNet consumes, net_cdv.py:216-217).

TPU notes: the full forward is one big fused stack of (L, 384) matmuls --
ideal MXU shape; runs in bf16 under the SLAM autocast policy.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _torch_bicubic_matrix(n_in: int, n_out: int, scale: float, A=-0.75):
    """Row matrix reproducing torch F.interpolate(mode="bicubic",
    align_corners=False) with an EXPLICIT scale_factor: source coordinate
    src = (dst + 0.5) / scale - 0.5 (torch uses 1/scale_factor as the
    ratio, NOT out/in -- this is why the reference's +0.1 trick,
    dinov2.py:175-182, changes the sampling grid), cubic convolution
    kernel with A = -0.75, replicate-clamped borders."""
    W = np.zeros((n_out, n_in), np.float64)

    def cub(x):
        x = abs(x)
        if x <= 1:
            return ((A + 2) * x - (A + 3)) * x * x + 1
        if x < 2:
            return A * (((x - 5) * x + 8) * x - 4)
        return 0.0

    for o in range(n_out):
        s = (o + 0.5) / scale - 0.5
        i0 = int(np.floor(s))
        for idx in range(i0 - 1, i0 + 3):
            W[o, min(max(idx, 0), n_in - 1)] += cub(s - idx)
    return W.astype(np.float32)


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        h = self.num_heads
        d = C // h
        qkv = nn.Dense(3 * C, use_bias=True, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, L, 3, h, d).transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]                     # (B, h, L, d)
        import os as _os
        if (jax.default_backend() in ("tpu", "axon") and L > 512
                and _os.environ.get("DINO_FLASH", "1") == "1"):
            # tiled flash attention: the full (h, L, L) logits never hit
            # HBM (12 x 43 MB per frame in the einsum path -- the
            # round-2 HLO audit's biggest non-corr waste). L is padded
            # to the kernel's 512-token block quantum; pad tokens live
            # in segment 0 (real tokens 1), so they are masked out, and
            # the pad rows are sliced off the output.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds, flash_attention)
            Lp = -(-L // 512) * 512
            pad = [(0, 0), (0, 0), (0, Lp - L), (0, 0)]
            seg = (jnp.arange(Lp) < L).astype(jnp.int32)[None]  # (1, Lp)
            seg = jnp.broadcast_to(seg, (B, Lp))
            out = flash_attention(
                jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=d ** -0.5)[:, :, :L]
        else:
            attn = jnp.einsum("bhld,bhmd->bhlm", q, k) * (d ** -0.5)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhlm,bhmd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        return nn.Dense(C, use_bias=True, name="proj")(out)


class Mlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="fc2")(x)


class LayerScale(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return x * gamma


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = Attention(self.dim, self.num_heads, name="attn")(y)
        x = x + LayerScale(self.dim, name="ls1")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = Mlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(y)
        return x + LayerScale(self.dim, name="ls2")(y)


class DinoVisionTransformer(nn.Module):
    """ViT with interpolatable pos-embeds and intermediate-layer taps."""
    patch_size: int = 14
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    pos_grid: int = 37              # 518 // 14 (dinov2 hub img_size=518)

    def setup(self):
        self.patch_proj = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=self.patch_size, padding="VALID", name="patch_embed",
        )
        self.cls_token = self.param("cls_token", nn.initializers.normal(1e-6), (1, 1, self.embed_dim))
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.pos_grid * self.pos_grid + 1, self.embed_dim),
        )
        self.blocks_list = [Block(self.embed_dim, self.num_heads, self.mlp_ratio, name=f"block{i}")
                            for i in range(self.depth)]
        self.out_norm = nn.LayerNorm(epsilon=1e-6, name="norm")

    def _interp_pos(self, h0, w0, dtype):
        """Bicubic pos-embed resize, bit-matching the reference's
        F.interpolate(scale_factor=(h0+0.1)/N, mode="bicubic")
        (dinov2.py:163-187). h0/w0 are static -> the two small sampling
        matrices are host-built constants; the resize itself is two tiny
        matmuls."""
        N = self.pos_grid
        if h0 == N and w0 == N:
            return self.pos_embed.astype(dtype)
        cls_pe = self.pos_embed[:, :1].astype(jnp.float32)
        patch_pe = self.pos_embed[:, 1:].astype(jnp.float32).reshape(1, N, N, self.embed_dim)
        Wh = jnp.asarray(_torch_bicubic_matrix(N, h0, (h0 + 0.1) / N))
        Ww = jnp.asarray(_torch_bicubic_matrix(N, w0, (w0 + 0.1) / N))
        patch_pe = jnp.einsum("hH,bHWd,wW->bhwd", Wh, patch_pe, Ww)
        patch_pe = patch_pe.reshape(1, h0 * w0, self.embed_dim)
        return jnp.concatenate([cls_pe, patch_pe], axis=1).astype(dtype)

    def prepare_tokens(self, x):
        """x: (B, H, W, 3) NHWC, H/W multiples of patch_size."""
        B, H, W, _ = x.shape
        h0, w0 = H // self.patch_size, W // self.patch_size
        t = self.patch_proj(x).reshape(B, h0 * w0, self.embed_dim)
        cls = jnp.broadcast_to(self.cls_token.astype(t.dtype), (B, 1, self.embed_dim))
        t = jnp.concatenate([cls, t], axis=1)
        return t + self._interp_pos(h0, w0, t.dtype)

    def __call__(self, x, taps: Sequence[int] = (2, 5, 8, 11)):
        """Returns list of *pre-norm* token tensors at the tapped blocks
        (matching _get_intermediate_layers_not_chunked, dinov2.py:236-247).
        """
        t = self.prepare_tokens(x)
        outs = []
        for i, blk in enumerate(self.blocks_list):
            t = blk(t)
            if i in taps:
                outs.append(t)
        return outs

    def norm_tokens(self, t):
        return self.out_norm(t)

    def advance(self, x, step_i: int, norm: bool = True):
        """Incremental per-block evaluation (reference dinov2.py:302-331):
        step 0 embeds the image and runs block 0; later steps run one
        block on the previous step's PRE-NORM tokens; steps >= depth pass
        through. Lets a caller amortize the backbone across frames.
        Returns (pre_norm_tokens, output_tokens, cls) where output/cls
        are (optionally) final-norm'd.

        NOTE: the SLAM runtime deliberately does NOT use this. Amortizing
        the ViT across frames means frame n's context tokens come from an
        image ~depth frames old, but patch selection (SCORE/seg paths)
        and the per-patch context gather sample the token map at frame
        n's own coordinates -- a semantic change with no reference
        precedent (the reference defines advance() but never calls it
        anywhere in cdvslam either; its tracking loop always runs
        _get_intermediate_layers_not_chunked, net_cdv.py:216-224)."""
        if step_i == 0:
            t = self.prepare_tokens(x)
            t = self.blocks_list[0](t)
        elif step_i >= self.depth:
            t = x
        else:
            t = self.blocks_list[step_i](x)
        out = self.out_norm(t) if norm else t
        return t, out[:, 1:], out[:, 0]


def pad_to_multiple(img, multiple=14, mode="right"):
    """Zero-pad H, W up to a multiple (reference hub/utils.py:23-46).

    img: (..., H, W, C) NHWC.
    """
    H, W = img.shape[-3], img.shape[-2]
    ph = (-H) % multiple
    pw = (-W) % multiple
    if ph == 0 and pw == 0:
        return img
    pad = [(0, 0)] * (img.ndim - 3) + ([(0, ph), (0, pw), (0, 0)] if mode == "right"
                                       else [(ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)])
    return jnp.pad(img, pad)
