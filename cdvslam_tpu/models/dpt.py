"""DPT depth head on DINOv2 intermediate layers.

Flax reimplementation of the reference's mmseg-style DPT head
(reference: DINO_modules/hub/dpt/depth_head_mm.py): ReassembleBlocks with
'project' readout (cls-token concat + Linear + GELU), per-stage resize
(4x/2x up, identity, 2x down), FeatureFusion with pre-activation residual
units, and the depth regression tail. NHWC layout.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _ac_lin_matrix(n_in: int, n_out: int):
    """1-D linear sampling matrix for torch F.interpolate(mode='bilinear',
    align_corners=True): src = o * (in-1)/(out-1), clamped borders."""
    W = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        W[:, 0] = 1.0
        return W
    for o in range(n_out):
        s = o * (n_in - 1) / (n_out - 1)
        i0 = int(np.floor(s))
        i0 = min(i0, n_in - 2)
        f = s - i0
        W[o, i0] += 1.0 - f
        W[o, i0 + 1] += f
    return W


def _resize(x, size, align_corners=False):
    """Bilinear resize matching torch F.interpolate semantics: the
    align_corners=False path is jax.image.resize's half-pixel linear; the
    align_corners=True path (FeatureFusionBlock / HeadDepth upsamples,
    depth_head_mm.py:204-215, 44-46) uses corner-aligned sampling
    matrices applied as two small matmuls (static shapes -> host-built
    constants)."""
    B, H, W, C = x.shape
    if not align_corners:
        return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear")
    Wh = jnp.asarray(_ac_lin_matrix(H, size[0]))
    Ww = jnp.asarray(_ac_lin_matrix(W, size[1]))
    y = jnp.einsum("oh,bhwc->bowc", Wh, x.astype(jnp.float32))
    y = jnp.einsum("pw,bowc->bopc", Ww, y)
    return y.astype(x.dtype)


class PreActResidualConvUnit(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    channels: int
    first: bool = False

    @nn.compact
    def __call__(self, x, res=None):
        if res is not None:
            if res.shape[1:3] != x.shape[1:3]:
                res = _resize(res, x.shape[1:3])
            x = x + PreActResidualConvUnit(self.channels, name="res1")(res)
        x = PreActResidualConvUnit(self.channels, name="res2")(x)
        x = _resize(x, (2 * x.shape[1], 2 * x.shape[2]), align_corners=True)
        return nn.Conv(self.channels, (1, 1), use_bias=True, name="project")(x)


class ReassembleBlocks(nn.Module):
    embed_dims: int = 384
    out_channels: Sequence[int] = (48, 96, 192, 384)

    @nn.compact
    def __call__(self, inputs):
        """inputs: list of (tokens (B, h, w, C), cls (B, C))."""
        outs = []
        for i, (x, cls) in enumerate(inputs):
            B, h, w, C = x.shape
            # 'project' readout: concat cls token, Linear + GELU
            readout = jnp.broadcast_to(cls[:, None, None, :], x.shape)
            x = jnp.concatenate([x, readout], axis=-1)
            x = nn.Dense(self.embed_dims, name=f"readout{i}")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Conv(self.out_channels[i], (1, 1), name=f"project{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(self.out_channels[i], (4, 4), strides=(4, 4),
                                     name="up4")(x)
            elif i == 1:
                x = nn.ConvTranspose(self.out_channels[i], (2, 2), strides=(2, 2),
                                     name="up2")(x)
            elif i == 3:
                x = nn.Conv(self.out_channels[i], (3, 3), strides=2, padding=1,
                            name="down2")(x)
            outs.append(x)
        return outs


class DPTHead(nn.Module):
    """Depth from 4 DINOv2 taps. Input: list of 4 (tokens_map, cls) pairs
    in tap order [2, 5, 8, 11]; output (B, H', W', 1) metric depth."""
    embed_dims: int = 384
    post_process_channels: Sequence[int] = (48, 96, 192, 384)
    channels: int = 256
    min_depth: float = 0.001
    max_depth: float = 80.0

    @nn.compact
    def __call__(self, inputs):
        x = ReassembleBlocks(self.embed_dims, self.post_process_channels,
                             name="reassemble")(inputs)
        x = [nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                     name=f"conv{i}")(f) for i, f in enumerate(x)]
        out = FeatureFusionBlock(self.channels, first=True, name="fusion0")(x[-1])
        for i in range(1, len(x)):
            out = FeatureFusionBlock(self.channels, name=f"fusion{i}")(out, x[-(i + 1)])
        # ConvModule default act: ReLU after project (depth_head_mm.py:268)
        out = nn.relu(nn.Conv(self.channels, (3, 3), padding=1, name="project")(out))
        # HeadDepth tail (depth_head_mm.py:40-53)
        out = nn.Conv(self.channels // 2, (3, 3), padding=1, name="head0")(out)
        out = _resize(out, (2 * out.shape[1], 2 * out.shape[2]), align_corners=True)
        out = nn.Conv(32, (3, 3), padding=1, name="head2")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), name="head4")(out)
        return nn.relu(out) + self.min_depth
