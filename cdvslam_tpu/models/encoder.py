"""RAFT-style residual CNN encoders (reference: cdvslam/extractor.py).

NHWC layout throughout (TPU conv layout); callers transpose at the
framework boundary where the (N, C, H, W) reference layout is expected.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

DIM = 32


def _norm(norm_fn: str, channels: int):
    if norm_fn == "group":
        return nn.GroupNorm(num_groups=channels // 8)
    if norm_fn == "batch":
        # inference-mode batch norm (running stats); training uses use_running_average flag
        return nn.BatchNorm(use_running_average=True)
    if norm_fn == "instance":
        # InstanceNorm = GroupNorm with one group per channel, no affine
        # (torch InstanceNorm2d default: affine=False)
        return nn.GroupNorm(num_groups=channels, use_bias=False, use_scale=False)
    return None


class ResidualBlock(nn.Module):
    """reference extractor.py:13-62."""
    planes: int
    norm_fn: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1)(x)
        n1 = _norm(self.norm_fn, self.planes)
        if n1 is not None:
            y = n1(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1)(y)
        n2 = _norm(self.norm_fn, self.planes)
        if n2 is not None:
            y = n2(y)
        y = nn.relu(y)

        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride)(x)
            n3 = _norm(self.norm_fn, self.planes)
            if n3 is not None:
                x = n3(x)
        return nn.relu(x + y)


class BasicEncoder4(nn.Module):
    """Stride-4 encoder (reference extractor.py:207-271): 7x7/2 conv +
    2 residual layers (second at stride 2) + 1x1 output conv.
    Input (B*, H, W, 3) NHWC; output (B*, H/4, W/4, output_dim).
    """
    output_dim: int = 128
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(DIM, (7, 7), strides=2, padding=3)(x)
        n1 = _norm(self.norm_fn, DIM)
        if n1 is not None:
            x = n1(x)
        x = nn.relu(x)
        # layer1: 2 blocks stride 1
        x = ResidualBlock(DIM, self.norm_fn, 1)(x)
        x = ResidualBlock(DIM, self.norm_fn, 1)(x)
        # layer2: 2 blocks, first stride 2
        x = ResidualBlock(2 * DIM, self.norm_fn, 2)(x)
        x = ResidualBlock(2 * DIM, self.norm_fn, 1)(x)
        return nn.Conv(self.output_dim, (1, 1))(x)


class BasicEncoder(nn.Module):
    """Stride-8 variant (reference extractor.py:124-204)."""
    output_dim: int = 128
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(DIM, (7, 7), strides=2, padding=3)(x)
        n1 = _norm(self.norm_fn, DIM)
        if n1 is not None:
            x = n1(x)
        x = nn.relu(x)
        x = ResidualBlock(DIM, self.norm_fn, 1)(x)
        x = ResidualBlock(DIM, self.norm_fn, 1)(x)
        x = ResidualBlock(2 * DIM, self.norm_fn, 2)(x)
        x = ResidualBlock(2 * DIM, self.norm_fn, 1)(x)
        x = ResidualBlock(4 * DIM, self.norm_fn, 2)(x)
        x = ResidualBlock(4 * DIM, self.norm_fn, 1)(x)
        return nn.Conv(self.output_dim, (1, 1))(x)
