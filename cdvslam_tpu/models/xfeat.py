"""XFeat matching-feature trunk (blocks 1-2 only).

The reference loads the public 'verlab/accelerated_features' XFeat via
torch.hub and keeps only block1/block2/skip1/norm for a 24-channel, 1/4
resolution matching feature map (reference: cdvslam/net_cdv.py:158-205).
This is that sub-network in flax, NHWC.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def instance_norm(x, eps=1e-5):
    """Torch InstanceNorm2d default (affine=False): per (sample, channel)
    normalization over spatial dims. x: (B, H, W, C)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class BasicLayer(nn.Module):
    """Conv3x3(bias=False) + BatchNorm(affine=False) + ReLU."""
    out_ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (3, 3), strides=self.stride, padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True, use_bias=False, use_scale=False)(x)
        return nn.relu(x)


class XFeatTrunk(nn.Module):
    """norm -> block1 (1/4 res, 24ch) -> skip1 -> block2."""

    @nn.compact
    def __call__(self, gray):
        """gray: (B, H, W, 1) single-channel input."""
        x = instance_norm(gray)
        # block1
        b = BasicLayer(4, 1, name="block1_0")(x)
        b = BasicLayer(8, 2, name="block1_1")(b)
        b = BasicLayer(8, 1, name="block1_2")(b)
        b = BasicLayer(24, 2, name="block1_3")(b)
        # skip1: AvgPool(4,4) + 1x1 conv
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1), "VALID") / 16.0
        s = nn.Conv(24, (1, 1), name="skip1")(s)
        # block2
        y = BasicLayer(24, 1, name="block2_0")(b + s)
        y = BasicLayer(24, 1, name="block2_1")(y)
        return y


class XFeatF(nn.Module):
    """The reference's get_f (net_cdv.py:190-205): grayscale + trunk +
    trailing InstanceNorm. Input images (B, H, W, 3) in [0,1]."""

    @nn.compact
    def __call__(self, images):
        img = images * 2.0 - 0.5
        gray = jnp.mean(img, axis=-1, keepdims=True)
        y = XFeatTrunk(name="xfeat")(gray)
        return instance_norm(y)
