"""Semantic / depth heads on DINOv2 tokens (reference: cdvslam/net_cdv.py:577-627)."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SegHeadFlatten(nn.Module):
    """BatchNorm1d + Linear token classifier (net_cdv.py:577-600)."""
    num_classes: int = 150
    in_channels: int = 384

    @nn.compact
    def __call__(self, x):
        x = nn.BatchNorm(use_running_average=True, name="bn")(x)
        return nn.Dense(self.num_classes, name="linear")(x)

    def seg_class(self, x):
        return jnp.argmax(self(x), axis=-1).astype(jnp.uint8)

    def filt_mask(self, x, filt_index):
        """True where the token's argmax class is a dynamic class
        (reference net_cdv.py:595-600 get_filt). x: (L, C) raw normalized
        tokens; filt_index: (K,) int array of dynamic class ids."""
        cls = jnp.argmax(self(x), axis=-1)
        return jnp.any(cls[:, None] == filt_index[None, :], axis=1)


class DepthHeadFlatten(nn.Module):
    """AdaBins-style 256-bin linear depth head on [patch; cls] tokens
    (net_cdv.py:602-627)."""
    in_channels: int = 768
    n_bins: int = 256
    min_depth: float = 0.001
    max_depth: float = 80.0

    @nn.compact
    def __call__(self, x):
        logit = nn.Dense(self.n_bins, name="linear")(x)
        bins = jnp.linspace(self.min_depth, self.max_depth, self.n_bins, dtype=x.dtype)
        logit = nn.relu(logit) + 0.1
        logit = logit / jnp.sum(logit, axis=-1, keepdims=True)
        return logit @ bins[:, None]
