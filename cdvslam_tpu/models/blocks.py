"""NN building blocks (reference: cdvslam/blocks.py).

SoftAgg's torch_scatter softmax/sum becomes deterministic segment ops with
a static segment capacity (TPU-friendly fixed shapes + masking).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.scatter import segment_softmax, segment_sum


class MLP2(nn.Module):
    """Linear -> ReLU -> Linear (the reference's c1/c2 blocks)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim)(x)
        x = nn.relu(x)
        return nn.Dense(self.dim)(x)


class GatedResidual(nn.Module):
    """x + sigmoid(gate(x)) * res(x) (reference blocks.py:15-29)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        gate = nn.sigmoid(nn.Dense(self.dim)(x))
        res = nn.Dense(self.dim)(nn.relu(nn.Dense(self.dim)(x)))
        return x + gate * res


class SoftAgg(nn.Module):
    """Scatter-softmax attention pooling over index groups
    (reference blocks.py:31-48). ``ids`` must be pre-localized to
    [0, num_segments); masked elements get ids == num_segments.
    """
    dim: int
    expand: bool = True

    @nn.compact
    def __call__(self, x, ids, num_segments, mask=None):
        # x: (B, E, D); segment ops run on axis 0 of (E, D)
        B, E, D = x.shape
        f = nn.Dense(self.dim)(x)
        g = nn.Dense(self.dim)(x)

        def agg(f1, g1):
            w = segment_softmax(g1, ids, num_segments, mask=mask)
            return segment_sum(f1 * w, ids, num_segments)

        y = jax.vmap(agg)(f, g)
        h = nn.Dense(self.dim)(y)
        if self.expand:
            return jnp.take(h, ids, axis=1, mode="clip")
        return h


@jax.custom_vjp
def gradient_clip(x):
    """Identity forward; backward NaN-zeroing + clamp to +-0.01
    (reference blocks.py:74-89). Matters for training stability only.
    """
    return x


def _gc_fwd(x):
    return x, None


def _gc_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.clip(g, -0.01, 0.01),)


gradient_clip.defvjp(_gc_fwd, _gc_bwd)


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps)(x)
