"""Attention layers for the CDV update operator.

Reimplements the reference's LoFTR-style linear attention with
learnable-Fourier rotary encodings (reference: cdvslam/att_layers/
attention.py, layers.py). Groups are dense fixed-size (G, M, D) batches --
naturally TPU-shaped; the O(M) linear-attention kernel trick runs as two
small matmuls per group on the MXU.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def elu_feature_map(x):
    return nn.elu(x) + 1.0


def rotate_half(x):
    """(reference att_layers/layers.py:38-41)."""
    x = x.reshape(x.shape[:-1] + (-1, 2))
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape[:-2] + (-1,))


def apply_rotary(freqs, t):
    """t * cos + rotate_half(t) * sin (layers.py:44-45).

    freqs: (2, ..., D) stacked (cos, sin).
    """
    return t * freqs[0] + rotate_half(t) * freqs[1]


class LearnableFourierPositionalEncoding(nn.Module):
    """LightGlue-style positional encoding (layers.py:23-36).

    Input x: (..., M_in); output (2, ..., 1, F_dim) = stacked
    (cos, sin) with interleaved duplication.
    """
    m_in: int = 2
    f_dim: int = 48
    gamma: float = 1.0

    @nn.compact
    def __call__(self, x):
        Wr = nn.Dense(self.f_dim // 2, use_bias=False,
                      kernel_init=nn.initializers.normal(self.gamma ** -2))
        projected = Wr(x)
        cos, sin = jnp.cos(projected), jnp.sin(projected)
        emb = jnp.stack([cos, sin], 0)[..., None, :, :]  # (2, ..., 1, L, F/2)
        return jnp.repeat(emb, 2, axis=-1)


class LinearAttention(nn.Module):
    """ELU+1 linear attention, posenc hook v2 (applied after the feature
    map -- reference attention.py:71-101 with posenc_type == 'v2').
    q, k, v: (N, L, H, D). encoding: (2, N, 1, L, D) or None.
    """
    eps: float = 1e-6
    posenc_v2: bool = True

    @nn.compact
    def __call__(self, q, k, v, encoding=None):
        Q = elu_feature_map(q)
        K = elu_feature_map(k)
        # Z uses the *unrotated* features (reference computes Z before the
        # v2 hook at attention.py:88)
        Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + self.eps)
        if encoding is not None:
            # encoding: (2, N, 1, L, D) applied per head via transpose trick
            # (layers.py:110: x.transpose(1,2) -> (N,H,L,D))
            Q = apply_rotary(encoding, Q.swapaxes(1, 2)).swapaxes(1, 2)
            K = apply_rotary(encoding, K.swapaxes(1, 2)).swapaxes(1, 2)
        L = v.shape[1]
        v = v / L
        KV = jnp.einsum("nshd,nshv->nhdv", K, v)
        out = jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * L
        return out


class EncoderLayer(nn.Module):
    """Mickey/LoFTR transformer encoder layer (layers.py:50-125)."""
    d_model: int
    nhead: int = 8

    @nn.compact
    def __call__(self, x, encoding=None, only_residual=False):
        bs, L, _ = x.shape
        h, d = self.nhead, self.d_model // self.nhead
        q = nn.Dense(self.d_model, use_bias=False, name="q_proj")(x).reshape(bs, L, h, d)
        k = nn.Dense(self.d_model, use_bias=False, name="k_proj")(x).reshape(bs, L, h, d)
        v = nn.Dense(self.d_model, use_bias=False, name="v_proj")(x).reshape(bs, L, h, d)
        msg = LinearAttention()(q, k, v, encoding=encoding)
        msg = nn.Dense(self.d_model, use_bias=False, name="merge")(msg.reshape(bs, L, self.d_model))
        # torch nn.LayerNorm default eps (layers.py:81-82) is 1e-5
        msg = nn.LayerNorm(epsilon=1e-5, name="norm1")(msg)
        msg = jnp.concatenate([x, msg], axis=-1)
        msg = nn.Dense(2 * self.d_model, use_bias=False, name="mlp_0")(msg)
        msg = nn.relu(msg)
        msg = nn.Dense(self.d_model, use_bias=False, name="mlp_2")(msg)
        msg = nn.LayerNorm(epsilon=1e-5, name="norm2")(msg)
        if only_residual:
            return msg
        return x + msg


class GatedAttention(nn.Module):
    """x + sigmoid(gate(x)) * encoder(x) (layers.py:8-19)."""
    d_model: int
    nhead: int = 8

    @nn.compact
    def __call__(self, x, encoding=None):
        gate = nn.sigmoid(nn.Dense(self.d_model, name="gate")(x))
        res = EncoderLayer(self.d_model, self.nhead, name="encoder")(
            x, encoding=encoding, only_residual=True
        )
        return x + gate * res
