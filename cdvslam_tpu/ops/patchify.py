"""Patch gather ("patchify") op.

TPU-native replacement for the reference CUDA kernel
(reference: cdvslam/altcorr/correlation_kernel.cu:17-80 and
cdvslam/altcorr/correlation.py:51-71). Gathers C x D x D patches at float
coordinates from a feature map, with zero padding out of bounds, then
either 4-tap bilinear blending (``mode='bilinear'``) or the integer
upper-left sample (``mode='upperleft'``).

Implemented as masked flat gathers -- fixed shapes, fully jittable,
differentiable (the VJP is the scatter-add the reference hand-writes).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("radius", "mode"))
def patchify(net: jnp.ndarray, coords: jnp.ndarray, radius: int, mode: str = "bilinear") -> jnp.ndarray:
    """Extract patches at float coords.

    Args:
      net:    (N, C, H, W) feature maps.
      coords: (N, M, 2) float (x, y) patch centers.
      radius: patch radius R; raw gather diameter is D = 2R + 2.
      mode:   'bilinear' -> (N, M, C, 2R+1, 2R+1);
              'upperleft' -> (N, M, C, 1, 1);
              'raw' -> (N, M, C, D, D) un-blended.

    Matches reference semantics: row index i = floor(y) + (di - R),
    col index j = floor(x) + (dj - R); out-of-bounds reads are zero.
    """
    N, C, H, W = net.shape
    M = coords.shape[1]
    D = 2 * radius + 2

    x = coords[..., 0]
    y = coords[..., 1]
    ix0 = jnp.floor(x).astype(jnp.int32)
    iy0 = jnp.floor(y).astype(jnp.int32)

    di = jnp.arange(D, dtype=jnp.int32) - radius
    iy = iy0[..., None, None] + di[:, None]        # (N, M, D, 1)
    ix = ix0[..., None, None] + di[None, :]        # (N, M, 1, D)
    iy = jnp.broadcast_to(iy, (N, M, D, D))
    ix = jnp.broadcast_to(ix, (N, M, D, D))

    inb = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    flat_idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)  # (N, M, D, D)

    flat = net.reshape(N, C, H * W)

    def gather_frame(fm, idx):
        # fm (C, H*W), idx (M, D, D) -> (M, C, D, D)
        g = jnp.take(fm, idx.reshape(-1), axis=1, mode="clip")   # (C, M*D*D)
        return g.reshape(C, M, D, D).transpose(1, 0, 2, 3)

    patches = jax.vmap(gather_frame)(flat, flat_idx)          # (N, M, C, D, D)
    patches = jnp.where(inb[:, :, None], patches, 0.0)

    if mode == "raw":
        return patches
    if mode == "upperleft":
        return patches[..., radius : radius + 1, radius : radius + 1]

    # bilinear: 4-tap blend of the integer-shifted volumes
    # (reference correlation.py:57-66)
    d = 2 * radius + 1
    dx = (x - jnp.floor(x))[..., None, None, None].astype(net.dtype)
    dy = (y - jnp.floor(y))[..., None, None, None].astype(net.dtype)
    x00 = (1 - dy) * (1 - dx) * patches[..., :d, :d]
    x01 = (1 - dy) * (dx) * patches[..., :d, 1:]
    x10 = (dy) * (1 - dx) * patches[..., 1:, :d]
    x11 = (dy) * (dx) * patches[..., 1:, 1:]
    return x00 + x01 + x10 + x11
