"""Patch extraction: selection strategies + feature/patch gathers.

Reimplements the reference's Patchifier/SemanticPatchifier gather logic
(reference: cdvslam/net_dpv.py:95-159, cdvslam/net_cdv.py:279-387) as pure
functions over the encoder outputs. Selection strategies: RANDOM,
GRADIENT_BIAS, RANDOM_GRID, SCORE (Gumbel top-k replaces
torch.multinomial -- distributionally equivalent sampling w/o replacement).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.patchify import patchify


def image_gradient(images):
    """Pooled gray gradient magnitude (reference net_dpv.py:102-108).

    images: (B, N, H, W, 3) in the reference's normalized range.
    Returns (B, N, H//4, W//4).
    """
    gray = jnp.sum((images + 0.5) * (255.0 / 2), axis=-1)
    dx = gray[..., :-1, 1:] - gray[..., :-1, :-1]
    dy = gray[..., 1:, :-1] - gray[..., :-1, :-1]
    g = jnp.sqrt(dx ** 2 + dy ** 2)
    B, N, H1, W1 = g.shape
    g = g.reshape(B * N, H1, W1, 1)
    g = jax.lax.reduce_window(g, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1), "VALID") / 16.0
    return g.reshape(B, N, H1 // 4, W1 // 4)


def select_random(key, n, M, h, w):
    """RANDOM strategy (net_dpv.py:132-134): integer coords in [1, dim-1)."""
    kx, ky = jax.random.split(key)
    x = jax.random.randint(kx, (n, M), 1, w - 1)
    y = jax.random.randint(ky, (n, M), 1, h - 1)
    return jnp.stack([x, y], -1).astype(jnp.float32)


def select_gradient_bias(key, images, M, h, w):
    """GRADIENT_BIAS (net_dpv.py:120-130): 3M random candidates, keep the
    M with the highest pooled gradient."""
    n = images.shape[1]
    kx, ky = jax.random.split(key)
    x = jax.random.randint(kx, (n, 3 * M), 1, w - 1)
    y = jax.random.randint(ky, (n, 3 * M), 1, h - 1)
    g = image_gradient(images)[0]                       # (n, h, w)
    vals = jax.vmap(lambda gm, yy, xx: gm[yy, xx])(g, y, x)
    idx = jnp.argsort(vals, axis=1)[:, -M:]
    x = jnp.take_along_axis(x, idx, 1)
    y = jnp.take_along_axis(y, idx, 1)
    return jnp.stack([x, y], -1).astype(jnp.float32)


def select_random_grid(key, n, M, hi, wi, P, scale_f2i, upperleft=True):
    """RANDOM_GRID (net_cdv.py:334-348): random subset of the coarse
    (DINO-resolution) grid, mapped to fine coords, shared across frames."""
    yy, xx = jnp.meshgrid(
        jnp.arange(P // 2, hi - P // 2), jnp.arange(P // 2, wi - P // 2), indexing="ij"
    )
    if upperleft:
        y = (yy / scale_f2i).reshape(-1)
        x = (xx / scale_f2i).reshape(-1)
    else:
        y = ((yy + 0.5) / scale_f2i).reshape(-1)
        x = ((xx + 0.5) / scale_f2i).reshape(-1)
    # wrap around when M exceeds the candidate pool (tiny images) --
    # the reference asserts implicitly via shape mismatch; tiling keeps
    # small-resolution runs usable
    perm = jax.random.permutation(key, y.shape[0])
    reps = -(-M // y.shape[0])
    inds = jnp.tile(perm, reps)[-M:]
    y = jnp.broadcast_to(y[inds], (n, M))
    x = jnp.broadcast_to(x[inds], (n, M))
    return jnp.stack([x, y], -1).astype(jnp.float32)


def select_score(key, score_map, M, scale_f2i, upperleft=True):
    """SCORE (net_cdv.py:314-329): multinomial sampling without
    replacement by score -- implemented as Gumbel top-k."""
    n, hi, wi = score_map.shape
    logits = jnp.log(jnp.clip(score_map.reshape(n, hi * wi), min=1e-12))
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape, minval=1e-12, maxval=1.0)))
    _, hw_inds = jax.lax.top_k(logits + gumbel, M)
    scores = jnp.take_along_axis(score_map.reshape(n, hi * wi), hw_inds, 1).reshape(-1)
    y = hw_inds // wi
    x = hw_inds - y * wi
    if upperleft:
        y = y / scale_f2i
        x = x / scale_f2i
    else:
        y = (y + 0.5) / scale_f2i
        x = (x + 0.5) / scale_f2i
    return jnp.stack([x, y], -1).astype(jnp.float32), scores


def seg_binary_score(filt_mask, n, hi, wi):
    """Binary selection-score map from a per-token dynamic-class mask
    (reference net_cdv.py:231-238): score 1 on static tokens, 0 on dynamic
    tokens and on the image border rows/cols. Feeding this into
    :func:`select_score` IS the reference's selection-time seg filtering
    (no-score-head SCORE strategy).

    filt_mask: (n*hi*wi,) bool, True = dynamic. Returns (n, hi, wi) float.
    """
    s = (~filt_mask).astype(jnp.float32).reshape(n, hi, wi)
    s = s.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    s = s.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
    return s


def coords_grid_with_index(d):
    """(x, y, disp) grid (reference utils.py:39-54). d: (B,N,H,W)."""
    B, N, H, W = d.shape
    x = jnp.arange(W, dtype=d.dtype)
    y = jnp.arange(H, dtype=d.dtype)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    xx = jnp.broadcast_to(xx, (B, N, H, W))
    yy = jnp.broadcast_to(yy, (B, N, H, W))
    return jnp.stack([xx, yy, d], axis=2)              # (B, N, 3, H, W)


@partial(jax.jit, static_argnames=("P",))
def extract_patches(fmap, imap, images, disps, coords, P=3):
    """Gather gmap/imap/color/xy-depth patches at selected coords.

    fmap: (N, Cf, Hf, Wf) matching features (1/4 res, NCHW)
    imap: (N, Ci, Hi, Wi) context features (1/4 res for DPVO)
    images: (N, H, W, 3) original-resolution (normalized)
    disps: (N, Hf, Wf) inverse depth init
    coords: (N, M, 2) fine-res patch centers
    Returns gmap (N,M,Cf,P,P), ictx (N,M,Ci), clr (N,M,3), patches (N,M,3,P,P).
    """
    N, M, _ = coords.shape
    ictx = patchify(imap, coords, 0, mode="upperleft")[..., 0, 0]       # (N,M,Ci)
    gmap = patchify(fmap, coords, P // 2, mode="bilinear")              # (N,M,Cf,P,P)
    img_nchw = images.transpose(0, 3, 1, 2)
    clr = patchify(img_nchw, 4 * (coords + 0.5), 0, mode="bilinear")[..., 0, 0]
    grid = coords_grid_with_index(disps[None])[0]                        # (N,3,Hf,Wf)
    patches = patchify(grid, coords, P // 2, mode="bilinear")            # (N,M,3,P,P)
    return gmap, ictx, clr, patches


def pyramidify(fmap, lvls=(1, 4)):
    """Average-pool pyramid (reference utils.py:65-74). fmap (N,C,H,W)."""
    out = []
    N, C, H, W = fmap.shape
    x = fmap.transpose(0, 2, 3, 1)
    for lvl in lvls:
        if lvl == 1:
            out.append(fmap)
        else:
            p = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, lvl, lvl, 1), (1, lvl, lvl, 1), "VALID"
            ) / (lvl * lvl)
            out.append(p.transpose(0, 3, 1, 2))
    return out
