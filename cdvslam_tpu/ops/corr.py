"""Local patch correlation op (the SLAM hot kernel).

TPU-native replacement for the reference CUDA correlation kernel
(reference: cdvslam/altcorr/correlation_kernel.cu:83-136 forward,
:221-232 bilinear blend). For every edge e = (patch kk[e] -> frame jj[e])
it computes the dot product of the patch's C-dim source feature (gmap)
against a (2R+2)^2 neighborhood of the target feature map at the
reprojected coordinates, then blends the 4 integer-shifted volumes
bilinearly to a (2R+1)^2 volume.

Output layout matches the reference exactly (including the
permute(0,1,3,2,4,5) at correlation_kernel.cu:232): (B, E, Dx, Dy, P, P)
so that flattened correlation features feed the same MLP weights.

This XLA version chunks edges through ``lax.map`` to bound the gathered
window memory; a fused Pallas kernel is in corr_pallas.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("radius", "chunk"))
def corr(
    gmap: jnp.ndarray,      # (B, K, C, P, P) source patch features
    fmap: jnp.ndarray,      # (B, NF, C, H, W) target feature maps
    coords: jnp.ndarray,    # (B, E, 2, P, P) reprojected coords (x, y)
    ii: jnp.ndarray,        # (E,) index into gmap's K axis
    jj: jnp.ndarray,        # (E,) index into fmap's NF axis
    radius: int = 3,
    chunk: int = 256,
) -> jnp.ndarray:
    """Returns (B, E, 2R+1, 2R+1, P, P) correlation volume (x-offset first)."""
    B, K, C, P, _ = gmap.shape
    _, NF, _, H, W = fmap.shape
    E = coords.shape[1]
    D = 2 * radius + 2
    assert B == 1, "batch 1 only (matches reference SLAM usage)"

    fflat = fmap[0].transpose(0, 2, 3, 1).reshape(NF * H * W, C)  # (NF*H*W, C)
    g = jnp.take(gmap[0], ii, axis=0, mode="clip")                             # (E, C, P, P)

    x = coords[0, :, 0]                                           # (E, P, P)
    y = coords[0, :, 1]
    ix0 = jnp.floor(x).astype(jnp.int32)
    iy0 = jnp.floor(y).astype(jnp.int32)
    base = (jj.astype(jnp.int32) * H * W)[:, None, None]          # (E,1,1)

    di = jnp.arange(D, dtype=jnp.int32) - radius

    npad = (-E) % chunk
    if npad:
        g = jnp.pad(g, ((0, npad), (0, 0), (0, 0), (0, 0)))
        ix0 = jnp.pad(ix0, ((0, npad), (0, 0), (0, 0)))
        iy0 = jnp.pad(iy0, ((0, npad), (0, 0), (0, 0)))
        base = jnp.pad(base, ((0, npad), (0, 0), (0, 0)))
    nchunks = (E + npad) // chunk

    # everything crossing the lax.map boundary is FLATTENED to 2-D
    # (chunk, features): trailing (P, P) / (D, D) dims pad 5-16x under
    # TPU (8,128) tiling, and the backward of lax.map stacks the body's
    # residuals across ALL chunks -- at training scale (E=24480) the
    # stacked padded masks/windows alone were >4 GiB of HLO temps. The
    # checkpoint on the body keeps only these compact inputs as scan
    # residuals and rematerializes the gathered windows per chunk.
    @jax.checkpoint
    def do_chunk(args):
        gcf, ix0f, iy0f, basec = args                             # (chunk, .)
        gc = gcf.reshape(chunk, C, P, P)
        ix0c = ix0f.reshape(chunk, P, P)
        iy0c = iy0f.reshape(chunk, P, P)
        iy = iy0c[..., None, None] + di[:, None]                  # (chunk,P,P,D,1)
        ix = ix0c[..., None, None] + di[None, :]                  # (chunk,P,P,1,D)
        iy = jnp.broadcast_to(iy, iy0c.shape + (D, D))
        ix = jnp.broadcast_to(ix, ix0c.shape + (D, D))
        inb = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        idx = basec[..., None, None, None] + jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        f = jnp.take(fflat, idx.reshape(-1), axis=0, mode="clip")              # (chunk*P*P*D*D, C)
        f = f.reshape(chunk, P, P, D, D, C)
        f = jnp.where(inb[..., None], f, 0.0)
        # dot over channels on the MXU
        c = jnp.einsum("ecpq,epqijc->eijpq", gc, f,
                       preferred_element_type=jnp.float32).astype(gc.dtype)
        return c.reshape(chunk, D * D * P * P)                    # flat out

    parts = jax.lax.map(
        do_chunk,
        (
            g.reshape(nchunks, chunk, C * P * P),
            ix0.reshape(nchunks, chunk, P * P),
            iy0.reshape(nchunks, chunk, P * P),
            base.reshape(nchunks, chunk, 1),
        ),
    )
    vol = parts.reshape(nchunks * chunk, D, D, P, P)[:E]          # (E, Dy, Dx, P, P)

    # 4-tap bilinear blend over the window axes (correlation_kernel.cu:221-232)
    dxf = (x - jnp.floor(x)).astype(vol.dtype)[:, None, None]     # (E,1,1,P,P)
    dyf = (y - jnp.floor(y)).astype(vol.dtype)[:, None, None]
    out = (1 - dxf) * (1 - dyf) * vol[:, : D - 1, : D - 1]
    out = out + dxf * (1 - dyf) * vol[:, : D - 1, 1:]
    out = out + (1 - dxf) * dyf * vol[:, 1:, : D - 1]
    out = out + dxf * dyf * vol[:, 1:, 1:]

    # match reference output layout: swap window axes -> (E, Dx, Dy, P, P)
    return out.transpose(0, 2, 1, 3, 4)[None]
