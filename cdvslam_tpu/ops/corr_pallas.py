"""Pallas TPU kernel for the patch correlation hot op.

The XLA version (ops/corr.py) is gather-bound: E*P*P*D*D ~ 1.2M row
gathers per level. Here the whole TARGET FRAME feature map is staged into
VMEM as the edge's input block -- Pallas re-fetches it only when the
block index changes, so with edges sorted by target frame each frame is
DMA'd once per contiguous run -- and the per-pixel (2R+2)^2 windows are
plain VMEM dynamic slices. Exact reference semantics (zero out-of-image
taps), no approximations.

Layouts: fmap (NF, H, W, C) channel-last; gmap (K, P*P, C).
VMEM budget: one (H, W, C) frame block double-buffered; at EuRoC/4 with
C=24 bf16 that is 2 x 1.06 MB.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel_bf16(ii_ref, jj_ref, base_ref,      # scalar prefetch
                      gmap_ref, frame_ref, out_ref,
                      *, D, P, C):
    """bf16 fast path: the whole window extraction runs on PACKED int32
    (each i32 element = two adjacent bf16 ROWS, Mosaic's sublane packing),
    so the expensive dynamic rotates touch HALF the bytes of the f32 path
    and need no widening:
      1. one full-width lane rotate brings the window columns to lane 0
      2. a static 8-lane slice shrinks the working set ~32x
      3. the row alignment is two TINY sublane rotates + an int merge that
         re-pairs rows when the shift is odd (hi(A) | lo(B) << 16).
    Bit-exact with the reference gather semantics."""
    e = pl.program_id(0)
    BAND = -(-(D + 8) // 8) * 8
    for p in range(P * P):
        iy = base_ref[e * 2 * P * P + 2 * p]
        ix = base_ref[e * 2 * P * P + 2 * p + 1]
        ay = pl.multiple_of((iy // 8) * 8, 8)
        band = frame_ref[0, :, pl.ds(ay, BAND), :]     # (C, BAND, Wp) bf16
        bp = pltpu.bitcast(band, jnp.int32)            # (C, BAND/2, Wp)
        rot = pltpu.roll(bp, -ix, 2)                   # cols ix.. -> lane 0
        rot = rot[:, :, :D]                            # (C, BAND/2, D)
        r = iy - ay                                    # in [0, 8)
        A = pltpu.roll(rot, -(r // 2), 1)
        B = pltpu.roll(rot, -(r // 2) - 1, 1)
        odd = ((A >> 16) & 0xFFFF) | (B << 16)         # re-pair odd shifts
        sel = jnp.where((r % 2) == 0, A, odd)[:, : D // 2]
        win = pltpu.bitcast(sel, jnp.bfloat16).astype(jnp.float32)
        gv = gmap_ref[0, :, p].astype(jnp.float32)     # (C,)
        dot = jnp.sum(win * gv[:, None, None], axis=0)
        out_ref[0, p] = dot.astype(out_ref.dtype)


def _corr_kernel(ii_ref, jj_ref, base_ref,           # scalar prefetch
                 gmap_ref, frame_ref, out_ref,
                 *, D, P, C):
    """frame_ref: (1, C, Hp, Wp) -- the target frame ZERO-PADDED by D on
    each spatial side (and Wp padded to a lane multiple), so every
    (possibly out-of-image) window is an in-bounds slice whose
    out-of-image taps read exact zeros (reference semantics). Channel
    lives on the sublane axis; the dynamic column offset is realized as a
    lane rotation (tpu dynamic_rotate), which has no alignment constraint.
    base_ref carries padded, clamped window origins."""
    e = pl.program_id(0)
    for p in range(P * P):
        iy = base_ref[e * 2 * P * P + 2 * p]
        ix = base_ref[e * 2 * P * P + 2 * p + 1]
        # sublane dynamic slices must be 8-aligned: load an aligned band
        # covering (iy - ay) <= 7 misalignment plus D rows, rounded up to
        # a sublane multiple, and rotate both axes into place
        BAND = -(-(D + 8) // 8) * 8
        ay = pl.multiple_of((iy // 8) * 8, 8)
        band = frame_ref[0, :, pl.ds(ay, BAND), :]    # (C, BAND, Wp)
        # dynamic rotate requires 32-bit data; promote (bf16 inputs stay
        # bf16 in VMEM, only the small band is widened)
        band = band.astype(jnp.float32)
        band = pltpu.roll(band, ay - iy, 1)           # rows iy.. -> 0..
        rot = pltpu.roll(band, -ix, 2)                # cols ix.. -> 0..
        win = rot[:, :D, :D]                          # (C, D, D)
        gv = gmap_ref[0, :, p].astype(jnp.float32)    # (C,)
        dot = jnp.sum(win * gv[:, None, None], axis=0)
        out_ref[0, p] = dot.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("radius",))
def _corr_pallas_sorted(gmap, fmap_cl, coords, ii, jj, radius):
    K, C, PP = gmap.shape
    NF, H, W, _ = fmap_cl.shape
    E = coords.shape[0]
    P = int(np.sqrt(PP))
    D = 2 * radius + 2

    x = coords[:, 0]
    y = coords[:, 1]
    # window origins in PADDED frame coordinates (+D), clamped into the
    # padded area: fully-out-of-image windows land entirely in the zero pad
    iy0 = jnp.clip(jnp.floor(y).astype(jnp.int32) - radius + D, 0, H + D)
    ix0 = jnp.clip(jnp.floor(x).astype(jnp.int32) - radius + D, 0, W + D)
    base = jnp.stack([iy0.reshape(E, -1), ix0.reshape(E, -1)], -1).reshape(E * 2 * PP)

    BAND = -(-(D + 8) // 8) * 8
    # rows: D pad on top; bottom pad covers D plus the aligned-band
    # overshoot; total rounded to a sublane multiple
    Hp = -(-(H + 2 * D + BAND) // 8) * 8
    Wp = -(-(W + 2 * D) // 128) * 128                 # lane-aligned
    # (NF, C, Hp, Wp): channel on sublanes, width on lanes
    fpad = jnp.pad(fmap_cl.transpose(0, 3, 1, 2),
                   ((0, 0), (0, 0), (D, Hp - H - D), (D, Wp - W - D)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(E,),
        in_specs=[
            pl.BlockSpec((1, C, PP), lambda e, ii_r, jj_r, b_r: (ii_r[e], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Hp, Wp), lambda e, ii_r, jj_r, b_r: (jj_r[e], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, PP, D, D), lambda e, *_: (e, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    # The packed-int32 variant halves roll bytes but measured SLOWER inside
    # the fused frame program (narrow-lane int ops waste VPU tiles); keep it
    # opt-in for future Mosaic versions. Measured per-edge cost decomposes
    # as ~250 cyc/grid-step fixed + ~119 cyc/pixel either way.
    import os
    use_bf16 = (fmap_cl.dtype == jnp.bfloat16 and D % 2 == 0
                and os.environ.get("CDVSLAM_CORR_PACKED") == "1")
    kern = _corr_kernel_bf16 if use_bf16 else _corr_kernel
    vol = pl.pallas_call(
        partial(kern, D=D, P=P, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, PP, D, D), gmap.dtype),
    )(ii.astype(jnp.int32), jj.astype(jnp.int32), base.astype(jnp.int32),
      gmap, fpad)
    return vol


@partial(jax.jit, static_argnames=("radius",))
def corr_pallas(gmap, fmap, coords, ii, jj, radius: int = 3):
    """Pallas patch correlation; same signature/result as ops.corr.

    gmap: (B, K, C, P, P); fmap: (B, NF, C, H, W); coords (B, E, 2, P, P).
    Edges are sorted by target frame internally so each frame block is
    staged into VMEM once per contiguous run.
    """
    B, K, C, P, _ = gmap.shape
    _, NF, _, H, W = fmap.shape
    E = coords.shape[1]
    D = 2 * radius + 2

    order = jnp.argsort(jj)
    inv = jnp.argsort(order)
    jj_s = jnp.take(jj, order)
    ii_s = jnp.take(ii, order)
    coords_s = jnp.take(coords[0], order, axis=0)

    fmap_cl = fmap[0].transpose(0, 2, 3, 1)                 # (NF, H, W, C)
    gm = gmap[0].reshape(K, C, P * P)                       # (K, C, P*P)

    vol_s = _corr_pallas_sorted(gm, fmap_cl, coords_s, ii_s, jj_s, radius)
    vol = jnp.take(vol_s, inv, axis=0)                      # back to edge order
    vol = vol.reshape(E, P, P, D, D).transpose(0, 3, 4, 1, 2)

    x = coords[0, :, 0]
    y = coords[0, :, 1]
    dxf = (x - jnp.floor(x)).astype(vol.dtype)[:, None, None]
    dyf = (y - jnp.floor(y)).astype(vol.dtype)[:, None, None]
    out = (1 - dxf) * (1 - dyf) * vol[:, : D - 1, : D - 1]
    out = out + dxf * (1 - dyf) * vol[:, : D - 1, 1:]
    out = out + (1 - dxf) * dyf * vol[:, 1:, : D - 1]
    out = out + dxf * dyf * vol[:, 1:, 1:]
    return out.transpose(0, 2, 1, 3, 4)[None]
