"""Pallas TPU kernel for the patch correlation hot op.

TPU-native replacement for the reference CUDA correlation kernel
(reference: cdvslam/altcorr/correlation_kernel.cu:83-136 forward,
:221-232 bilinear blend). Exact reference semantics: D = 2R+2 integer
taps per patch pixel, out-of-image taps read zero, 4-tap bilinear blend
to (2R+1)^2, output layout (B, E, Dx, Dy, P, P).

Design (v3). Window extraction is reformulated as ONE-HOT GATHER
MATMULS so the MXU does the gathering and the VPU only builds tiny 0/1
selection matrices. Per edge (all P*P pixels together):

    band = frame[s, :, ty:ty+TH, txb:txb+128]     # one lane tile wide
    G2[(c,y),(p,u)] = g[c,p] * [y == ry_p + u]    # row one-hot * gmap
    T    = G2^T @ band.(C*TH, 128)                # channel+row contract (MXU)
    out2 = T(PPD, 128) @ CM0(128, PPD)            # column one-hot     (MXU)
    vol  = block-diagonal of out2                 # (PP, D, D) taps
    out  = 4-tap bilinear blend (XLA side)        # (PP, D-1, D-1)

The contraction order (channels/rows first) keeps the dominant matmul
at PPD x (C*TH) x 128; the one-lane-wide band is possible because the
frame is staged as TWO COPIES shifted by 64 px, so any 64-aligned
column origin is 128-aligned in one of the copies (x-span <= 74 always
fits; no x fallback exists).

Edges are pre-sorted by target frame and each frame's run is padded to
a multiple of the per-step edge tile TE, so every grid step touches ONE
frame, held in a VMEM scratch cache that is re-filled by an explicit
DMA only when the target frame changes (~NF fetches per call). The sort
order and padding can be computed on the host (plan_corr_order) or on
device (fallback here); outputs are written in sorted order and
un-permuted by one XLA gather.

Rare edges whose pixel windows spread beyond the shared 24-row band
(wild reprojections, clamp straddling) take an exact fallback that runs
the same one-hot machinery against the full padded frame.
"""
from __future__ import annotations

import os as _os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TE = int(_os.environ.get("CORR_TE", "8"))   # edges per grid step
TH = int(_os.environ.get("CORR_TH", "24"))  # shared row band height
TWB = 128                                   # column band width (one lane tile)
XSHIFT = 64                                 # copy-1 column shift


def _gather_consts(cdt, C, TH_, WB, PP, D):
    """Edge-invariant selection constants, built ONCE per grid step and
    shared by all TE edges (inside the per-edge pl.when closures Mosaic
    re-materializes them per edge, which measured ~430 cyc/edge)."""
    PPD = PP * D
    rowio = jax.lax.broadcasted_iota(jnp.int32, (C * TH_, 1), 0)
    y_of_row = rowio % TH_
    c_of_row = rowio // TH_
    cio = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    ohc = (c_of_row == cio).astype(cdt)                     # (C*TH_, C)
    wio = jax.lax.broadcasted_iota(jnp.int32, (WB, 1), 0)   # (WB, 1)
    puio = jax.lax.broadcasted_iota(jnp.int32, (PPD, 1), 0)
    qvio = jax.lax.broadcasted_iota(jnp.int32, (1, PPD), 1)
    blockdiag = (puio // D) == (qvio // D)                  # (PPD, PPD)
    vio = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    sumq = ((puio % D) == vio).astype(jnp.float32)          # (PPD, D)
    return ohc, y_of_row, wio, blockdiag, sumq


def _gather_T(band2d, gexp, tap_x, tap_y, consts):
    """Gather PP windows of D x D taps from ``band2d`` ((C*TH_, WB) feature
    band) and contract channels with pre-expanded patch features ``gexp``
    ((C, PP*D), column (p, u) -> g[c, p]) via one-hot matmuls.
    tap_x, tap_y: (1, PP*D) int32, column (p, u) -> window origin + u,
    relative to the band. Returns (PP*D, D) f32 with
    vol[(p, u), v] = sum_c g[c, p] * band[c, tap_y[p]+u, tap_x[p]+v],
    i.e. rows are (pixel, y-tap), columns are x-taps.
    Reshape-free by construction (Mosaic rejects lane-dim reshapes)."""
    cdt = band2d.dtype
    ohc, y_of_row, wio, blockdiag, sumq = consts
    # G2[(c, y), (p, u)] = g[c, p] * [y == tap_y[(p, u)]]
    grep = jax.lax.dot_general(                             # (C*TH_, PPD)
        ohc, gexp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)
    G2 = jnp.where(y_of_row == tap_y, grep, jnp.zeros((), cdt))
    # T[(p, u), x] = sum_{c,y} g[c, p] [y == ry_p+u] band[(c, y), x]
    T = jax.lax.dot_general(
        G2, band2d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (PPD, WB)
    # column one-hot: CM0[x, (q, v)] = [x == tap_x[(q, v)]]
    cm0 = (wio == tap_x).astype(jnp.float32)                # (WB, PPD)
    out2 = jax.lax.dot_general(
        T, cm0, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (PPD, PPD)
    # keep only q == p blocks and sum q out via a 0/1 matmul:
    # vol[(p, u), v] = sum_{(q, v')} [q == p][v' == v] out2[(p,u),(q,v')]
    out2m = jnp.where(blockdiag, out2, 0.0)
    vol = jax.lax.dot_general(
        out2m, sumq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (PPD, D)
    return vol


def _corr_kernel_v4(jjs_ref, tys_ref, txbs_ref, ss_ref, oky_ref,  # prefetch
                    ge_ref, rxe_ref, rye_ref, frame_hbm, out_ref,
                    fcache, sem,
                    *, C, PP, D, Hp, Wpc, TH_):
    """One grid step = TE edges sharing one target frame.

    The frame pyramid stays in HBM (ANY space); a VMEM scratch caches the
    current target frame and is re-filled by an explicit DMA ONLY when
    jj changes between steps (edges are sorted by target frame, so ~NF
    fetches per call instead of one 3 MB block DMA per step -- the
    pipelined-BlockSpec version re-fetched every step and was pure
    overhead).

    frame_hbm: (NF, 2, C, Hp, Wpc) padded frame + 64-px-shifted copy
    fcache:    (2, C, Hp, Wpc) VMEM scratch (current frame)
    ge_ref:  (TE, C, PP*D) patch features pre-expanded to tap columns
    rxe_ref: (TE, PP*D) int32 column tap indices, relative to txb
    rye_ref: (TE, PP*D) int32 row tap indices, relative to ty
    oky_ref: (E',) int32 fast-path flag (row taps fit the shared band)
    out:     (TE, PP*D, D) f32 raw tap volumes, (p, u)-major rows
    """
    g = pl.program_id(0)

    @pl.when((g == 0) | (jjs_ref[g] != jjs_ref[jnp.maximum(g - 1, 0)]))
    def _fetch():
        cp = pltpu.make_async_copy(frame_hbm.at[jjs_ref[g]], fcache, sem)
        cp.start()
        cp.wait()

    cdt = fcache.dtype
    consts = _gather_consts(cdt, C, TH_, TWB, PP, D)

    # The fast path runs UNCONDITIONALLY for every edge: the one-hot
    # gather is bounds-safe by construction (out-of-range tap indices
    # match no row/column and contribute zeros), and keeping the loop
    # branch-free lets Mosaic overlap MXU/VPU work across edges --
    # per-edge pl.when regions act as scheduling barriers and measured
    # ~2x slower. Fallback edges get garbage here and are overwritten
    # by the (rare) exact slow path below.
    for t in range(TE):
        e = g * TE + t
        ty = pl.multiple_of(tys_ref[e], 8)
        txb = pl.multiple_of(txbs_ref[e], 128)
        s = ss_ref[e]
        band2d = fcache[s, :, pl.ds(ty, TH_),
                        pl.ds(txb, TWB)].reshape(C * TH_, TWB)
        out_ref[t] = _gather_T(
            band2d, ge_ref[t], rxe_ref[t:t + 1], rye_ref[t:t + 1], consts
        ).astype(out_ref.dtype)

    if _os.environ.get("CORR_NOSLOW") != "1":
        for t in range(TE):
            e = g * TE + t

            @pl.when(oky_ref[e] == 0)
            def _slow():
                # exact fallback (pathological row spread): gather from
                # the FULL padded frame (copy 0) with absolute taps;
                # pl.when regions are jumped over, so this only costs on
                # actual fallback edges (rare)
                full2d = fcache[0].reshape(C * Hp, Wpc)
                out_ref[t] = _gather_T(
                    full2d, ge_ref[t],
                    rxe_ref[t:t + 1] + txbs_ref[e] + XSHIFT * ss_ref[e],
                    rye_ref[t:t + 1] + tys_ref[e],
                    _gather_consts(cdt, C, Hp, Wpc, PP, D)
                ).astype(out_ref.dtype)


def plan_corr_order(jj_np, NF, E_pad):
    """Host-side (numpy) edge ordering for the kernel: edges sorted by
    target frame, each frame's run padded to a multiple of TE with the
    sentinel index E (a zero row appended to the per-edge inputs).
    Returns (order, jj_steps, inv) with len(order) = E_pad static."""
    E = len(jj_np)
    order_real = np.argsort(jj_np, kind="stable")
    jj_s = np.asarray(jj_np)[order_real]
    order = np.full(E_pad, E, np.int64)
    jj_steps = np.zeros(E_pad // TE, np.int32)
    pos = 0
    start = 0
    while start < E:
        f = jj_s[start]
        end = start
        while end < E and jj_s[end] == f:
            end += 1
        n = end - start
        npad = -(n % -TE)
        assert pos + n + npad <= E_pad, "corr order pad overflow"
        order[pos:pos + n] = order_real[start:end]
        jj_steps[pos // TE:(pos + n + npad) // TE] = f
        pos += n + npad
        start = end
    # positions of real edges inside the padded order
    posn = np.nonzero(order < E)[0]
    inv = np.zeros(E, np.int64)
    inv[order[posn]] = posn
    return order, jj_steps, inv


def _plan_corr_order_jnp(jj, NF, E_pad):
    """Device-side fallback of plan_corr_order (used when no host plan is
    passed, e.g. unit tests): same outputs as jnp arrays."""
    E = jj.shape[0]
    order_real = jnp.argsort(jj, stable=True)
    jj_s = jnp.take(jj, order_real)
    counts = jnp.zeros(NF, jnp.int32).at[jj_s].add(1)
    padded = -(counts % -TE) + counts
    base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    rank = jnp.arange(E, dtype=jnp.int32) - jnp.take(starts, jj_s)
    pos = jnp.take(base, jj_s) + rank                       # (E,)
    order = jnp.full((E_pad,), E, jnp.int32).at[pos].set(
        order_real.astype(jnp.int32))
    # frame id per step: scatter jj over padded runs, then per-step max
    stepf = jnp.zeros((E_pad,), jnp.int32).at[pos].max(jj_s.astype(jnp.int32))
    jj_steps = jnp.max(stepf.reshape(E_pad // TE, TE), axis=1)
    inv = jnp.zeros((E,), jnp.int32).at[order_real].set(pos)
    return order, jj_steps, inv


@partial(jax.jit, static_argnames=("radius", "E_pad_static"))
def _corr_pallas_planned(gmap, fmap, coords, ii, jj, order, jj_steps, inv,
                         radius, E_pad_static):
    """Run the v3 kernel given an edge-order plan. gmap (K, C, PP);
    fmap (NF, C, H, W); coords (E, 2, P, P)."""
    K, C, PP = gmap.shape
    NF, _, H, W = fmap.shape
    E = coords.shape[0]
    P = int(np.sqrt(PP))
    D = 2 * radius + 2
    EP = E_pad_static

    Hp = max(-(-(H + 2 * D) // 8) * 8, TH)
    Wpc = max(-(-(W + 2 * D) // 128) * 128, TWB)
    TH_ = min(TH, Hp)
    # frame zero-padded by D each side, plus a 64-px-shifted second copy
    # so every 64-aligned column origin is 128-aligned in one copy
    fpadx = jnp.pad(fmap, ((0, 0), (0, 0), (D, Hp - H - D),
                           (D, Wpc + XSHIFT - W - D)))
    fdup = jnp.stack([fpadx[:, :, :, :Wpc],
                      fpadx[:, :, :, XSHIFT:XSHIFT + Wpc]], axis=1)

    x = coords[:, 0].reshape(E, PP)
    y = coords[:, 1].reshape(E, PP)
    ix0 = jnp.clip(jnp.floor(x).astype(jnp.int32) - radius + D, 0, W + D)
    iy0 = jnp.clip(jnp.floor(y).astype(jnp.int32) - radius + D, 0, H + D)
    fx = (x - jnp.floor(x)).astype(jnp.float32)
    fy = (y - jnp.floor(y)).astype(jnp.float32)

    ty = jnp.clip((jnp.min(iy0, axis=1) // 8) * 8, 0, Hp - TH_)
    a64 = jnp.clip((jnp.min(ix0, axis=1) // XSHIFT) * XSHIFT,
                   0, Wpc + XSHIFT - TWB)
    s = (a64 % TWB) // XSHIFT                               # copy index
    txb = a64 - XSHIFT * s                                  # 128-aligned
    ry = iy0 - ty[:, None]                                  # (E, PP)
    rx = ix0 - a64[:, None]
    oky = (jnp.all((ry >= 0) & (ry <= TH_ - D), axis=1)
           & jnp.all((rx >= 0) & (rx <= TWB - D), axis=1)).astype(jnp.int32)
    # tap vectors, pre-expanded to (p, u) columns (kernel is reshape-free)
    dtap = jnp.arange(D, dtype=jnp.int32)
    rxe = (rx[:, :, None] + dtap).reshape(E, PP * D)
    rye = (ry[:, :, None] + dtap).reshape(E, PP * D)

    ge = jnp.take(gmap, ii, axis=0, mode="clip")            # (E, C, PP)
    ge = jnp.repeat(ge, D, axis=2)                          # (E, C, PP*D)

    def reorder(a, fill=0):
        a_ext = jnp.concatenate(
            [a, jnp.full((1,) + a.shape[1:], fill, a.dtype)], axis=0)
        return jnp.take(a_ext, order, axis=0, mode="clip")

    ge_s = reorder(ge)
    rxe_s = reorder(rxe)
    rye_s = reorder(rye)
    ty_s = reorder(ty)
    txb_s = reorder(txb)
    s_s = reorder(s)
    oky_s = reorder(oky, fill=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(EP // TE,),
        in_specs=[
            pl.BlockSpec((TE, C, PP * D), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, PP * D), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, PP * D), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),           # frame pyramid
        ],
        out_specs=pl.BlockSpec((TE, PP * D, D), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, C, Hp, Wpc), fmap.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    vol_s = pl.pallas_call(
        partial(_corr_kernel_v4, C=C, PP=PP, D=D, Hp=Hp, Wpc=Wpc, TH_=TH_),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((EP, PP * D, D), jnp.float32),
    )(jj_steps.astype(jnp.int32), ty_s.astype(jnp.int32),
      txb_s.astype(jnp.int32), s_s.astype(jnp.int32), oky_s.astype(jnp.int32),
      ge_s, rxe_s.astype(jnp.int32), rye_s.astype(jnp.int32), fdup)

    vol = jnp.take(vol_s, inv, axis=0)                      # (E, PP*D, D)
    vol = vol.reshape(E, PP, D, D)                          # (e, p, u, v)
    # 4-tap bilinear blend (correlation_kernel.cu:221-232); vol axes here
    # are (y-tap u, x-tap v)
    dxf = fx[:, :, None, None]
    dyf = fy[:, :, None, None]
    out = (1 - dxf) * (1 - dyf) * vol[:, :, : D - 1, : D - 1]
    out = out + dxf * (1 - dyf) * vol[:, :, : D - 1, 1:]
    out = out + (1 - dxf) * dyf * vol[:, :, 1:, : D - 1]
    out = out + dxf * dyf * vol[:, :, 1:, 1:]
    out = out.astype(gmap.dtype)                            # (E, PP, Dy-1, Dx-1)
    out = out.reshape(E, P, P, D - 1, D - 1).transpose(0, 4, 3, 1, 2)
    return out[None]                                        # (1, E, Dx, Dy, P, P)


@partial(jax.jit, static_argnames=("radius",))
def corr_pallas(gmap, fmap, coords, ii, jj, radius: int = 3,
                plan=None):
    """Pallas patch correlation; same signature/result as ops.corr.

    gmap: (B, K, C, P, P); fmap: (B, NF, C, H, W); coords (B, E, 2, P, P).
    ``plan``: optional (order, jj_steps, inv) from plan_corr_order (host);
    computed on device when absent.
    """
    B, K, C, P, _ = gmap.shape
    _, NF, _, H, W = fmap.shape
    E = coords.shape[1]
    E_pad = -((E + NF * TE) // -TE) * TE

    if plan is None:
        order, jj_steps, inv = _plan_corr_order_jnp(jj, NF, E_pad)
    else:
        order, jj_steps, inv = plan
    return _corr_pallas_planned(
        gmap[0].reshape(K, C, P * P), fmap[0], coords[0],
        ii.astype(jnp.int32), jj.astype(jnp.int32),
        order, jj_steps, inv, radius, E_pad)
