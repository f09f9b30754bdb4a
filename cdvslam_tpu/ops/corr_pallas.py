"""Pallas TPU kernel for the patch correlation hot op.

TPU-native replacement for the reference CUDA correlation kernel
(reference: cdvslam/altcorr/correlation_kernel.cu:83-136 forward,
:221-232 bilinear blend). Exact reference semantics: D = 2R+2 integer
taps per patch pixel, out-of-image taps read zero, 4-tap bilinear blend
to (2R+1)^2, output layout (B, E, Dx, Dy, P, P).

Design (v5). Window extraction is reformulated as ONE-HOT GATHER
MATMULS so the MXU does the gathering and the VPU only builds tiny 0/1
selection matrices. Per edge (all P*P pixels together, tap columns
(p, u) padded to PPD2=128 lanes):

    band  = frame[s, :, ty:ty+TH, txb:txb+128]    # one lane tile wide
    G2[(c,y),(p,u)] = g[c,p] * [y == ry_p + u]    # row one-hot * gmap
    T     = G2^T @ band.(C*TH, 128)               # channel+row contract (MXU)
    out2  = T(128, 128) @ CM0(128, 128)           # column one-hot      (MXU)
    vol   = block-diagonal of out2                # (PP, D, D) taps
    out   = 4-tap bilinear blend (XLA side)       # (PP, D-1, D-1)

The one-lane-wide band is possible because the frame is staged as FOUR
SHIFTED COPIES -- (0/4 rows, 0/64 cols) -- so any 4-row/64-col-aligned
window origin is sublane/lane aligned in one of them. Edges whose taps
still overflow the TH-row/128-col band (wild reprojections or clamp
straddling in EITHER axis) take the exact slow-path fallback below.

Scheduling: the per-step edge tile is TE (default 32) edges -- large,
because the per-grid-step overhead (~2 us of block-DMA issue cost) must
be amortized; edge runs per target frame are only padded to SUBTE=8 and
the VMEM frame cache is re-filled by an explicit DMA at sub-tile
boundaries when the target frame changes (~NF fetches per call).

v6 batches the phases ACROSS edges wherever the operands allow it --
the per-edge op-issue latency, not FLOPs, is what three generations of
this kernel measured as the cost floor:

  * phase A (G2 build) reads only the contiguously packed ge/rye
    columns, so the WHOLE tile is built with one 4-op sequence over
    (C*TH, TE*128) instead of 4 ops per edge;
  * phase B (band gather matmul) stays per-edge -- each edge's band
    origin (ty, txb, copy) differs, and those live only on device;
  * phase C (column select) stacks CG edges' T rows into one
    (CG*128, TWB) @ (TWB, CG*128) matmul; cross-edge products land in
    off-diagonal blocks that the existing block-diagonal mask already
    kills (rowidx//D == colidx//D forces edge AND patch-pixel match),
    trading a CGx FLOP overshoot (cheap, MXU) for a CGx op reduction.

v7 attacks the remaining data-proportional pipeline floor (~5.5 ms at
E=12k measured by ablation): the dominant HBM->VMEM stream was the
tap-expanded ge (C x 128 lanes/edge, each patch-pixel feature repeated
D=8x) plus two int32 tap vectors. The per-edge payload is now COMPACT --
PP taps padded to 16 lanes (gec: C x 16/edge, rxyc: 2 x 16/edge) -- and
the kernel expands it on-chip with ONE shared block-diagonal one-hot
matmul per XE-edge chunk (Xexp[(e,p),(e',(p',u))] = [e==e'][p==p'],
built as an XLA constant and resident in VMEM across grid steps; the
+u tap offsets are a broadcast iota added after the expansion). This
cuts the streamed bytes per edge ~8x for ~0.1 ms of extra MXU work.

Edges are pre-sorted by target frame (plan_corr_order on the host, or
the jnp fallback here); outputs are written in sorted order and
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

TE = int(_os.environ.get("CORR_TE", "32"))  # edges per grid step
TH = int(_os.environ.get("CORR_TH", "16"))  # shared row band height
SUBTE = 8                                   # frame-run pad / refetch tile
TWB = 128                                   # column band width (one lane tile)
XSHIFT = 64                                 # x copy column shift
YSHIFT = 4                                  # y copy row shift
PPD2 = 128                                  # padded per-edge tap columns
PPC = 16                                    # compact per-edge tap columns (v7)
XE = 32                                     # edges per expansion chunk (Xexp size)
CG = int(_os.environ.get("CORR_CG", "4"))   # phase-C cross-edge batch width
assert TE % SUBTE == 0 and TE % CG == 0, "TE must be divisible by SUBTE and CG"
assert TE % XE == 0 or XE % TE == 0, "TE and XE must nest"


def corr_epad(E, NF):
    """Static padded edge count for an E-edge, NF-frame corr call: room
    for per-frame run padding (SUBTE granularity), rounded to TE."""
    e = -((E + NF * SUBTE) // -SUBTE) * SUBTE
    return -(e // -TE) * TE


def _corr_kernel_v7(jjs_ref, tys_ref, txbs_ref, ss_ref, oky_ref,  # prefetch
                    gec_ref, rxyc_ref, xexp_ref, frame_hbm, out_ref,
                    fcache, g2s, ts, gef, rxy, fid, sem,
                    *, C, PP, D, Hp, Wpc, TH_, XE_):
    """One grid step = TE edges, sorted by target frame.

    frame_hbm: (NF, 4, C, Hp, Wpc) zero-padded frame, (0/4 row, 0/64
               col)-shifted copies (maintained incrementally by the
               runtime)
    fcache:  (4, C, Hp, Wpc) VMEM scratch (current frame, all views)
    g2s:     (C*TH_, TE*PPD2) whole-tile G2 scratch (phase A output)
    ts:      (TE*PPD2, TWB) stacked per-edge T rows (phase B output)
    gef:     (C, TE*PPD2) tap-expanded patch features (phase 0 output)
    rxy:     (2, TE*PPD2) int32 expanded column/row taps (phase 0 output)
    gec_ref: (1, C, TE*PPC) COMPACT patch features, 16 cols/edge
    rxyc_ref:(1, 2, TE*PPC) compact taps as bf16, row 0 = x rel. txb,
             row 1 = y rel. ty; -9 sentinel on pad columns (stays
             negative after the +u offset, so one-hot compares miss)
    xexp_ref:(XE_*PPC, XE_*PPD2) 0/1 block-diag expansion matrix,
             constant across grid steps (fetched once)
    oky_ref: (EP,) int32 fast-path flag (row taps fit the shared band)
    out:     (1, TE*PPD2, D) raw tap volumes in the compute dtype,
             (edge, p, u)-major rows
    """
    g = pl.program_id(0)
    cdt = fcache.dtype

    # ---- phase 0: on-chip tap expansion (compact -> 128-col/edge) ----
    # per XE_-edge chunk: ONE (C, XE_*16) @ (XE_*16, XE_*128) matmul for
    # the features and one (2, ...) for the tap vectors; +u offsets are a
    # broadcast iota; everything downstream reads the expanded scratch
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, XE_ * PPD2), 1) % PPD2
    # columns whose (p', u) decodes past PPC rows get no expansion input
    # (matmul gives 0) -- poison them so the one-hot compares miss
    upat = jnp.where(cidx // D < PPC, cidx % D, -10000).astype(jnp.float32)
    for x in range(max(1, (TE * PPC) // (XE_ * PPC))):
        ci, co = x * XE_ * PPC, x * XE_ * PPD2
        gef[:, co:co + XE_ * PPD2] = jax.lax.dot_general(
            gec_ref[0, :, ci:ci + XE_ * PPC], xexp_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)
        rxy[:, co:co + XE_ * PPD2] = (jax.lax.dot_general(
            rxyc_ref[0, :, ci:ci + XE_ * PPC], xexp_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + upat).astype(jnp.int32)

    # step-level constants
    yio = jax.lax.broadcasted_iota(jnp.int32, (TH_, 1), 0)
    rowio = jax.lax.broadcasted_iota(jnp.int32, (C * TH_, 1), 0)
    y_of_row = rowio % TH_
    c_of_row = rowio // TH_
    cio = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    ohc = (c_of_row == cio).astype(cdt)                     # (C*TH_, C)
    ohy = (y_of_row == jax.lax.broadcasted_iota(
        jnp.int32, (1, TH_), 1)).astype(cdt)                # (C*TH_, TH_)
    wio = jax.lax.broadcasted_iota(jnp.int32, (TWB, 1), 0)  # (TWB, 1)
    # per-edge (fallback) and CG-group (phase C) select/reduce constants;
    # rowidx//D = e*(PPD2//D) + p uniquely keys (edge, patch pixel), so
    # the group-sized block-diag mask kills every cross-edge product
    puio = jax.lax.broadcasted_iota(jnp.int32, (PPD2, 1), 0)
    qvio = jax.lax.broadcasted_iota(jnp.int32, (1, PPD2), 1)
    blockdiag = (puio // D) == (qvio // D)                  # (PPD2, PPD2)
    vio = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    sumq = ((puio % D) == vio).astype(cdt)                  # (PPD2, D)
    gpu = jax.lax.broadcasted_iota(jnp.int32, (CG * PPD2, 1), 0)
    gqv = jax.lax.broadcasted_iota(jnp.int32, (1, CG * PPD2), 1)
    blockdiag_g = (gpu // D) == (gqv // D)                  # (CG*PPD2, CG*PPD2)
    sumq_g = ((gpu % D) == vio).astype(cdt)                 # (CG*PPD2, D)

    # ---- phase A: build G2 for the WHOLE tile in one 4-op sequence ----
    # (gef/rxy columns are contiguous across edges, so nothing is per-edge)
    if _os.environ.get("CORR_ABL") in ("no_a", "floor"):
        g2s[...] = jnp.zeros((C * TH_, TE * PPD2), cdt)
    else:
        grep = jax.lax.dot_general(
            ohc, gef[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)     # (C*TH_, TE*PPD2)
        ysel = (yio == rxy[1:2, :]).astype(cdt)                 # (TH_, TE*PPD2)
        yex = jax.lax.dot_general(
            ohy, ysel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)
        g2s[...] = grep * yex                                   # (C*TH_, TE*PPD2)

    for sub in range(TE // SUBTE):
        sg = g * (TE // SUBTE) + sub

        # fid (SMEM, persists across grid steps) tracks which frame the
        # VMEM cache currently holds; the slow-path fallback can leave a
        # different frame in fcache, so comparing adjacent jjs entries is
        # not a safe skip condition
        @pl.when((sg == 0) | (fid[0] != jjs_ref[sg]))
        def _fetch():
            cp = pltpu.make_async_copy(frame_hbm.at[jjs_ref[sg]], fcache, sem)
            cp.start()
            cp.wait()
            fid[0] = jjs_ref[sg]

        # ---- phase B: band gather matmuls (MXU, per edge: the band
        # origin (ty, txb, copy) is different for every edge) -----------
        for k in range(SUBTE):
            t = sub * SUBTE + k
            e = g * TE + t
            if _os.environ.get("CORR_ABL") == "static_slice":
                band2d = fcache[0, :, 0:TH_, 0:TWB].reshape(C * TH_, TWB)
            elif _os.environ.get("CORR_ABL") in ("no_b", "floor"):
                ts[t * PPD2:(t + 1) * PPD2] = g2s[:PPD2, t * PPD2:(t + 1) * PPD2] * 0.0
                continue
            else:
                ty = pl.multiple_of(tys_ref[e], 8)
                txb = pl.multiple_of(txbs_ref[e], 128)
                band2d = fcache[ss_ref[e], :, pl.ds(ty, TH_),
                                pl.ds(txb, TWB)].reshape(C * TH_, TWB)
            ts[t * PPD2:(t + 1) * PPD2] = jax.lax.dot_general(
                g2s[:, t * PPD2:(t + 1) * PPD2], band2d,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdt)                                   # (PPD2, TWB)

    # ---- phase C: column select + block-diag reduce, CG edges at a
    # time: one (CG*PPD2, TWB) @ (TWB, CG*PPD2) matmul whose cross-edge
    # blocks are discarded by the mask (FLOP overshoot on the MXU is far
    # cheaper than CG-x the op-issue latency) ---------------------------
    for cg in range(TE // CG):
        if _os.environ.get("CORR_ABL") in ("no_c", "floor"):
            out_ref[0, cg * CG * PPD2:(cg + 1) * CG * PPD2] = jnp.zeros(
                (CG * PPD2, D), out_ref.dtype)
            continue
        lo = cg * CG * PPD2
        cm0 = (wio == rxy[0:1, lo:lo + CG * PPD2]).astype(cdt)
        out2 = jax.lax.dot_general(
            ts[lo:lo + CG * PPD2], cm0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (CG*PPD2, CG*PPD2)
        out2m = jnp.where(blockdiag_g, out2, 0.0).astype(cdt)
        out_ref[0, lo:lo + CG * PPD2] = jax.lax.dot_general(
            out2m, sumq_g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)                     # (CG*PPD2, D)

    if _os.environ.get("CORR_NOSLOW") == "1":
        return

    # exact fallback (pathological row spread): gather from the FULL
    # padded frame (copy 0) with absolute taps; rolled loop + pl.when so
    # it only costs on actual fallback edges (rare)
    rowioH = jax.lax.broadcasted_iota(jnp.int32, (C * Hp, 1), 0)
    ohcH = ((rowioH // Hp) == cio).astype(cdt)              # (C*Hp, C)
    yofH = rowioH % Hp
    wioW = jax.lax.broadcasted_iota(jnp.int32, (Wpc, 1), 0)

    def _slow_body(t, carry):
        e = g * TE + t

        @pl.when(oky_ref[e] == 0)
        def _slow():
            # the fast phases left the LAST sub-tile's frame in fcache;
            # re-fetch this edge's frame (rare edges, so the extra DMA
            # does not matter)
            sg = g * (TE // SUBTE) + t // SUBTE
            cpf = pltpu.make_async_copy(frame_hbm.at[jjs_ref[sg]],
                                        fcache, sem)
            cpf.start()
            cpf.wait()
            fid[0] = jjs_ref[sg]
            lo = pl.multiple_of(t * PPD2, PPD2)
            gexp = gef[:, pl.ds(lo, PPD2)]
            grepf = jax.lax.dot_general(
                ohcH, gexp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cdt)
            tapy = (rxy[1:2, pl.ds(lo, PPD2)] + tys_ref[e]
                    + YSHIFT * (ss_ref[e] // 2))
            tapx = (rxy[0:1, pl.ds(lo, PPD2)] + txbs_ref[e]
                    + XSHIFT * (ss_ref[e] % 2))
            g2f = jnp.where(yofH == tapy, grepf, jnp.zeros((), cdt))
            full2d = fcache[0].reshape(C * Hp, Wpc)
            Tf = jax.lax.dot_general(
                g2f, full2d, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cdt)
            cm0f = (wioW == tapx).astype(cdt)               # (Wpc, PPD2)
            out2 = jax.lax.dot_general(
                Tf, cm0f, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out2m = jnp.where(blockdiag, out2, 0.0).astype(cdt)
            out_ref[0, pl.ds(lo, PPD2)] = jax.lax.dot_general(
                out2m, sumq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

        return carry

    jax.lax.fori_loop(0, TE, _slow_body, 0)


def plan_corr_order(jj_np, NF, E_pad):
    """Host-side (numpy) edge ordering for the kernel: edges sorted by
    target frame, each frame's run padded to a multiple of SUBTE with
    the sentinel index E (a zero row appended to the per-edge inputs).
    Returns (order, jj_steps, inv): order (E_pad,), jj_steps
    (E_pad // SUBTE,) per-sub-tile frame ids, inv (E,)."""
    E = len(jj_np)
    order_real = np.argsort(jj_np, kind="stable")
    jj_s = np.asarray(jj_np)[order_real]
    order = np.full(E_pad, E, np.int64)
    jj_steps = np.zeros(E_pad // SUBTE, np.int32)
    pos = 0
    start = 0
    while start < E:
        f = jj_s[start]
        end = start
        while end < E and jj_s[end] == f:
            end += 1
        n = end - start
        npad = -(n % -SUBTE)
        assert pos + n + npad <= E_pad, "corr order pad overflow"
        order[pos:pos + n] = order_real[start:end]
        jj_steps[pos // SUBTE:(pos + n + npad) // SUBTE] = f
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
    padded = -(counts % -SUBTE) + counts
    base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    rank = jnp.arange(E, dtype=jnp.int32) - jnp.take(starts, jj_s)
    pos = jnp.take(base, jj_s) + rank                       # (E,)
    order = jnp.full((E_pad,), E, jnp.int32).at[pos].set(
        order_real.astype(jnp.int32))
    # frame id per sub-tile: scatter jj over padded runs, per-tile max
    stepf = jnp.zeros((E_pad,), jnp.int32).at[pos].max(jj_s.astype(jnp.int32))
    jj_steps = jnp.max(stepf.reshape(E_pad // SUBTE, SUBTE), axis=1)
    inv = jnp.zeros((E,), jnp.int32).at[order_real].set(pos)
    return order, jj_steps, inv


def padded_dims(H, W, radius=3):
    """Padded frame-pyramid dims for the kernel: the frame is zero-padded
    by D each side and rounded to sublane/lane tiles. Returns (Hp, Wpc);
    the stored array is (NF, 4, C, Hp, Wpc): copy 0 holds the image at
    [D:D+H, D:D+W], copies 1-3 are shifted by (0, XSHIFT cols),
    (YSHIFT rows, 0) and (YSHIFT, XSHIFT) respectively (see pad_fmap)."""
    D = 2 * radius + 2
    Hp = max(-(-(H + 2 * D) // 8) * 8, TH)
    Wpc = max(-(-(W + 2 * D) // 128) * 128, TWB)
    return Hp, Wpc


def pad_fmap(fmap, radius=3):
    """Zero-pad a (..., C, H, W) frame pyramid into the kernel layout
    (..., 4, C, Hp, Wpc): copies shifted by (0/YSHIFT rows, 0/XSHIFT
    cols) so any 4-row/64-col-aligned window origin is sublane/lane
    aligned in one of them."""
    H, W = fmap.shape[-2:]
    D = 2 * radius + 2
    Hp, Wpc = padded_dims(H, W, radius)
    pad = [(0, 0)] * (fmap.ndim - 2) + [(D, Hp + YSHIFT - H - D),
                                        (D, Wpc + XSHIFT - W - D)]
    fpadx = jnp.pad(fmap, pad)
    return jnp.stack(
        [fpadx[..., sy:sy + Hp, sx:sx + Wpc]
         for sy in (0, YSHIFT) for sx in (0, XSHIFT)], axis=-4)


@partial(jax.jit, static_argnames=("radius", "E_pad_static", "H", "W"))
def _corr_pallas_planned(gmap, fpad, coords, ii, jj, order, jj_steps, inv,
                         radius, E_pad_static, H, W):
    """Run the v5 kernel given an edge-order plan. gmap (K, C, PP);
    fpad (NF, 2, C, Hp, Wpc) pre-padded pyramid (pad_fmap);
    coords (E, 2, P, P); H, W static unpadded dims."""
    K, C, PP = gmap.shape
    NF = fpad.shape[0]
    E = coords.shape[0]
    P = int(np.sqrt(PP))
    D = 2 * radius + 2
    EP = E_pad_static
    Hp, Wpc = padded_dims(H, W, radius)
    TH_ = min(TH, Hp)
    assert PP * D <= PPD2, "patch tap columns exceed the 128-lane tile"

    x = coords[:, 0].reshape(E, PP)
    y = coords[:, 1].reshape(E, PP)
    ix0 = jnp.clip(jnp.floor(x).astype(jnp.int32) - radius + D, 0, W + D)
    iy0 = jnp.clip(jnp.floor(y).astype(jnp.int32) - radius + D, 0, H + D)
    fx = (x - jnp.floor(x)).astype(jnp.float32)
    fy = (y - jnp.floor(y)).astype(jnp.float32)

    a4 = jnp.clip((jnp.min(iy0, axis=1) // YSHIFT) * YSHIFT,
                  0, Hp + YSHIFT - TH_)
    sy = (a4 % 8) // YSHIFT                                 # y copy index
    ty = a4 - YSHIFT * sy                                   # 8-aligned
    a64 = jnp.clip((jnp.min(ix0, axis=1) // XSHIFT) * XSHIFT,
                   0, Wpc + XSHIFT - TWB)
    sx = (a64 % TWB) // XSHIFT                              # x copy index
    txb = a64 - XSHIFT * sx                                 # 128-aligned
    s = 2 * sy + sx                                         # fcache view
    ry = iy0 - a4[:, None]                                  # (E, PP)
    rx = ix0 - a64[:, None]
    oky = (jnp.all((ry >= 0) & (ry <= TH_ - D), axis=1)
           & jnp.all((rx >= 0) & (rx <= TWB - D), axis=1)).astype(jnp.int32)
    # COMPACT tap vectors (v7): PP columns padded to PPC with the -9
    # sentinel (still negative after the kernel's +u offset, so the
    # one-hot compares match nothing on pad columns); exact in bf16
    padc = jnp.full((E, PPC - PP), -9, jnp.int32)
    rxc = jnp.concatenate([rx, padc], axis=1)               # (E, PPC)
    ryc = jnp.concatenate([ry, padc], axis=1)

    ge = jnp.take(gmap, ii, axis=0, mode="clip")            # (E, C, PP)
    ge = jnp.pad(ge, ((0, 0), (0, 0), (0, PPC - PP)))       # (E, C, PPC)

    def reorder(a, fill=0):
        a_ext = jnp.concatenate(
            [a, jnp.full((1,) + a.shape[1:], fill, a.dtype)], axis=0)
        return jnp.take(a_ext, order, axis=0, mode="clip")

    nsteps = EP // TE
    gec_s = reorder(ge).reshape(nsteps, TE, C, PPC)
    gec_s = gec_s.transpose(0, 2, 1, 3).reshape(nsteps, C, TE * PPC)
    rxy_c = jnp.stack([rxc, ryc], axis=1).astype(gmap.dtype)  # (E, 2, PPC)
    rxyc_s = reorder(rxy_c, fill=-9).reshape(nsteps, TE, 2, PPC)
    rxyc_s = rxyc_s.transpose(0, 2, 1, 3).reshape(nsteps, 2, TE * PPC)
    ty_s = reorder(ty)
    txb_s = reorder(txb)
    s_s = reorder(s)
    oky_s = reorder(oky, fill=1)

    # block-diagonal expansion matrix (constant; fetched into VMEM once):
    # Xexp[(e, p), (e', (p', u))] = [e == e'] * [p == p']
    XE_ = min(XE, TE)
    rio = jnp.arange(XE_ * PPC)[:, None]
    cio_x = jnp.arange(XE_ * PPD2)[None, :]
    xexp = ((rio // PPC == cio_x // PPD2)
            & (rio % PPC == (cio_x % PPD2) // D)).astype(gmap.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, C, TE * PPC), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, TE * PPC), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XE_ * PPC, XE_ * PPD2), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),           # frame pyramid
        ],
        out_specs=pl.BlockSpec((1, TE * PPD2, D), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, C, Hp, Wpc), fpad.dtype),
            pltpu.VMEM((C * TH_, TE * PPD2), fpad.dtype),
            pltpu.VMEM((TE * PPD2, TWB), fpad.dtype),
            pltpu.VMEM((C, TE * PPD2), fpad.dtype),
            pltpu.VMEM((2, TE * PPD2), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    odt = gmap.dtype
    if _os.environ.get("CORR_ABL") == "no_kernel":
        vol_s = (jnp.zeros((nsteps, TE * PPD2, D), odt)
                 + gec_s[0, 0, 0].astype(jnp.float32)
                 + ty_s[0] + txb_s[0] + s_s[0] + oky_s[0]
                 + rxyc_s[0, 0, 0].astype(jnp.float32) + jj_steps[0])
    else:
        vol_s = pl.pallas_call(
            partial(_corr_kernel_v7, C=C, PP=PP, D=D, Hp=Hp, Wpc=Wpc,
                    TH_=TH_, XE_=XE_),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nsteps, TE * PPD2, D), odt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(jj_steps.astype(jnp.int32), ty_s.astype(jnp.int32),
          txb_s.astype(jnp.int32), s_s.astype(jnp.int32),
          oky_s.astype(jnp.int32),
          gec_s, rxyc_s, xexp, fpad)

    vol_s = vol_s.reshape(EP, PPD2, D)
    vol = jnp.take(vol_s[:, : PP * D], inv, axis=0)         # (E, PP*D, D)
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


@partial(jax.jit, static_argnames=("radius", "H", "W"))
def corr_pallas_padded(gmap, fpad, coords, ii, jj, H, W, radius: int = 3,
                       plan=None):
    """Pallas patch correlation on a PRE-PADDED frame pyramid.

    gmap: (B, K, C, P, P); fpad: (B, NF, 4, C, Hp, Wpc) from pad_fmap
    (maintained incrementally by the SLAM runtime so the pad + shift
    copies are not rebuilt every call); coords (B, E, 2, P, P);
    H, W: static unpadded frame dims.
    """
    B, K, C, P, _ = gmap.shape
    NF = fpad.shape[1]
    E = coords.shape[1]
    E_pad = corr_epad(E, NF)

    if plan is None:
        order, jj_steps, inv = _plan_corr_order_jnp(jj, NF, E_pad)
    else:
        order, jj_steps, inv = plan
    return _corr_pallas_planned(
        gmap[0].reshape(K, C, P * P), fpad[0], coords[0],
        ii.astype(jnp.int32), jj.astype(jnp.int32),
        order, jj_steps, inv, radius, E_pad, H, W)


@partial(jax.jit, static_argnames=("radius",))
def corr_pallas(gmap, fmap, coords, ii, jj, radius: int = 3,
                plan=None):
    """Pallas patch correlation; same signature/result as ops.corr.

    gmap: (B, K, C, P, P); fmap: (B, NF, C, H, W); coords (B, E, 2, P, P).
    ``plan``: optional (order, jj_steps, inv) from plan_corr_order (host);
    computed on device when absent.
    """
    H, W = fmap.shape[-2:]
    return corr_pallas_padded(gmap, pad_fmap(fmap, radius), coords, ii, jj,
                              H, W, radius=radius, plan=plan)
