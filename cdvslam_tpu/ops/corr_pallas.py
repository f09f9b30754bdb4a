"""Pallas TPU kernel for the patch correlation hot op.

TPU-native replacement for the reference CUDA correlation kernel
(reference: cdvslam/altcorr/correlation_kernel.cu:83-136 forward,
:221-232 bilinear blend). Exact reference semantics: D = 2R+2 integer
taps per patch pixel, out-of-image taps read zero, 4-tap bilinear blend
to (2R+1)^2, output layout (B, E, Dx, Dy, P, P).

Design (v9). Window extraction is reformulated as ONE-HOT GATHER
MATMULS so the MXU does the gathering and the VPU only builds tiny 0/1
selection matrices. Per CB-edge CHUNK (all P*P pixels of all CB edges
together, per-edge tap columns (p, u) at stride DU = D-1 = 7 padded to
PPD2=64 lanes -- the blend-discarded 8th tap per pixel is never laid
out (v10), and CB*PPD2 = 256 keeps lane-tile alignment):

    band  = frame[ty:ty+THB, :, txb:txb+TWB]      # (THB, C, TWB) slab
    G2[(y,c),(e,p,u)] = g[c,e,p] * [y == ry_ep + u]
    T     = G2^T @ band.(THB*C, TWB)              # y+chan contract (MXU)
    out2  = T @ CM0(TWB, CG*PPD2), block-diag masked
    out   = SUMQ^T @ out2^T                       # (D, CG*PPD2) taps
    blend = FUSED into ysel/cm0: the one-hot selections are 2-tap
            bilinear interpolation rows, so the kernel emits blended
            taps and the XLA side only slices [:D-1, :D-1]

The frame is staged rows-OUTER / channels-sublane as (Hp, C, 2*Wc):
TWO x-copies concatenated along lanes, image origins at columns D and
Wc+D+64. Row band slices need no alignment (outer dim); the 64-shifted
second copy makes every 64-aligned x origin lane-aligned in one of the
copies, so TWB stays 128 (one lane tile) instead of 256 -- halving the
phase B/C contraction width. (v5-v7 stored FOUR shifted copies because
rows lived on the sublane axis and needed 4-row shift copies too.)

Edges are sorted by (target frame, y cell, x cell) -- a small device
argsort per update (plan_corr_cells) -- so consecutive CB-edge chunks
share a band. The chunk band origin is the elementwise min of the
chunk's per-edge window origins; edges whose taps spill the shared
band (rare after the cell sort) take an exact slow-path fallback
against the full first-copy frame. The fallback loop is gated per grid
step on a prefetched fallback count, so fallback-free steps (the
common case) pay one scalar branch, not TE of them.

Per-edge payloads are COMPACT (gec: C x 16/edge features, rxyc:
4 x 16 bf16 tap rows) and expanded on-chip by one shared block-diagonal
one-hot matmul per XE-edge chunk. The tap rows split per-edge-origin-
relative offsets (rows 0-1, small, exact in bf16) from the edge->chunk
origin deltas (rows 2-3, small row counts / multiples of 64, also
exact); the kernel re-bases taps to the chunk origin with two
whole-tile adds.

The kernel writes the tap volume TRANSPOSED, (D, TE*PPD2): with D on
the sublane axis and tap columns on the lane axis every output tile is
dense, where a (TE*PPD2, D) block would waste 15/16 of each lane tile.

Scheduling: TE (default 64) edges per grid step; frame runs padded to
SUBTE=8 and the VMEM frame cache re-fetched at sub-tile boundaries when
the target frame changes (~NF fetches per call, tracked by an SMEM
frame id so fallback refetches can't poison the skip condition).
"""
from __future__ import annotations

import os as _os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TE = int(_os.environ.get("CORR_TE", "64"))  # edges per grid step
YCELL = int(_os.environ.get("CORR_YC", "16"))  # supercell row quantum
# shared row band height: phase B's band contraction scales with THB, so
# smaller supercells (tighter bands) cut kernel FLOPs ~linearly; the fast
# path needs THB >= (YCELL-1) + patch span (2) + window D (8)
THB = int(_os.environ.get("CORR_TH", str(YCELL + 10)))
SUBTE = 8                                   # frame-run pad / refetch tile
CB = int(_os.environ.get("CORR_CB", "4"))   # edges per shared-band chunk
TWB = 128                                   # column band width (one lane tile)
# v10: with the bilinear blend fused into the selection matrices, only
# D-1 = 7 tap values per axis survive the final slice, so per-edge tap
# columns are laid out with stride DU = D-1 = 7: PP*DU = 63 columns,
# padded to 64 -- a 33% column cut vs the v9 stride-8 layout (96 cols)
# that carried a discarded 8th tap per pixel through phases A/B/C
PPD2 = int(_os.environ.get("CORR_PPD2", "64"))  # padded per-edge tap columns
PPC = 16                                    # compact per-edge tap columns
XE = 32                                     # edges per expansion chunk (Xexp size)
CG = int(_os.environ.get("CORR_CG", "4"))   # phase-C cross-edge batch width
XCELL = 64                                  # x quantum (copy shift/supercell)
NSY = max(32, 512 // YCELL)                 # supercell grid rows per frame
NSX = 8                                     # supercell grid cols per frame
assert TE % SUBTE == 0 and TE % CG == 0, "TE must be divisible by SUBTE and CG"
assert SUBTE % CB == 0, "CB must divide SUBTE (chunks cannot straddle frames)"
assert TE % XE == 0 or XE % TE == 0, "TE and XE must nest"
assert (CB * PPD2) % 128 == 0 and (CG * PPD2) % 128 == 0, \
    "chunk/group tap columns must stay lane-tile aligned"


def corr_epad(E, NF):
    """Static padded edge count for an E-edge, NF-frame corr call: room
    for per-frame run padding (SUBTE granularity) plus supercell-run
    padding (~10% in practice; the plan degrades gracefully to unpadded
    supercells if the budget ever falls short), rounded to TE."""
    e = E + NF * SUBTE + max(E // 8, 4 * SUBTE)
    e = -(e // -SUBTE) * SUBTE
    return -(e // -TE) * TE


def _corr_kernel_v9(jjs_ref, tys_ref, txbs_ref, oky_ref, fbs_ref,  # prefetch
                    gec_ref, rxyc_ref, xexp_ref, frame_hbm, out_ref,
                    fcache, g2s, ts, gef, rxy, fxy, fid, sem,
                    *, C, PP, D, Hp, Wc, THB_, XE_):
    """One grid step = TE edges, sorted by (target frame, cell).

    frame_hbm: (NF, Hp, C, 2*Wc) zero-padded frames, rows outer /
               channels sublane, two 64-shifted x copies on the lane
               axis (maintained incrementally by the runtime)
    fcache:  (Hp, C, 2*Wc) VMEM scratch (current frame)
    g2s:     (THB_*C, TE*PPD2) whole-tile G2 scratch (phase A output)
    ts:      (TE*PPD2, TWB) stacked per-edge T rows (phase B output)
    gef:     (C, TE*PPD2) tap-expanded patch features (phase 0 output)
    rxy:     (2, TE*PPD2) int32 expanded chunk-relative x/y taps
    gec_ref: (1, C, TE*PPC) COMPACT patch features, 16 cols/edge
    rxyc_ref:(1, 6, TE*PPC) compact taps as bf16: rows 0/1 = x/y rel.
             the EDGE's own window origin (small, bf16-exact), rows 2/3
             = edge-origin -> chunk-origin deltas (x: multiples of 64,
             y: small; both bf16-exact); -9 sentinel on pad columns of
             rows 0/1 (stays negative after the +u offset); rows 4/5 =
             per-pixel bilinear fractions fx/fy -- the 4-tap blend
             (correlation_kernel.cu:221-232) is FUSED into the one-hot
             selections: ysel/cm0 become 2-tap interpolation rows
             ((1-f)[t] + f[t+1]), so the kernel emits blended taps and
             the XLA side only slices [:D-1, :D-1]. The blend is linear
             in the tap volume, so this is algebraically the reference
             blend; fx/fy ride in the feature dtype (bf16 on chip)
    xexp_ref:(XE_*PPC, XE_*PPD2) 0/1 block-diag expansion matrix,
             constant across grid steps (fetched once)
    tys/txbs: per-CHUNK band origins (EP//CB,); txb is a 128-aligned
             BUFFER column (copy select folded in on the host side)
    oky_ref: (EP//CB,) int32 per-CHUNK fast-path flag
    fbs_ref: (nsteps,) int32 count of fallback edges per grid step
    out:     (1, D, TE*PPD2) raw tap volumes, v-major rows
    """
    g = pl.program_id(0)
    cdt = fcache.dtype
    DU = D - 1   # per-pixel tap-column stride (v10: 8th tap discarded)

    # ---- phase 0: on-chip tap expansion (compact -> PPD2-col/edge) ----
    # per XE_-edge chunk: ONE (C, XE_*16) @ (XE_*16, XE_*PPD2) matmul for
    # the features and one (6, ...) for the tap rows; +u offsets are a
    # broadcast iota; chunk re-basing is two whole-tile adds
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, XE_ * PPD2), 1) % PPD2
    # columns whose (p', u) decodes past PPC rows get no expansion input
    # (matmul gives 0) -- poison them so the one-hot compares miss
    upat = jnp.where(cidx // DU < PPC, cidx % DU, -10000).astype(jnp.float32)
    if _os.environ.get("CORR_ABL") in ("no_0", "floor0"):
        gef[...] = jnp.zeros((C, TE * PPD2), cdt)
        rxy[...] = jnp.full((2, TE * PPD2), -9, jnp.int32)
        fxy[...] = jnp.zeros((2, TE * PPD2), cdt)
    else:
      for x in range(max(1, (TE * PPC) // (XE_ * PPC))):
        ci, co = x * XE_ * PPC, x * XE_ * PPD2
        gef[:, co:co + XE_ * PPD2] = jax.lax.dot_general(
            gec_ref[0, :, ci:ci + XE_ * PPC], xexp_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)
        r6 = jax.lax.dot_general(
            rxyc_ref[0, :, ci:ci + XE_ * PPC], xexp_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (6, XE_*PPD2)
        rxy[0:1, co:co + XE_ * PPD2] = (r6[0:1] + r6[2:3] + upat
                                        ).astype(jnp.int32)
        rxy[1:2, co:co + XE_ * PPD2] = (r6[1:2] + r6[3:4] + upat
                                        ).astype(jnp.int32)
        fxy[:, co:co + XE_ * PPD2] = r6[4:6].astype(cdt)

    # step-level constants; g2s rows are (y, c)-major: row = y*C + c,
    # matching the (THB_, C, TWB) band slab reshape
    rowio = jax.lax.broadcasted_iota(jnp.int32, (THB_ * C, 1), 0)
    cio = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    ohc = ((rowio % C) == cio).astype(cdt)                  # (THB_*C, C)
    ohy = ((rowio // C) == jax.lax.broadcasted_iota(
        jnp.int32, (1, THB_), 1)).astype(cdt)               # (THB_*C, THB_)
    yio = jax.lax.broadcasted_iota(jnp.int32, (THB_, 1), 0)
    wio = jax.lax.broadcasted_iota(jnp.int32, (TWB, 1), 0)  # (TWB, 1)
    # select/reduce constants: a column inside an edge's PPD2 block
    # decodes as (p, u) = (local // DU, local % DU); the (edge, p) pair
    # keys the block-diag mask (PPD2 % DU != 0, so a global idx // DU
    # would straddle edges)
    gpu = jax.lax.broadcasted_iota(jnp.int32, (CG * PPD2, 1), 0)
    gqv = jax.lax.broadcasted_iota(jnp.int32, (1, CG * PPD2), 1)
    blockdiag_g = ((gpu // PPD2 == gqv // PPD2)
                   & ((gpu % PPD2) // DU == (gqv % PPD2) // DU))
    viod = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
    sumq_gt = (((gqv % PPD2) % DU) == viod).astype(cdt)     # (D, CG*PPD2)

    # ---- phase A: build G2 for the WHOLE tile in one 4-op sequence ----
    # (gef/rxy columns are contiguous across edges, so nothing is per-edge)
    if _os.environ.get("CORR_ABL") in ("no_a", "floor", "floor0"):
        g2s[...] = jnp.zeros((THB_ * C, TE * PPD2), cdt)
    else:
        grep = jax.lax.dot_general(
            ohc, gef[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)  # (THB_*C, TE*PPD2)
        # 2-tap y interpolation (fused bilinear blend, y half)
        fyr = fxy[1:2, :]
        ysel = ((yio == rxy[1:2, :]).astype(cdt) * (1.0 - fyr)
                + (yio == rxy[1:2, :] + 1).astype(cdt) * fyr)  # (THB_, TE*PPD2)
        yex = jax.lax.dot_general(
            ohy, ysel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)
        g2s[...] = grep * yex                               # (THB_*C, TE*PPD2)

    # ---- phase B: chunked band gather matmuls (MXU): CB edges share one
    # contiguous band slab + ONE matmul --------------------------------
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

        for q in range(SUBTE // CB):
            tq = sub * (SUBTE // CB) + q
            ch = g * (TE // CB) + tq
            lo = tq * CB * PPD2
            if _os.environ.get("CORR_ABL") in ("no_b", "floor", "floor0"):
                ts[lo:lo + CB * PPD2] = jnp.zeros((CB * PPD2, TWB), cdt)
                continue
            ty = tys_ref[ch]
            txb = pl.multiple_of(txbs_ref[ch], 128)
            band2d = fcache[pl.ds(ty, THB_), :,
                            pl.ds(txb, TWB)].reshape(THB_ * C, TWB)
            ts[lo:lo + CB * PPD2] = jax.lax.dot_general(
                g2s[:, lo:lo + CB * PPD2], band2d,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdt)                                   # (CB*PPD2, TWB)

    # ---- phase C: column select + block-diag reduce, CG edges at a
    # time: one (CG*PPD2, TWB) @ (TWB, CG*PPD2) matmul whose cross-edge
    # blocks are discarded by the mask (FLOP overshoot on the MXU is far
    # cheaper than CG-x the op-issue latency); the final reduce writes
    # the volume transposed, (D, CG*PPD2), for dense output tiles ------
    for cg in range(TE // CG):
        lo = cg * CG * PPD2
        if _os.environ.get("CORR_ABL") in ("no_c", "floor", "floor0"):
            out_ref[0, :, lo:lo + CG * PPD2] = jnp.zeros(
                (D, CG * PPD2), out_ref.dtype)
            continue
        fxr = fxy[0:1, lo:lo + CG * PPD2]
        cm0 = ((wio == rxy[0:1, lo:lo + CG * PPD2]).astype(cdt) * (1.0 - fxr)
               + (wio == rxy[0:1, lo:lo + CG * PPD2] + 1).astype(cdt) * fxr)
        out2 = jax.lax.dot_general(
            ts[lo:lo + CG * PPD2], cm0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (CG*PPD2, CG*PPD2)
        out2m = jnp.where(blockdiag_g, out2, 0.0).astype(cdt)
        out_ref[0, :, lo:lo + CG * PPD2] = jax.lax.dot_general(
            sumq_gt, out2m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)                     # (D, CG*PPD2)

    if _os.environ.get("CORR_NOSLOW") == "1":
        return

    # exact fallback (taps spill the shared chunk band): recompute the
    # whole CB-edge CHUNK (CB*PPD2 columns stay lane-tile aligned where
    # a single edge's 96 would not) against the full first-copy frame
    # with absolute taps. The loop is gated on the step's prefetched
    # fallback count, so fallback-free steps (the common case after the
    # cell sort) pay ONE scalar branch.
    @pl.when(fbs_ref[g] > 0)
    def _slow_all():
        CW = CB * PPD2
        rowioH = jax.lax.broadcasted_iota(jnp.int32, (Hp * C, 1), 0)
        ohcH = ((rowioH % C) == cio).astype(cdt)            # (Hp*C, C)
        yofH = rowioH // C
        wioW = jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)
        puio = jax.lax.broadcasted_iota(jnp.int32, (CW, 1), 0)
        qvio = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1)
        blockdiag = ((puio // PPD2 == qvio // PPD2)
                     & ((puio % PPD2) // DU == (qvio % PPD2) // DU))
        viodf = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
        sumq_t = (((qvio % PPD2) % DU) == viodf).astype(cdt)  # (D, CW)

        def _slow_body(t, carry):
            ch = g * (TE // CB) + t

            @pl.when(oky_ref[ch] == 0)
            def _slow():
                # the fast phases left the LAST sub-tile's frame in
                # fcache; re-fetch this chunk's frame (rare chunks, so
                # the extra DMA does not matter)
                sg = g * (TE // SUBTE) + (t * CB) // SUBTE
                cpf = pltpu.make_async_copy(frame_hbm.at[jjs_ref[sg]],
                                            fcache, sem)
                cpf.start()
                cpf.wait()
                fid[0] = jjs_ref[sg]
                lo = pl.multiple_of(t * CW, CW)
                gexp = gef[:, pl.ds(lo, CW)]
                grepf = jax.lax.dot_general(
                    ohcH, gexp, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cdt)
                # re-base chunk-relative taps to absolute padded coords
                tapy = rxy[1:2, pl.ds(lo, CW)] + tys_ref[ch]
                tapx = rxy[0:1, pl.ds(lo, CW)] + txbs_ref[ch] \
                    - jnp.where(txbs_ref[ch] >= Wc, Wc + XCELL, 0)
                fyf = fxy[1:2, pl.ds(lo, CW)]
                wy = ((yofH == tapy).astype(cdt) * (1.0 - fyf)
                      + (yofH == tapy + 1).astype(cdt) * fyf)
                g2f = grepf * wy
                full2d = fcache[:, :, pl.ds(0, Wc)].reshape(Hp * C, Wc)
                Tf = jax.lax.dot_general(
                    g2f, full2d, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cdt)
                fxf = fxy[0:1, pl.ds(lo, CW)]
                cm0f = ((wioW == tapx).astype(cdt) * (1.0 - fxf)
                        + (wioW == tapx + 1).astype(cdt) * fxf)  # (Wc, CW)
                out2 = jax.lax.dot_general(
                    Tf, cm0f, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out2m = jnp.where(blockdiag, out2, 0.0).astype(cdt)
                out_ref[0, :, pl.ds(lo, CW)] = jax.lax.dot_general(
                    sumq_t, out2m, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(out_ref.dtype)

            return carry

        jax.lax.fori_loop(0, TE // CB, _slow_body, 0)


def plan_corr_order(jj_np, NF, E_pad):
    """Host-side (numpy) FRAME-ONLY edge ordering: edges sorted by target
    frame, each frame's run padded to a multiple of SUBTE with the
    sentinel index E. Returns (order, jj_steps, inv).

    Compatibility/bootstrap path: correctness never depends on the
    ordering, but without the cell sort (plan_corr_cells) chunk locality
    is poor and most edges take the exact slow-path fallback -- the
    runtime refines this plan on device from the reprojected coords."""
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
    posn = np.nonzero(order < E)[0]
    inv = np.zeros(E, np.int64)
    inv[order[posn]] = posn
    return order, jj_steps, inv


def plan_corr_cells(jj, qy, qx, NF, E_pad):
    """Device-side corr edge plan: edges sorted by (target frame,
    supercell), where a supercell is a (YCELL x XCELL) = (16 row, 64
    col) window-origin bin. Each SUPERCELL run is padded to a multiple
    of CB with the sentinel index E, and each frame run to a multiple
    of SUBTE -- so no CB-edge chunk ever straddles a supercell, which
    makes the kernel's THB x TWB fast path exhaustive: within one
    supercell, chunk-relative taps are bounded by YCELL + patch span
    + D <= THB and XCELL + patch span + D <= TWB by construction.
    Returns (order (E_pad,), jj_steps (E_pad//SUBTE,), inv (E,)).

    If the supercell padding would overflow E_pad (corr_epad budgets
    ~12.5%), the plan falls back to unpadded supercell runs -- chunk
    locality degrades and spilling chunks take the exact kernel
    fallback, but correctness never depends on the padding."""
    E = jj.shape[0]
    jj = jj.astype(jnp.int32)
    NPF = NSY * NSX
    sc = ((jj * NSY + jnp.clip(qy, 0, NSY - 1).astype(jnp.int32)) * NSX
          + jnp.clip(qx, 0, NSX - 1).astype(jnp.int32))     # (E,)
    order_real = jnp.argsort(sc, stable=True).astype(jnp.int32)
    sc_s = jnp.take(sc, order_real)
    jj_s = jnp.take(jj, order_real)
    counts = jnp.zeros(NF * NPF, jnp.int32).at[sc_s].add(1)
    padded = counts - (counts % -CB)                        # ceil to CB
    need = jnp.sum(-(jnp.sum(padded.reshape(NF, NPF), 1) % -SUBTE)
                   + jnp.sum(padded.reshape(NF, NPF), 1))
    padded = jnp.where(need <= E_pad, padded, counts)
    fsum = jnp.sum(padded.reshape(NF, NPF), axis=1)
    fpad = fsum - (fsum % -SUBTE)                           # ceil to SUBTE
    frame_base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(fpad)[:-1].astype(jnp.int32)])
    ecs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    ecs_f0 = jnp.take(ecs, jnp.arange(NF, dtype=jnp.int32) * NPF)
    base_sc = (jnp.take(frame_base, jnp.arange(NF * NPF) // NPF)
               + ecs - jnp.take(ecs_f0, jnp.arange(NF * NPF) // NPF))
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    rank = jnp.arange(E, dtype=jnp.int32) - jnp.take(starts, sc_s)
    pos = jnp.take(base_sc, sc_s) + rank                    # (E,)
    order = jnp.full((E_pad,), E, jnp.int32).at[pos].set(order_real)
    # frame id per sub-tile: scatter jj over the padded layout, per-tile
    # max (supercell padding can leave all-pad sub-tiles mid-frame; they
    # read frame 0, compute discarded zeros, and cost one extra fetch)
    stepf = jnp.zeros((E_pad,), jnp.int32).at[pos].max(jj_s)
    jj_steps = jnp.max(stepf.reshape(E_pad // SUBTE, SUBTE), axis=1)
    inv = jnp.zeros((E,), jnp.int32).at[order_real].set(pos)
    return order, jj_steps, inv


def padded_dims(H, W, radius=3):
    """Padded frame dims for the kernel layout (Hp, C, 2*Wc): rows are
    an OUTER dim (zero-padded by D each side, no alignment constraint);
    each x copy is lane-padded so both the plain window span and the
    64-shifted copy's largest band slice stay in bounds."""
    D = 2 * radius + 2
    Hp = max(H + 2 * D, THB)
    omax = ((W + D) // XCELL) * XCELL        # largest 64-aligned origin
    need = W + 2 * D
    if omax > 0:
        need = max(need, omax + XCELL + TWB)
    Wc = -(-need // 128) * 128
    return Hp, Wc


def pad_fmap(fmap, radius=3):
    """Zero-pad a (..., C, H, W) frame pyramid into the kernel layout
    (..., Hp, C, 2*Wc): rows outer, channels on the sublane axis (C must
    be a multiple of 8 so the kernel's band reshape is free), and two
    x copies on the lane axis with image origins at D and Wc + D + 64
    (so every 64-aligned window origin is 128-aligned in one copy)."""
    H, W = fmap.shape[-2:]
    D = 2 * radius + 2
    Hp, Wc = padded_dims(H, W, radius)
    f = jnp.swapaxes(fmap, -3, -2)                          # (..., H, C, W)
    lead = [(0, 0)] * (f.ndim - 3)
    c0 = jnp.pad(f, lead + [(D, Hp - H - D), (0, 0), (D, Wc - W - D)])
    c1 = jnp.pad(f, lead + [(D, Hp - H - D), (0, 0),
                            (D + XCELL, Wc - W - D - XCELL)])
    return jnp.concatenate([c0, c1], axis=-1)


@partial(jax.jit, static_argnames=("radius", "E_pad_static", "H", "W"))
def _corr_pallas_planned(gmap, fpad, coords, ii, jj, order, jj_steps, inv,
                         radius, E_pad_static, H, W):
    """Run the v9 kernel given an edge-order plan. gmap (K, C, PP);
    fpad (NF, Hp, C, 2*Wc) pre-padded pyramid (pad_fmap);
    coords (E, 2, P, P); H, W static unpadded dims."""
    K, C, PP = gmap.shape
    NF = fpad.shape[0]
    E = coords.shape[0]
    P = int(np.sqrt(PP))
    D = 2 * radius + 2
    EP = E_pad_static
    Hp, Wc = padded_dims(H, W, radius)
    THB_ = min(THB, Hp)
    DU = D - 1   # tap-column stride (v10: blend-discarded tap not laid out)
    assert PP * DU <= PPD2, "patch tap columns exceed the padded tile"
    assert C % 8 == 0, "channels must tile the sublane axis"

    x = coords[:, 0].reshape(E, PP)
    y = coords[:, 1].reshape(E, PP)
    ix0 = jnp.clip(jnp.floor(x).astype(jnp.int32) - radius + D, 0, W + D)
    iy0 = jnp.clip(jnp.floor(y).astype(jnp.int32) - radius + D, 0, H + D)
    fx = (x - jnp.floor(x)).astype(jnp.float32)
    fy = (y - jnp.floor(y)).astype(jnp.float32)

    # per-edge window origins: rows need no alignment (outer dim), cols
    # quantized to the 64-px copy shift
    ay_e = jnp.min(iy0, axis=1)                             # (E,)
    ax_e = (jnp.min(ix0, axis=1) // XCELL) * XCELL
    # COMPACT tap rows 0/1: taps relative to the EDGE's own origin --
    # bounded by the window span + 64-col misalignment, exact in bf16;
    # PP columns padded to PPC with the -9 sentinel (still negative
    # after the kernel's +u offset, so the one-hot compares miss)
    padc = jnp.full((E, PPC - PP), -9, jnp.int32)
    rxc = jnp.concatenate([ix0 - ax_e[:, None], padc], axis=1)  # (E, PPC)
    ryc = jnp.concatenate([iy0 - ay_e[:, None], padc], axis=1)

    def reorder(a, fill=0):
        a_ext = jnp.concatenate(
            [a, jnp.full((1,) + a.shape[1:], fill, a.dtype)], axis=0)
        return jnp.take(a_ext, order, axis=0, mode="clip")

    # patch features: compose the ii-gather with the order-gather (one
    # pass over the (K, C, PP) map instead of two over (E, C, PP))
    ii_ext = jnp.concatenate([ii.astype(jnp.int32),
                              jnp.full((1,), K, jnp.int32)])
    ii_s = jnp.take(ii_ext, order, mode="clip")             # (EP,)
    gmap_ext = jnp.concatenate([gmap, jnp.zeros((1, C, PP), gmap.dtype)])
    ge_s = jnp.take(gmap_ext, ii_s, axis=0, mode="clip")    # (EP, C, PP)
    ge_s = jnp.pad(ge_s, ((0, 0), (0, 0), (0, PPC - PP)))   # (EP, C, PPC)

    # chunk band origins: elementwise min over each CB-edge chunk of the
    # SORTED per-edge origins (pad edges carry +inf-like fills so they
    # never drag the min)
    ay_s = reorder(ay_e, fill=2 ** 20)
    ax_s = reorder(ax_e, fill=2 ** 20)
    omax = ((W + D) // XCELL) * XCELL
    ty_c = jnp.clip(jnp.min(ay_s.reshape(EP // CB, CB), 1), 0, Hp - THB_)
    ox_c = jnp.clip(jnp.min(ax_s.reshape(EP // CB, CB), 1), 0, omax)
    # buffer column of the chunk band: 128-aligned origins slice copy 0,
    # 64-misaligned ones slice copy 1 (image shifted +64 columns)
    sx_c = (ox_c % 128) // XCELL
    txb_c = jnp.where(sx_c == 1, Wc + ox_c + XCELL, ox_c)
    # edge-origin -> chunk-origin deltas (rows 2/3 of the compact taps):
    # y deltas are small row counts, x deltas multiples of 64 -- both
    # exact in bf16 for any supported frame size
    dy_s = ay_s - jnp.repeat(ty_c, CB)
    dx_s = ax_s - jnp.repeat(ox_c, CB)
    # fast-path test: ALL taps (+D window span) inside the shared chunk
    # band; chunk-relative tap = (tap - edge origin) + (edge -> chunk
    # delta), both components non-negative
    ry_rel = reorder(iy0, fill=0) - reorder(ay_e, fill=0)[:, None] \
        + dy_s[:, None]
    rx_rel = reorder(ix0, fill=0) - reorder(ax_e, fill=0)[:, None] \
        + dx_s[:, None]
    oky_s = (jnp.all(ry_rel <= THB_ - D, axis=1)
             & jnp.all(rx_rel <= TWB - D, axis=1)
             & (order < E)) | (order >= E)
    # the fallback runs per CHUNK (CB*PPD2 columns stay lane aligned)
    okc = jnp.all(oky_s.reshape(EP // CB, CB), axis=1).astype(jnp.int32)

    nsteps = EP // TE
    fbs = jnp.sum(1 - okc.reshape(nsteps, TE // CB), axis=1).astype(jnp.int32)
    gec_s = ge_s.reshape(nsteps, TE, C, PPC)
    gec_s = gec_s.transpose(0, 2, 1, 3).reshape(nsteps, C, TE * PPC)
    rxy_c = jnp.stack([rxc, ryc], axis=1).astype(gmap.dtype)  # (E, 2, PPC)
    rxy_s2 = reorder(rxy_c, fill=-9)                        # (EP, 2, PPC)
    d_rows = jnp.stack(
        [jnp.broadcast_to(dx_s[:, None], (EP, PPC)),
         jnp.broadcast_to(dy_s[:, None], (EP, PPC))], axis=1
    ).astype(gmap.dtype)                                    # (EP, 2, PPC)
    # rows 4/5: bilinear fractions (pad pixel columns carry 0 -- their
    # tap rows are the -9 sentinel, so both 2-tap compares miss anyway)
    padf = jnp.zeros((E, PPC - PP), jnp.float32)
    f_c = jnp.stack([jnp.concatenate([fx, padf], axis=1),
                     jnp.concatenate([fy, padf], axis=1)],
                    axis=1).astype(gmap.dtype)              # (E, 2, PPC)
    f_s = reorder(f_c, fill=0)                              # (EP, 2, PPC)
    rxyc_s = jnp.concatenate([rxy_s2, d_rows, f_s], axis=1)  # (EP, 6, PPC)
    rxyc_s = rxyc_s.reshape(nsteps, TE, 6, PPC)
    rxyc_s = rxyc_s.transpose(0, 2, 1, 3).reshape(nsteps, 6, TE * PPC)

    # block-diagonal expansion matrix (constant; fetched into VMEM once):
    # Xexp[(e, p), (e', (p', u))] = [e == e'] * [p == p']; tap-column
    # stride DU = D-1 (v10: the blend-discarded 8th tap is never laid out)
    XE_ = min(XE, TE)
    rio = jnp.arange(XE_ * PPC)[:, None]
    cio_x = jnp.arange(XE_ * PPD2)[None, :]
    xexp = ((rio // PPC == cio_x // PPD2)
            & (rio % PPC == (cio_x % PPD2) // DU)).astype(gmap.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, C, TE * PPC), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, TE * PPC), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XE_ * PPC, XE_ * PPD2), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),           # frame pyramid
        ],
        out_specs=pl.BlockSpec((1, D, TE * PPD2), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hp, C, 2 * Wc), fpad.dtype),
            pltpu.VMEM((THB_ * C, TE * PPD2), fpad.dtype),
            pltpu.VMEM((TE * PPD2, TWB), fpad.dtype),
            pltpu.VMEM((C, TE * PPD2), fpad.dtype),
            pltpu.VMEM((2, TE * PPD2), jnp.int32),
            pltpu.VMEM((2, TE * PPD2), fpad.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    odt = gmap.dtype
    if _os.environ.get("CORR_ABL") == "no_kernel":
        vol_s = (jnp.zeros((nsteps, D, TE * PPD2), odt)
                 + gec_s[0, 0, 0].astype(jnp.float32)
                 + ty_c[0] + txb_c[0] + okc[0] + fbs[0]
                 + rxyc_s[0, 0, 0].astype(jnp.float32) + jj_steps[0])
    else:
        vol_s = pl.pallas_call(
            partial(_corr_kernel_v9, C=C, PP=PP, D=D, Hp=Hp, Wc=Wc,
                    THB_=THB_, XE_=XE_),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nsteps, D, TE * PPD2), odt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(jj_steps.astype(jnp.int32), ty_c.astype(jnp.int32),
          txb_c.astype(jnp.int32), okc, fbs,
          gec_s, rxyc_s, xexp, fpad)

    vol_s = vol_s.transpose(0, 2, 1).reshape(EP, PPD2, D)
    vol = jnp.take(vol_s[:, : PP * DU], inv, axis=0)        # (E, PP*DU, D)
    vol = vol.reshape(E, PP, DU, D)                         # (e, p, u=y, v=x)
    # the 4-tap bilinear blend (correlation_kernel.cu:221-232) is fused
    # into the kernel's selection matrices (2-tap interpolation rows in
    # phases A/C); the y-tap axis is already DU = D-1 wide (v10 layout)
    # and sublane row D-1 of the x-tap axis carries the discarded tap
    out = vol[:, :, :, : D - 1].astype(gmap.dtype)          # (E, PP, Dy-1, Dx-1)
    out = out.reshape(E, P, P, D - 1, D - 1).transpose(0, 4, 3, 1, 2)
    return out[None]                                        # (1, E, Dx, Dy, P, P)


def make_cell_plan(coords, jj, NF, E_pad, H, W, radius=3):
    """Build the (order, jj_steps, inv) plan from reprojected coords:
    quantized window-origin cells at the given level's resolution. Used
    once per update and shared by both pyramid levels (the level-2 cells
    are 4x coarser, so level-1 locality implies level-2 locality)."""
    E = coords.shape[0]
    D = 2 * radius + 2
    x = coords[:, 0].reshape(E, -1)
    y = coords[:, 1].reshape(E, -1)
    ix0 = jnp.clip(jnp.floor(jnp.min(x, 1)).astype(jnp.int32) - radius + D,
                   0, W + D)
    iy0 = jnp.clip(jnp.floor(jnp.min(y, 1)).astype(jnp.int32) - radius + D,
                   0, H + D)
    return plan_corr_cells(jj, iy0 // YCELL, ix0 // XCELL, NF, E_pad)


@partial(jax.jit, static_argnames=("radius", "H", "W"))
def corr_pallas_padded(gmap, fpad, coords, ii, jj, H, W, radius: int = 3,
                       plan=None):
    """Pallas patch correlation on a PRE-PADDED frame pyramid.

    gmap: (B, K, C, P, P); fpad: (B, NF, Hp, C, 2*Wc) from pad_fmap
    (maintained incrementally by the SLAM runtime so the pad is not
    rebuilt every call); coords (B, E, 2, P, P);
    H, W: static unpadded frame dims.
    """
    B, K, C, P, _ = gmap.shape
    NF = fpad.shape[1]
    E = coords.shape[1]
    E_pad = corr_epad(E, NF)

    if plan is None:
        order, jj_steps, inv = make_cell_plan(
            coords[0], jj.astype(jnp.int32), NF, E_pad, H, W, radius)
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
    ``plan``: optional (order, jj_steps, inv) from plan_corr_cells /
    plan_corr_order; computed on device from the coords when absent.
    """
    H, W = fmap.shape[-2:]
    return corr_pallas_padded(gmap, pad_fmap(fmap, radius), coords, ii, jj,
                              H, W, radius=radius, plan=plan)
