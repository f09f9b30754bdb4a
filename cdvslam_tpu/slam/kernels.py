"""Jitted SLAM step kernels.

Everything per-frame and per-update runs on-device in a handful of jitted
functions; the Python driver only does edge-list bookkeeping and control
flow. This removes the reference's per-iteration host<->device ping-pong
(SURVEY.md section 3.1: fastba.neighbors CPU roundtrip, .item() syncs).

Compilation is bounded by edge-count buckets (cfg.EDGE_BUCKETS): all edge
arrays are padded to a bucket size with masked tails.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ba import ba_solve, INFERENCE_PARAMS
from ..geom import transform, flow_mag, point_cloud
from ..lie import SE3, se3_exp, se3_inv, se3_log, se3_mul
from ..models.update import UpdateAux
from ..ops import corr as _corr_xla
from ..ops.corr_pallas import SUBTE as CORR_SUBTE


def corr_op(gmap, fmap, coords, ii, jj, radius=3, hw=None, plan=None):
    """Pallas kernel on TPU; XLA gather fallback elsewhere.

    hw=(H, W): ``fmap`` is a PRE-PADDED pyramid in the corr_pallas
    layout (pad_fmap) with these unpadded dims -- the runtime maintains
    its frame buffers pre-padded so the pad + shifted-copy build is not
    repeated every call."""
    if jax.default_backend() in ("tpu", "axon"):
        from ..ops.corr_pallas import corr_pallas, corr_pallas_padded
        if hw is not None:
            return corr_pallas_padded(gmap, fmap, coords, ii, jj,
                                      hw[0], hw[1], radius=radius, plan=plan)
        return corr_pallas(gmap, fmap, coords, ii, jj, radius=radius,
                           plan=plan)
    if hw is not None:
        # unpad (B, NF, Hp, C, 2*Wc) back to (B, NF, C, H, W)
        D = 2 * radius + 2
        fmap = fmap[:, :, D:D + hw[0], :, D:D + hw[1]]
        fmap = jnp.swapaxes(fmap, 2, 3)
    return _corr_xla(gmap, fmap, coords, ii, jj, radius=radius)


# ---------------------------------------------------------------------------
# correlation feature assembly (reference slam.py:316-323)
# ---------------------------------------------------------------------------


def corr_features(gmap_buf, fmap1, fmap2, coords_nchw, gmap_idx, jjm,
                  radius=3, hw1=None, hw2=None, plan=None):
    """2-level correlation pyramid -> flattened features (1, E, 2*49*P*P).
    ``plan``: host-computed edge-order plan (shared by both levels)."""
    E = coords_nchw.shape[1]
    c1 = corr_op(gmap_buf[None], fmap1[None], coords_nchw, gmap_idx, jjm, radius=radius, hw=hw1, plan=plan)
    c2 = corr_op(gmap_buf[None], fmap2[None], coords_nchw / 4.0, gmap_idx, jjm, radius=radius, hw=hw2, plan=plan)
    return jnp.stack([c1, c2], -1).reshape(1, E, -1)


# ---------------------------------------------------------------------------
# the fused update step: reproject -> corr -> net.update -> BA
# ---------------------------------------------------------------------------


def update_body(
    params,
    model,                      # static: flax module def
    poses,                      # (N, 7)                        [donated]
    patches_full,               # (N*M, 3, P, P) FULL buffer    [donated]
    intr_full,                  # (N, 4) at 1/RES scale
    imap_buf,                   # (pmem*M, DIM)
    gmap_buf,                   # (pmem*M, DIMF, P, P)
    fmap1,                      # (mem, DIMF, Hp, Wp+64) pre-padded (HW1)
    fmap2,                      # (mem, DIMF, Hp/4-ish, ...) pre-padded (HW2)
    net_full,                   # (cap, DIM) hidden state       [donated]
    target_full,                # (cap, 2)                      [donated]
    weight_full,                # (cap, 2)                      [donated]
    weight_mul,                 # (E_pad, 2) dynamic-class down-weighting
    score_full,                 # (N*M,) per-patch selection scores
    packed,                     # (13, E_pad) int32: all edge index arrays
    t0,                         # dynamic scalar
    k0,                         # dynamic scalar: patch-window base row
    net_valid,                  # dynamic: net rows >= this are stale -> 0
    ht4, wd4,                   # dynamic scalars: fmap dims (for posenc norm)
    mm_i=-1, mm_j=-1,           # keyframe motion-mag frame pair (dynamic)
    *,
    NW: int,
    KWIN: int,
    EPAD: int,
    GROUP_M: int = 0,           # CDV group size (0 for DPVO)
    iterations: int = 2,
    is_cdv: bool = True,
    res: int = 4,
    HW1=None,                   # static (H, W) of fmap1 when pre-padded
    HW2=None,
    ba_assembly: str = "scatter",  # steady-state fused path uses 'lattice'
    LAT_L: int = 0,             # per-patch edge-lattice width (0 = absent)
):
    """One fully-fused SLAM update. Slices the patch window and per-edge
    state out of the full (donated) buffers, runs
    reproject->corr->net.update->BA, and writes everything back -- a
    single device dispatch with no host-side eager ops (each eager op
    costs ~25 ms through the remote-device transport)."""
    # unpack the edge index matrix (single FLAT int16 host upload per
    # update -- the transport penalizes multi-dim payloads); rows are
    # EP2 >= EPAD wide when the host corr plan rides along (rows 13-15);
    # rows 16+ carry the per-patch edge lattice when LAT_L > 0
    lattice = None
    if packed.ndim == 1:
        # the host ALWAYS uploads rows of width EP2u = corr_epad(EPAD, mem)
        # (16 index rows + lattice rows); reshape by the true row width --
        # a reshape(16, -1) would silently misalign rows 1-15 whenever
        # lattice rows ride along (advisor finding, round 3: garbage jjm /
        # corr-plan rows crashed the Pallas kernel on-chip)
        from ..ops.corr_pallas import corr_epad as _cepad2
        EP2u = _cepad2(EPAD, fmap1.shape[0])
        packed = packed.reshape(-1, EP2u).astype(jnp.int32)
        if LAT_L:
            lattice = packed[16:].reshape(-1)[: KWIN * LAT_L]
            lattice = lattice.reshape(KWIN, LAT_L)
        packed = packed[:16]
    ii, jj, kk_local, ctx_idx, jjm, a_ix, a_jx, a_kseg, a_gseg, a_perm, \
        a_inv, a_mask, a_gather = [packed[i, :EPAD] for i in range(13)]
    corr_plan = None
    if packed.shape[0] >= 16:
        # row 13: sorted-order, row 14: inverse positions, row 15:
        # per-sub-tile frame ids (see _prepare_update)
        EP2 = packed.shape[1]
        corr_plan = (packed[13], packed[15, : EP2 // CORR_SUBTE],
                     packed[14, :EPAD])
    gmap_idx = ctx_idx
    if GROUP_M:
        G = EPAD // GROUP_M
        perm = a_perm[: G * GROUP_M].reshape(G, GROUP_M)
    else:
        perm = None
    aux = UpdateAux(
        ix=a_ix, jx=a_jx, kseg=a_kseg, gseg=a_gseg,
        perm=perm, inv_perm=a_inv, mask=a_mask.astype(bool),
        # the BA edge lattice doubles as the agg_kk aggregation lattice
        # (same per-patch edge lists): saves a materialized (KWIN, EPAD)
        # one-hot + two MXU passes over it per update
        lattice=lattice,
    )

    patches_win = jax.lax.dynamic_slice(
        patches_full, (k0, 0, 0, 0),
        (KWIN,) + patches_full.shape[1:],
    )
    # FUSE_ABL: comma-separated phase ablations for perf budgeting (trace
    # -time, like CORR_ABL): no_corr / no_update / no_ba / no_flowmag /
    # no_netgather / no_ctx / no_transform / no_writeback
    import os as _os
    _abl = set(filter(None, _os.environ.get("FUSE_ABL", "").split(",")))

    # gather the hidden state per edge: identity normally; a survivor
    # compaction when a keyframe removal / retirement is pending (packed
    # row 12) -- the compaction rides this dispatch instead of its own
    if "no_netgather" in _abl:
        net = jnp.zeros_like(net_full[:EPAD]) + net_full[0, :1]
    else:
        net = jnp.take(net_full, a_gather, axis=0, mode="clip")
        # zero hidden state of newly-appended edges
        net = jnp.where((jnp.arange(EPAD) < net_valid)[:, None], net, 0.0)
    E = ii.shape[0]
    P = patches_win.shape[-1]

    if "no_transform" in _abl:
        coords = (jnp.zeros((1, E, P, P, 2), jnp.float32)
                  + poses[0, 0] + patches_win[0, 0, 0, 0] + 10.0)
    else:
        coords = transform(
            SE3(poses[None]), patches_win[None], intr_full[None], ii, jj,
            kk_local
        )                                                    # (1,E,P,P,2)
    coords_nchw = coords.transpose(0, 1, 4, 2, 3)
    if "no_corr" in _abl:
        pdim = 2 * 49 * P * P
        corrf = (jnp.zeros((1, E, pdim), gmap_buf.dtype)
                 + coords_nchw[0, 0, 0, 0, 0].astype(gmap_buf.dtype))
    else:
        if HW1 is not None and jax.default_backend() in ("tpu", "axon"):
            # device cell plan from the CURRENT reprojected coords:
            # sorts edges by (frame, y cell, x cell) so chunks of the
            # corr kernel share band slices; shared by both levels
            # (level-2 cells are 4x coarser). Replaces the host frame-
            # only plan (packed rows 13-15), whose chunks share almost
            # no cells
            from ..ops.corr_pallas import corr_epad as _cepad, make_cell_plan
            mem = fmap1.shape[0]
            corr_plan = make_cell_plan(
                coords_nchw[0], jjm, mem, _cepad(EPAD, mem), HW1[0], HW1[1])
        corrf = corr_features(gmap_buf, fmap1, fmap2, coords_nchw, gmap_idx,
                              jjm, hw1=HW1, hw2=HW2, plan=corr_plan)
    if "no_ctx" in _abl:
        ctx = (jnp.zeros((EPAD, imap_buf.shape[1]), imap_buf.dtype)
               + imap_buf[0, :1])[None]
    else:
        ctx = jnp.take(imap_buf, ctx_idx, axis=0, mode="clip")[None]

    if "no_update" in _abl:
        net_new = net[None] + corrf[..., :1].astype(net.dtype)
        d = jnp.zeros((1, E, 2), jnp.float32) + ctx[..., :2].astype(jnp.float32) * 0
        w = jnp.ones((1, E, 2), jnp.float32)
    elif is_cdv:
        # learnable-Fourier rotary cache on normalized patch centers
        # (reference slam.py:356-368)
        pc = jnp.take(
            patches_win[:, :2, P // 2, P // 2], kk_local, axis=0, mode="clip"
        )                                                    # (E,2) x,y
        shift = jnp.stack([wd4 / 2.0, ht4 / 2.0]).astype(pc.dtype)
        scale = jnp.maximum(wd4 / 2.0, ht4 / 2.0).astype(pc.dtype)
        p_n = ((pc[None] - shift[None, None]) / scale).astype(imap_buf.dtype)
        posenc = model.apply(params, p_n, method=type(model).posenc)
        net_new, d, w = model.apply(
            params, net[None], ctx, corrf, aux, KWIN, posenc=posenc,
            method=type(model).update,
        )
    else:
        net_new, d, w = model.apply(
            params, net[None], ctx, corrf, aux, KWIN, E,
            method=type(model).update,
        )

    # score-weighted BA weights (reference net_cdv.py:543-545): each
    # edge's weight is multiplied by its patch's selection score (1.0 for
    # non-SCORE strategies), on top of the dynamic-class down-weighting
    s_kk = jnp.take(score_full, kk_local + k0, mode="clip").astype(jnp.float32)
    w = w.astype(jnp.float32) * weight_mul[None] * s_kk[None, :, None]
    center = coords[..., P // 2, P // 2, :]
    target = center[0] + d[0].astype(jnp.float32)

    if "no_ba" not in _abl:
        poses, patches_win = ba_solve(
            poses, patches_win, intr_full[0], target, w[0],
            ii, jj, kk_local, aux.mask, t0,
            N=NW, K=KWIN, iterations=iterations, params=INFERENCE_PARAMS,
            assembly=ba_assembly if (ba_assembly != "lattice"
                                     or lattice is not None) else "onehot",
            lattice=lattice,
            # (i,j)-group lists: pose-side B/v assemble as per-group sums
            # instead of (N^2, 4E)/(N, 2E) one-hot matmuls (ba_solve)
            perm=perm,
            ba_abl=_os.environ.get("BA_ABL", ""),
        )
    else:
        poses = poses + target[0, 0] * 0

    # motion magnitude for the keyframe test, computed on the POST-BA poses
    # inside the same dispatch (reference does it in a separate call,
    # slam.py:399-406)
    if "no_flowmag" in _abl:
        fmean = jnp.zeros((EPAD,), jnp.float32) + poses[0, 0] * 0
    else:
        fm, _ = flow_mag(SE3(poses[None]), patches_win[None], intr_full[None],
                         ii, jj, kk_local, beta=0.5)
        fmean = jnp.mean(fm[0], axis=(-1, -2))

    def masked_mean(sel):
        c = jnp.maximum(jnp.sum(sel.astype(jnp.float32)), 1.0)
        return jnp.sum(jnp.where(sel, fmean, 0.0)) / c

    mm = jnp.stack([
        masked_mean(aux.mask & (ii == mm_i) & (jj == mm_j)),
        masked_mean(aux.mask & (ii == mm_j) & (jj == mm_i)),
    ])

    delta_norm = jnp.linalg.norm(d[0].astype(jnp.float32), axis=-1)

    # ---- write back into the full donated buffers ----
    if "no_writeback" in _abl:
        dep = (jnp.ravel(patches_win)[0] + jnp.ravel(net_new)[0].astype(jnp.float32)
               + jnp.ravel(target)[0] + jnp.ravel(w)[0]) * 0.0
        return (poses + dep, patches_full, net_full, target_full,
                weight_full, delta_norm, mm)
    patches_full = jax.lax.dynamic_update_slice(
        patches_full, patches_win, (k0, 0, 0, 0))
    net_full = jax.lax.dynamic_update_slice(
        net_full, net_new[0].astype(net_full.dtype), (0, 0))
    target_full = jax.lax.dynamic_update_slice(target_full, target, (0, 0))
    weight_full = jax.lax.dynamic_update_slice(weight_full, w[0], (0, 0))
    return poses, patches_full, net_full, target_full, weight_full, delta_norm, mm


update_step = partial(
    jax.jit,
    static_argnames=("model", "NW", "KWIN", "EPAD", "GROUP_M", "iterations", "is_cdv", "res", "HW1", "HW2", "ba_assembly", "LAT_L"),
    donate_argnums=(2, 3, 9, 10, 11),
)(update_body)


# ---------------------------------------------------------------------------
# motion magnitude (keyframe test; reference slam.py:399-406)
# ---------------------------------------------------------------------------


@jax.jit
def motionmag(poses, patches_win, intr_full, ii, jj, kk_local, mask):
    fm, val = flow_mag(
        SE3(poses[None]), patches_win[None], intr_full[None], ii, jj, kk_local, beta=0.5
    )
    m = jnp.mean(fm, axis=(-1, -2))[0]          # (E,)
    msum = jnp.sum(jnp.where(mask, m, 0.0))
    cnt = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return msum / cnt


# ---------------------------------------------------------------------------
# motion model (reference slam.py:652-666)
# ---------------------------------------------------------------------------


@jax.jit
def motion_extrapolate(poses, n, fac, damping):
    """DAMPED_LINEAR: pose[n] = Exp(damping*fac*Log(P1 P2^-1)) * P1."""
    P1 = jnp.take(poses, jnp.maximum(n - 1, 0), axis=0)
    P2 = jnp.take(poses, jnp.maximum(n - 2, 0), axis=0)
    xi = damping * fac * se3_log(se3_mul(P1, se3_inv(P2)))
    newpose = se3_mul(se3_exp(xi), P1)
    return poses.at[n].set(newpose)


# ---------------------------------------------------------------------------
# buffer maintenance
# ---------------------------------------------------------------------------


@jax.jit
def write_frame_state(poses, patches, intrinsics, n, patch_row, intr_row):
    patches = patches.at[n].set(patch_row)
    intrinsics = intrinsics.at[n].set(intr_row)
    return poses, patches, intrinsics


@partial(jax.jit, donate_argnums=(0,))
def gather_rows(buf, idx):
    """Generic device gather used for keyframe-removal buffer shifting."""
    return jnp.take(buf, idx, axis=0, mode="clip")


@jax.jit
def median_depth(patches, n):
    """Median inverse depth of frames [n-3, n) (reference slam.py:672-674)."""
    i0 = jnp.maximum(n - 3, 0)
    idx = i0 + jnp.arange(3)
    idx = jnp.minimum(idx, jnp.maximum(n - 1, 0))
    d = jnp.take(patches, idx, axis=0, mode="clip")[:, :, 2]
    return jnp.median(d)


@jax.jit
def compute_points(poses, patches, intr_full, ix):
    """Patch center point cloud (reference slam.py:524-526)."""
    pts = point_cloud(SE3(poses[None]), patches[None], intr_full[None], ix)
    P = patches.shape[-1]
    return (pts[0, :, P // 2, P // 2, :3] / pts[0, :, P // 2, P // 2, 3:])


def shift_gather(poses, patches, intrinsics, imap_buf, gmap_buf, fmap1,
                 fmap2, colors, seg, scale, score, k, npre, *, M, pmem, mem):
    """Keyframe-removal buffer shift as ONE branch-free gather pass.

    k = removed frame row, or -1 for a no-op; npre = frame count before
    the removal. Runs INSIDE the fused frame program, so a steady-state
    removal costs no extra dispatch or program boundary (each program
    start/stop pays transport overhead on the remote device link).
    Matches remove_keyframe_shift / reference slam.py:431-441; returns
    the shifted buffers plus dP (relative pose of the removed frame,
    identity when k < 0)."""
    N = poses.shape[0]
    act = k >= 0
    dP_real = se3_mul(
        jnp.take(poses, jnp.clip(k, 0, N - 1), axis=0),
        se3_inv(jnp.take(poses, jnp.clip(k - 1, 0, N - 1), axis=0)))
    dP = jnp.where(act, dP_real,
                   jnp.asarray([0., 0., 0., 0., 0., 0., 1.], poses.dtype))

    fr = jnp.arange(N)
    map_f = fr + (act & (fr >= k) & (fr <= npre - 2))

    def g(buf):
        return jnp.take(buf, map_f[: buf.shape[0]], axis=0, mode="clip")

    pr = jnp.arange(patches.shape[0])
    map_p = jnp.take(map_f, pr // M, mode="clip") * M + pr % M
    patches = jnp.take(patches, map_p, axis=0, mode="clip")
    score = jnp.take(score, map_p[: score.shape[0]], axis=0, mode="clip")
    # feature ring buffers (imap/gmap/fmap pyramids) are NOT moved: the
    # host maintains row->slot indirection tables (runtime.fslot_rows /
    # pslot_rows) and rewrites the packed index rows instead -- a removal
    # costs zero feature-buffer traffic (the fmap1 pyramid alone is
    # ~180 MB; its 4-slot shift chain was ~15% of the fused program's
    # HBM traffic, round-5 HLO audit)
    return (g(poses), patches, g(intrinsics), imap_buf, gmap_buf,
            fmap1, fmap2, g(colors), g(seg), g(scale), score, dP)


# ---------------------------------------------------------------------------
# fused keyframe removal (fixed-span buffer shift, one dispatch)
# ---------------------------------------------------------------------------


def shift_span_body(poses, patches, intrinsics, imap_buf, gmap_buf,
                    fmap1, fmap2, colors, seg, scale, score, k, n,
                    *, SPAN: int, M: int, pmem: int, mem: int):
    """Delete frame k = n - KEYFRAME_INDEX: rows [k+1, k+1+SPAN) shift to
    [k, k+SPAN); ring slots i%pmem <- (i+1)%pmem for i in [k, k+SPAN).
    SPAN = KEYFRAME_INDEX - 1 is static, so every slice is fixed-shape --
    one dispatch replaces the reference's per-frame Python loop
    (slam.py:431-441). Also inlined into the fused frame program (the
    host knows SPAN at dispatch time): fixed-shape slice copies touch
    only SPAN rows, where a whole-buffer jnp.take over the 393k patch
    rows cost ~38 ms/frame on TPU (measured, round 3).
    """
    # relative pose of the removed frame, for the interpolation delta chain
    dP = se3_mul(jnp.take(poses, k, axis=0, mode="clip"),
                 se3_inv(jnp.take(poses, jnp.maximum(k - 1, 0), axis=0, mode="clip")))

    src = jax.lax.dynamic_slice(poses, (k + 1, 0), (SPAN, 7))
    poses = jax.lax.dynamic_update_slice(poses, src, (k, 0))

    def _shift(buf):
        s = jax.lax.dynamic_slice(buf, (k + 1,) + (0,) * (buf.ndim - 1),
                                  (SPAN,) + buf.shape[1:])
        return jax.lax.dynamic_update_slice(buf, s, (k,) + (0,) * (buf.ndim - 1))
    colors = _shift(colors)
    seg = _shift(seg)
    scale = _shift(scale)
    srci = jax.lax.dynamic_slice(intrinsics, (k + 1, 0), (SPAN, 4))
    intrinsics = jax.lax.dynamic_update_slice(intrinsics, srci, (k, 0))
    P = patches.shape[-1]
    srcp = jax.lax.dynamic_slice(patches, ((k + 1) * M, 0, 0, 0), (SPAN * M, 3, P, P))
    patches = jax.lax.dynamic_update_slice(patches, srcp, (k * M, 0, 0, 0))
    srcs = jax.lax.dynamic_slice(score, ((k + 1) * M,), (SPAN * M,))
    score = jax.lax.dynamic_update_slice(score, srcs, (k * M,))

    # feature ring buffers are untouched: the host slot-indirection tables
    # (runtime.fslot_rows / pslot_rows) absorb the renumbering, so the
    # ~180 MB fmap1 pyramid never moves on a removal (it used to be a
    # 4-slot dynamic-update-slice chain, ~15% of the fused program's HBM
    # traffic -- round-5 HLO audit)
    return (poses, patches, intrinsics, imap_buf, gmap_buf, fmap1, fmap2,
            colors, seg, scale, score, dP)


remove_keyframe_shift = partial(
    jax.jit, static_argnames=("SPAN", "M", "pmem", "mem"),
    donate_argnums=tuple(range(11)))(shift_span_body)


# NOTE: no donation here -- the caller may have stashed references to
# target/weight in the inactive-edge store (state._inac_pending)
@jax.jit
def compact_edge_state(net, target, weight, gather, nkeep):
    """Fused survivor compaction of per-edge device state (one dispatch)."""
    live = (jnp.arange(net.shape[0]) < nkeep)[:, None]
    net = jnp.where(live, jnp.take(net, gather, axis=0, mode="clip"), 0.0)
    target = jnp.where(live, jnp.take(target, gather, axis=0, mode="clip"), 0.0)
    weight = jnp.where(live, jnp.take(weight, gather, axis=0, mode="clip"), 0.0)
    return net, target, weight


@jax.jit
def relative_pose_row(poses, k):
    """dP = pose_k * pose_{k-1}^-1 as one dispatch (keyframe removal)."""
    a = jnp.take(poses, k, axis=0, mode="clip")
    b = jnp.take(poses, jnp.maximum(k - 1, 0), axis=0, mode="clip")
    return se3_mul(a, se3_inv(b))


# ---------------------------------------------------------------------------
# monocular-depth scale anchoring (reference slam.py:565-583)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("M", "P"))
def scale_adjustment(poses, patches, scale_buf, t0, n, w, *, M: int, P: int):
    """Pull the mean window disparity toward the depth-head anchor.

    Gated on rotation magnitude between the last two keyframes
    (angle >= 0.04, reference slam.py:568-570). One fused dispatch.
    """
    from ..lie import se3_inv as _inv, se3_log as _log, se3_mul as _mul

    P1 = jnp.take(poses, jnp.maximum(n - 2, 0), axis=0)
    P2 = jnp.take(poses, jnp.maximum(n - 1, 0), axis=0)
    angle = jnp.linalg.norm(_log(_mul(P1, _inv(P2)))[3:])

    NP = poses.shape[0]
    fr = jnp.arange(NP)
    in_win = (fr >= t0) & (fr < n)
    pk = jnp.arange(patches.shape[0]) // M
    in_win_k = (pk >= t0) & (pk < n)

    d = patches[:, 2, P // 2, P // 2]
    s = jnp.sum(jnp.where(in_win_k, d, 0.0)) / jnp.maximum(jnp.sum(in_win_k), 1)
    anchor = jnp.sum(jnp.where(in_win, scale_buf, 0.0)) / jnp.maximum(jnp.sum(in_win), 1)
    rate = 1.0 + w * (anchor / jnp.maximum(s, 1e-8) - 1.0)
    rate = jnp.where(angle < 0.04, 1.0, rate)

    patches = patches.at[:, 2].multiply(
        jnp.where(in_win_k, rate, 1.0)[:, None, None]
    )

    # shift camera centers toward the t0-1 anchor by (1 - 1/rate)
    # (reference slam.py:579-582 operates on inverse-pose translations)
    inv_all = _inv(poses)
    c_anchor = jnp.take(inv_all, jnp.maximum(t0 - 1, 0), axis=0)[:3]
    xyz = inv_all[:, :3]
    xyz_new = xyz + (1.0 - 1.0 / rate) * (c_anchor[None] - xyz)
    inv_new = jnp.concatenate([xyz_new, inv_all[:, 3:]], axis=-1)
    poses_new = _inv(inv_new)
    poses = jnp.where(in_win[:, None], poses_new, poses)
    return poses, patches


@jax.jit
def dynamic_class_weight(seg_buf, filt_index, kk):
    """1e-4 down-weighting of patches whose seg class is dynamic
    (reference slam.py:585-594)."""
    seg_flat = seg_buf.reshape(-1)
    cls = jnp.take(seg_flat, jnp.clip(kk, 0, None), mode="clip")
    hit = jnp.any(cls[:, None] == filt_index[None, :], axis=1)
    mul = jnp.where(hit, 1e-4, 1.0).astype(jnp.float32)
    return jnp.stack([mul, mul], axis=-1)


@partial(jax.jit, static_argnames=("SPAN",))
def shift_rows(buf, k, *, SPAN: int):
    """Shift rows [k+1, k+1+SPAN) to [k, k+SPAN) (frame deletion)."""
    src = jax.lax.dynamic_slice(buf, (k + 1,) + (0,) * (buf.ndim - 1),
                                (SPAN,) + buf.shape[1:])
    return jax.lax.dynamic_update_slice(buf, src, (k,) + (0,) * (buf.ndim - 1))
