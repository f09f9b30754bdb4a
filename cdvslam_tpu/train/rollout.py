"""Training rollout (reference: cdvslam/net_cdv.py:470-567 forward,
cdvslam/net_dpv.py:189-274; loss at train_cdvo.py:119-156).

TPU-first redesign of the rollout: instead of growing ragged edge lists
per step (reference add_edge/edge_dropout), the FULL edge lattice over all
F frames -- edge (i, j, m) for every frame pair and patch slot, ordered
lexicographically e = (i*F + j)*M + m -- is laid out once with static
shape, and each rollout step activates a subset via masks:

  * frame-visibility mask: edge active iff i, j < n(s), the number of
    frames visible at step s (one frame is revealed per step after
    MIN_FRAME, matching the reference schedule);
  * dropout mask: with prob 0.1 per reveal step, edges touching frame
    n-4 are dropped permanently (reference net_dpv.py:241-246) --
    realized as a mask instead of a removal (shape-stable).

The lexicographic layout makes the (i,j)-group attention permutation the
identity reshape and temporal neighbors a +-M index shift -- no per-step
host indexing at all. One deviation from the reference: when a neighbor
edge is dropped by dropout, it is masked rather than re-linked to the
next surviving neighbor (rare; distributionally equivalent supervision).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ba import ba_solve, TRAINING_PARAMS
from ..geom import transform
from ..lie import SE3, se3_inv, se3_mul, se3_log, se3_scale
from ..models.update import UpdateAux
from ..ops import corr as corr_op



def _safe_norm(x, axis=-1, eps=1e-12):
    """norm with NaN-free gradient at 0 (torch returns subgradient 0 there,
    jnp.linalg.norm returns NaN)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)

class RolloutConfig(NamedTuple):
    F: int              # frames in the clip
    M: int              # patches per image (PPI)
    P: int = 3
    STEPS: int = 12
    MIN_FRAME: int = 8
    structure_only: bool = False
    is_cdv: bool = True
    flow_weight: float = 0.1
    pose_weight: float = 10.0
    # rematerialize each rollout step (and the feature extractors) in the
    # backward pass: the dense recipe (F=4, M=1530 -> 24,480 edges/step)
    # otherwise stores every step's corr volumes + update activations and
    # needs 29.8 GiB vs the chip's 15.75 GiB HBM (round-3 measurement)
    remat: bool = True
    # network compute dtype: 'bfloat16' runs the extractors, corr and
    # update operator in bf16 (the TPU-native analog of the reference's
    # autocast-half training, train_cdvo.py:109-117 / net_cdv.py:569-575)
    # with f32 master params/grads; geometry, BA and the loss stay f32
    compute_dtype: str = "float32"


def n_visible(cfg: RolloutConfig, s: int) -> int:
    if s < cfg.MIN_FRAME:
        return cfg.MIN_FRAME
    return min(cfg.MIN_FRAME + (s - cfg.MIN_FRAME + 1), cfg.F)


def build_static_edges(cfg: RolloutConfig):
    """The full lattice: returns host numpy (ii, jj, kk) and UpdateAux
    pieces that are valid for every step (masks come separately)."""
    F, M = cfg.F, cfg.M
    i = np.repeat(np.arange(F), F * M)
    j = np.tile(np.repeat(np.arange(F), M), F)
    m = np.tile(np.arange(M), F * F)
    kk = i * M + m
    E = F * F * M
    # temporal neighbors: same (i, m), j -> j-1 / j+1
    e = np.arange(E)
    ix = np.where(j >= 1, e - M, -1)
    jx = np.where(j + 1 < F, e + M, -1)
    # group attention permutation: groups are (i, j) pairs; layout is
    # already (group, m) contiguous, so perm is the identity reshape
    perm = e.reshape(F * F, M)
    inv_perm = e
    return i, j, kk, ix, jx, perm, inv_perm


@partial(jax.jit, static_argnames=("model", "cfg"))
def rollout_loss(params, model, cfg: RolloutConfig, images, gt_poses, gt_disps,
                 intrinsics, key):
    """Single-clip training rollout -> scalar loss (+ metrics dict).

    images:     (F, H, W, 3) float [0,255]
    gt_poses:   (F, 7) world->cam (already inverted like train_cdvo.py:107)
    gt_disps:   (F, Hf, Wf) inverse depth at 1/RES resolution (normalized)
    intrinsics: (4,) at full resolution
    """
    F, M, P = cfg.F, cfg.M, cfg.P
    E = F * F * M
    DIM = model.DIM

    # bf16 network compute with f32 master params (casts are
    # differentiable, so grads land on the f32 leaves)
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    cparams = params if cdt == jnp.float32 else jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    images = images / 255.0 if cfg.is_cdv else 2.0 * (images / 255.0) - 0.5
    images = images.astype(cdt)
    intr4 = intrinsics / 4.0
    intr_full = jnp.broadcast_to(intr4, (F, 4))

    # ---- features + patch extraction (all frames at once) ----
    # remat the extractors: only the feature maps are stored for backward,
    # not the DINO/XFeat internals (12 x per-layer attention logits etc.)
    def _ckpt(fn):
        return jax.checkpoint(fn) if cfg.remat else fn

    scores_all = jnp.ones((F * M,))
    if cfg.is_cdv:
        fmap = _ckpt(
            lambda p, im: model.apply(p, im, method=type(model).features_f)
        )(cparams, images)
        tmap, *_ , score = _ckpt(
            lambda p, im: model.apply(p, im, method=type(model).features_i)
        )(cparams, images)
        hf, wf = fmap.shape[2], fmap.shape[3]
        hi, wi = tmap.shape[2], tmap.shape[3]
        key, k1 = jax.random.split(key)
        if getattr(model, "compute_score", False) and score is not None:
            # score-head training: SCORE selection keeps the sampled
            # scores, which multiply the BA weights (net_cdv.py:314-329,
            # 543-545)
            from ..models.patchifier import select_score
            coords, scores_all = select_score(k1, score, M, 4.0 / 14.0, True)
        else:
            from ..models.patchifier import select_random_grid
            coords = select_random_grid(k1, F, M, hi, wi, P, 4.0 / 14.0, True)
        from ..ops.patchify import patchify as patchify_op
        ictx = patchify_op(tmap, (4.0 / 14.0) * coords, 0, mode="upperleft")[..., 0, 0]
        ictx = model.apply(cparams, ictx, method=type(model).adapt)
        gmap = patchify_op(fmap, coords, P // 2, mode="bilinear")
        from ..models.patchifier import coords_grid_with_index
        grid = coords_grid_with_index(gt_disps[None])[0]
        patches_gt = patchify_op(grid, coords, P // 2, mode="bilinear")
    else:
        fmap, imap = _ckpt(
            lambda p, im: model.apply(p, im, method=type(model).features)
        )(cparams, images)
        hf, wf = fmap.shape[2], fmap.shape[3]
        key, k1 = jax.random.split(key)
        from ..models.patchifier import select_random
        coords = select_random(k1, F, M, hf, wf)
        from ..models.patchifier import extract_patches
        gmap, ictx, _, patches_gt = extract_patches(
            fmap, imap, images, gt_disps.astype(fmap.dtype), coords, P
        )

    fmap2 = jax.lax.reduce_window(
        fmap.transpose(0, 2, 3, 1).astype(jnp.float32), 0.0, jax.lax.add,
        (1, 4, 4, 1), (1, 4, 4, 1), "VALID"
    ).transpose(0, 3, 1, 2).astype(fmap.dtype) / 16.0

    patches_gt = patches_gt.reshape(F * M, 3, P, P).astype(jnp.float32)
    gmap = gmap.reshape(F * M, -1, P, P)
    ictx = ictx.reshape(F * M, DIM)

    # random initial depths (reference net_dpv.py:207-208)
    key, k2 = jax.random.split(key)
    d0 = jax.random.uniform(k2, (F * M, 1, 1))
    patches = patches_gt.at[:, 2].set(jnp.broadcast_to(d0, (F * M, P, P)))

    # ---- static edge lattice ----
    ii_np, jj_np, kk_np, ix_np, jx_np, perm_np, inv_np = build_static_edges(cfg)
    ii = jnp.asarray(ii_np, jnp.int32)
    jj = jnp.asarray(jj_np, jnp.int32)
    kk = jnp.asarray(kk_np, jnp.int32)

    # posenc cache over all patches (net_cdv.py:495-499)
    if cfg.is_cdv:
        p_shift = jnp.asarray([wf / 2, hf / 2])
        p_scale = max(wf / 2, hf / 2)
        p_n = (patches[None, :, :2, P // 2, P // 2] - p_shift[None, None]) / p_scale
        posenc_all = model.apply(cparams, p_n.astype(cdt), method=type(model).posenc)
        posenc_edges = posenc_all[:, :, :, kk]   # (2,1,1,E,D/8)
    else:
        posenc_edges = None

    # dropout decisions (one per reveal step)
    key, k3, k4 = jax.random.split(key, 3)
    drop_roll = jax.random.uniform(k3, (cfg.STEPS,))
    drop_mask = jnp.ones(E, bool)

    Gs = SE3.Identity((F,)).data
    if cfg.structure_only:
        Gs = gt_poses

    net = jnp.zeros((E, DIM), cdt)
    bounds = jnp.asarray([-64.0, -64.0, wf + 64.0, hf + 64.0])

    total_loss = 0.0
    metrics = {"px1": 0.0, "ro": 0.0, "tr": 0.0}

    ix_j = jnp.asarray(ix_np, jnp.int32)
    jx_j = jnp.asarray(jx_np, jnp.int32)
    perm_j = jnp.asarray(perm_np, jnp.int32)
    inv_j = jnp.asarray(inv_np, jnp.int32)

    def make_step(s):
        """One rollout step as a standalone function of the carried state,
        so jax.checkpoint can rematerialize its activations (corr volumes,
        update internals, BA factors) in the backward pass instead of
        storing STEPS copies. nv / nv_prev / s are Python statics baked
        into each step's trace; cross-step gradient flows only through
        the hidden state (Gs/patches are stop_gradient'ed, matching the
        reference's per-step detach, net_dpv.py:229)."""
        nv = n_visible(cfg, s)
        nv_prev = n_visible(cfg, s - 1) if s > 0 else cfg.MIN_FRAME

        def step(Gs, patches, net, drop_mask, drop_roll):
            Gs = jax.lax.stop_gradient(Gs)
            patches = jax.lax.stop_gradient(patches)

            if nv > nv_prev:
                # new frame: pose copied from previous (net_dpv.py:231)
                if not cfg.structure_only:
                    Gs = Gs.at[nv - 1].set(Gs[nv - 2])
                # depth init: median of the previous 2 frames' depths
                med = jnp.median(
                    jax.lax.dynamic_slice(
                        patches[:, 2, P // 2, P // 2], ((nv - 3) * M,), (2 * M,)
                    )
                )
                newd = jnp.broadcast_to(med, (M, P, P))
                row = jax.lax.dynamic_slice(
                    patches, ((nv - 1) * M, 0, 0, 0), (M, 3, P, P)
                ).at[:, 2].set(newd)
                patches = jax.lax.dynamic_update_slice(
                    patches, row, ((nv - 1) * M, 0, 0, 0))
                # dropout: with p=0.1 drop edges touching frame nv-4
                do_drop = drop_roll[s] < 0.1
                hit = (ii == nv - 4) | (jj == nv - 4)
                drop_mask = jnp.where(do_drop & hit, False, drop_mask)

            active = (ii < nv) & (jj < nv) & drop_mask

            aux = UpdateAux(
                ix=ix_j, jx=jx_j,
                kseg=jnp.where(active, kk, F * M).astype(jnp.int32),
                gseg=jnp.where(active, ii * F + jj, F * F).astype(jnp.int32),
                perm=perm_j, inv_perm=inv_j, mask=active,
            )
            # neighbors must themselves be active
            act_ix = jnp.take(active, jnp.clip(aux.ix, 0, None), mode="clip") & (aux.ix >= 0)
            act_jx = jnp.take(active, jnp.clip(aux.jx, 0, None), mode="clip") & (aux.jx >= 0)
            aux = aux._replace(
                ix=jnp.where(act_ix, aux.ix, -1), jx=jnp.where(act_jx, aux.jx, -1)
            )

            coords = transform(SE3(Gs[None]), patches[None], intr_full[None], ii, jj, kk)
            coords_nchw = coords.transpose(0, 1, 4, 2, 3)

            c1 = corr_op(gmap[None], fmap[None], coords_nchw, kk, jj, radius=3)
            c2 = corr_op(gmap[None], fmap2[None], coords_nchw / 4.0, kk, jj, radius=3)
            corrf = jnp.stack([c1, c2], -1).reshape(1, E, -1)

            inp = jnp.take(ictx, kk, axis=0, mode="clip")[None]
            if cfg.is_cdv:
                net_b, d, w = model.apply(
                    cparams, net[None], inp, corrf, aux, F * M,
                    posenc=posenc_edges, method=type(model).update,
                )
            else:
                net_b, d, w = model.apply(
                    cparams, net[None], inp, corrf, aux, F * M, F * F,
                    method=type(model).update,
                )
            net = net_b[0]

            target = coords[0, :, P // 2, P // 2, :] + d[0].astype(jnp.float32)
            wgt = (w[0].astype(jnp.float32) * active[:, None]
                   * jnp.take(scores_all, kk, mode="clip")[:, None])

            Gs, patches = ba_solve(
                Gs, patches, intr4, target, wgt, ii, jj, kk, active,
                1, N=F, K=F * M, iterations=2, params=TRAINING_PARAMS,
                structure_only=cfg.structure_only, use_bounds=True, bounds=bounds,
            )

            # ---- supervision (train_cdvo.py:119-156) ----
            dij = jnp.abs(ii - jj)
            sup = active & (dij > 0) & (dij <= 2)
            coords_est = transform(SE3(Gs[None]), patches[None], intr_full[None], ii, jj, kk)
            coords_gt, valid, _ = transform(
                SE3(gt_poses[None]), patches_gt[None], intr_full[None], ii, jj, kk,
                jacobian=True,
            )
            err = _safe_norm(coords_est - coords_gt, axis=-1)[0]       # (E,P,P)
            err_min = jnp.min(err.reshape(E, P * P), axis=-1)
            vmask = sup & (valid[0] > 0.5)
            flow_loss = jnp.sum(jnp.where(vmask, err_min, 0.0)) / jnp.maximum(
                jnp.sum(vmask), 1.0
            )
            loss_s = cfg.flow_weight * flow_loss
            px1 = jnp.sum(jnp.where(vmask, (err_min < 0.25), False)) / jnp.maximum(jnp.sum(vmask), 1)

            tr_m = jnp.float32(0.0)
            ro_m = jnp.float32(0.0)
            if not cfg.structure_only and s >= 2:
                # scaled relative pose loss over visible frames
                P1 = se3_inv(Gs)
                P2 = se3_inv(gt_poses)
                fr_mask = jnp.arange(F) < nv
                t1 = P1[:, :3]
                t2 = P2[:, :3]
                num = jnp.sum(jnp.where(fr_mask, jnp.sum(t2 * t1, -1), 0.0))
                den = jnp.sum(jnp.where(fr_mask, jnp.sum(t1 * t1, -1), 0.0))
                s_scale = jax.lax.stop_gradient(jnp.clip(num / jnp.clip(den, 1e-8), max=10.0))
                P1s = se3_scale(P1, jnp.broadcast_to(s_scale, (F,)))
                fi, fj = jnp.meshgrid(jnp.arange(F), jnp.arange(F), indexing="ij")
                fi, fj = fi.reshape(-1), fj.reshape(-1)
                pair_mask = (fi != fj) & (fi < nv) & (fj < nv)
                dP = se3_mul(se3_inv(P1s[fi]), P1s[fj])
                dG = se3_mul(se3_inv(P2[fi]), P2[fj])
                e1 = se3_log(se3_mul(dP, se3_inv(dG)))
                tr = _safe_norm(e1[:, :3], axis=-1)
                ro = _safe_norm(e1[:, 3:6], axis=-1)
                cnt = jnp.maximum(jnp.sum(pair_mask), 1.0)
                tr_m = jnp.sum(jnp.where(pair_mask, tr, 0.0)) / cnt
                ro_m = jnp.sum(jnp.where(pair_mask, ro, 0.0)) / cnt
                loss_s = loss_s + cfg.pose_weight * (tr_m + ro_m)

            return Gs, patches, net, drop_mask, loss_s, px1, tr_m, ro_m

        return step

    for s in range(cfg.STEPS):
        step = make_step(s)
        if cfg.remat:
            step = jax.checkpoint(step)
        Gs, patches, net, drop_mask, loss_s, px1, tr_m, ro_m = step(
            Gs, patches, net, drop_mask, drop_roll)
        total_loss = total_loss + loss_s
        metrics["px1"] = px1
        if not cfg.structure_only and s >= 2:
            metrics["tr"] = tr_m
            metrics["ro"] = ro_m

    return total_loss, metrics
