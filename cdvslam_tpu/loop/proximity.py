"""Proximity loop closure (the DPV-SLAM backend).

Candidate long-range edges from old patches to recent frames, filtered by
predicted flow magnitude and greedy NMS (reference:
cdvslam/patchgraph.py:71-97 + loop_closure/optim_utils.py:24-60). The
flow evaluation runs jitted over a padded candidate bucket; the tiny NMS
stays host-side numpy (the reference uses numba for the same reason).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..geom import flow_mag
from ..lie import SE3


def reduce_edges(flow_mags, ii, jj, max_num_edges=1000, nms=1):
    """Greedy NMS edge selection (reference optim_utils.py:24-60)."""
    es = []
    if ii.size == 0:
        return np.zeros((0, 2), np.int64)
    Ni, Nj = ii.max() + 1, jj.max() + 1
    ignore = np.zeros((Ni, Nj), bool)
    for idx in np.argsort(flow_mags):
        if len(es) >= max_num_edges:
            break
        i, j, mag = ii[idx], jj[idx], flow_mags[idx]
        if (j - i) < 30 or mag >= 1000 or ignore[i, j]:
            continue
        es.append((i, j))
        for di in range(-nms, nms + 1):
            if 0 <= i + di < Ni:
                ignore[i + di, j] = True
    return np.asarray(es, np.int64).reshape(-1, 2)


@partial(jax.jit, static_argnames=("M",))
def _candidate_flow(poses, centers, intr_full, ii, jj, kk, mask, M: int, n_pairs: int = 0):
    """Mean flow magnitude per candidate (i, j) pair.

    centers: (K, 3, 1, 1) patch centers. Edges come in M-blocks per pair;
    returns per-pair mean flow (E/M,) with inf where validity < 75%.
    """
    fm, val = flow_mag(
        SE3(poses[None]), centers[None], intr_full[None], ii, jj, kk, beta=0.5
    )
    fm = fm[0, :, 0, 0]
    val = val[0, :, 0, 0] & mask
    fm_sum = jnp.sum((fm * val).reshape(-1, M), axis=1)
    n_val = jnp.sum(val.reshape(-1, M), axis=1)
    mean = fm_sum / jnp.clip(n_val, 1)
    return jnp.where(n_val > (M * 0.75), mean, jnp.inf)


def edges_loop(pg, cfg, RES_unused=None):
    """Generate loop-closure candidate edges (reference patchgraph.py:71-97).

    Returns (kk, jj) host arrays of new edges (M per selected pair).
    """
    M = pg.M
    n = pg.n
    lc_range = cfg.MAX_EDGE_AGE
    l = n - cfg.REMOVAL_WINDOW
    if l <= 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)

    jj_r = np.arange(max(n - cfg.GLOBAL_OPT_FREQ, 0), n - cfg.KEYFRAME_INDEX)
    kk_r = np.arange(max(l - lc_range, 0) * M, l * M)
    if len(jj_r) == 0 or len(kk_r) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)

    jj_c, kk_c = np.meshgrid(jj_r, kk_r, indexing="ij")
    jj_c = jj_c.reshape(-1)
    kk_c = kk_c.reshape(-1)
    ii_c = kk_c // M

    E = len(kk_c)
    E_pad = int(np.ceil(E / (512 * M))) * 512 * M if E > 512 * M else \
        next(b * M for b in (32, 64, 128, 256, 512) if E <= b * M)

    def pad(a, fill=0):
        return np.concatenate([a, np.full(E_pad - E, fill, a.dtype)])

    mask = jnp.asarray(pad(np.ones(E, np.int64), 0).astype(bool))
    centers = pg.patches_[:, :, 1:2, 1:2]  # (N*M, 3, 1, 1)

    fm = _candidate_flow(
        pg.poses_, centers, pg.intrinsics_,
        jnp.asarray(pad(ii_c), jnp.int32), jnp.asarray(pad(jj_c), jnp.int32),
        jnp.asarray(pad(kk_c), jnp.int32), mask, M=M,
    )
    fm = np.asarray(fm)[: E // M]
    pair_ii = ii_c[::M][: E // M]
    pair_jj = jj_c[::M][: E // M]

    good = fm < cfg.BACKEND_THRESH
    es = reduce_edges(fm[good], pair_ii[good], pair_jj[good], max_num_edges=1000, nms=1)
    if len(es) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)

    kk_new = (es[:, 0:1] * M + np.arange(M)[None, :]).reshape(-1)
    jj_new = np.repeat(es[:, 1], M)
    return kk_new, jj_new
