"""Global bundle adjustment with block-sparse pose-depth coupling.

TPU-native redesign of the reference's ``EfficentE`` scheme
(reference: cdvslam/fastba/block_e.cu): the pose-depth matrix E has
nonzeros only in (frame-pair entry) x (patch slot) blocks, so

  E Q E^T = sum over source frames i, over pairs (g1, g2) of entries
            sharing i:  E[g1] diag(Q_i) E[g2]^T        (block_e.cu:147-186)

The CUDA atomicAdd kernels become deterministic batched einsums over a
host-built combo index tensor + segment_sum scatters. All shapes are
bucket-padded; one jit per (N, K, E, G, C) bucket tuple.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .ba import BAParams, INFERENCE_PARAMS, _edge_terms, _validity
from ..lie import se3_retr


def build_global_indices(ii, jj, kk, M, buckets=(64, 128, 256, 512, 1024, 2048, 4096)):
    """Host-side index construction (mirrors block_e.cu:43-145).

    Returns a dict of padded numpy arrays + static bucket sizes.
    """
    ii = np.asarray(ii, np.int64)
    jj = np.asarray(jj, np.int64)
    kk = np.asarray(kk, np.int64)
    E = len(ii)
    n_frames = int(max(ii.max(), jj.max())) + 1 if E else 1

    def bucket(x, opts):
        for b in opts:
            if x <= b:
                return b
        return int(np.ceil(x / opts[-1])) * opts[-1]

    # entries: unique (i,j) pairs plus self entries (i,i)
    keys = np.concatenate([ii * n_frames + jj, ii * n_frames + ii])
    uniq, inverse = np.unique(keys, return_inverse=True)
    entry_x = inverse[:E]          # per-edge entry for the Jj block
    entry_s = inverse[E:]          # per-edge self entry for the Ji block
    G = len(uniq)
    g_i = uniq // n_frames         # source frame of each entry
    g_j = uniq % n_frames          # pose block of each entry

    # combos: for each source frame, all ordered pairs of its entries
    combos = []
    order = np.argsort(g_i, kind="stable")
    sorted_i = g_i[order]
    start = 0
    while start < G:
        end = start
        while end < G and sorted_i[end] == sorted_i[start]:
            end += 1
        grp = order[start:end]
        a, b = np.meshgrid(grp, grp, indexing="ij")
        combos.append(np.stack([a.reshape(-1), b.reshape(-1)], -1))
        start = end
    combos = np.concatenate(combos, 0) if combos else np.zeros((0, 2), np.int64)
    C = len(combos)

    E_pad = bucket(E, buckets) * M // M if E else M
    E_pad = bucket(max(E, 1), [b * M for b in (8, 16, 32, 64, 128, 256, 512)])
    G_pad = bucket(max(G, 1), (64, 128, 256, 512, 1024, 2048, 4096, 8192))
    C_pad = bucket(max(C, 1), (256, 512, 1024, 2048, 4096, 8192, 16384, 32768))

    def pad(a, n, fill):
        out = np.full((n,) + a.shape[1:], fill, a.dtype)
        out[: len(a)] = a
        return out

    return {
        "ii": pad(ii, E_pad, 0),
        "jj": pad(jj, E_pad, 0),
        "kk": pad(kk, E_pad, 0),
        "mask": pad(np.ones(E, bool), E_pad, False),
        "entry_x": pad(entry_x, E_pad, G),       # padding -> entry G (dropped)
        "entry_s": pad(entry_s, E_pad, G),
        "slot": pad(kk % M, E_pad, 0),
        "g_i": pad(g_i, G_pad, 0),
        "g_j": pad(g_j, G_pad, 0),
        "g_mask": pad(np.ones(G, bool), G_pad, False),
        "combo_g1": pad(combos[:, 0], C_pad, G_pad - 1),
        "combo_g2": pad(combos[:, 1], C_pad, G_pad - 1),
        "combo_mask": pad(np.ones(C, bool), C_pad, False),
        "G_pad": G_pad,
        "C_pad": C_pad,
        "E_pad": E_pad,
    }


@partial(jax.jit, static_argnames=("N", "K", "M", "G", "C", "iterations", "params"))
def global_ba_solve(
    poses,            # (NP, 7)
    patches,          # (K, 3, P, P)  -- the first n*M patch rows
    intrinsics,       # (4,)
    target, weight,   # (E, 2)
    ii, jj, kk,       # (E,) int32, kk indexes into patches directly
    mask,             # (E,)
    entry_x, entry_s, slot,          # (E,)
    g_i, g_j, g_mask,                # (G,)
    combo_g1, combo_g2, combo_mask,  # (C,)
    t0,
    *,
    N: int, K: int, M: int, G: int, C: int,
    iterations: int = 2,
    params: BAParams = INFERENCE_PARAMS,
):
    """Block-sparse Schur global BA (reference ba_cuda.cu:462-611 with
    eff_impl=True)."""
    cx, cy = intrinsics[2], intrinsics[3]
    dtype = poses.dtype

    def one_iteration(carry, _):
        poses, patches = carry
        r, Ji, Jj, Jz, (x1, y1, Z) = _edge_terms(
            poses, patches, intrinsics, target, ii, jj, kk, params.z_min
        )
        inb = _validity(r, x1, y1, Z, cx, cy, params, None)
        w = weight * (inb & mask)[:, None].astype(dtype)
        r = jnp.where((inb & mask)[:, None], r, 0.0)

        ix = ii - t0
        jx = jj - t0
        vi, vj = ix >= 0, jx >= 0
        bad = N * N

        def bid(a, b, va, vb):
            return jnp.where(va & vb & mask,
                             jnp.clip(a, 0, N - 1) * N + jnp.clip(b, 0, N - 1), bad)

        def blk(Ja, Jb):
            return jnp.einsum("er,eri,erj->eij", w, Ja, Jb,
                              preferred_element_type=jnp.float32)

        Bii, Bjj, Bij = blk(Ji, Ji), blk(Jj, Jj), -blk(Ji, Jj)
        Bflat = jax.ops.segment_sum(
            jnp.concatenate([Bii, Bjj, Bij, jnp.swapaxes(Bij, 1, 2)], 0),
            jnp.concatenate([bid(ix, ix, vi, vi), bid(jx, jx, vj, vj),
                             bid(ix, jx, vi, vj), bid(jx, ix, vj, vi)], 0),
            num_segments=bad + 1,
        )[:bad]
        B = Bflat.reshape(N, N, 6, 6).transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)

        # E_lookup (G+1, M, 6): entry rows; last row is the padding sink
        ei = -jnp.einsum("er,eri,er->ei", w, Ji, Jz, preferred_element_type=jnp.float32)
        ej = jnp.einsum("er,eri,er->ei", w, Jj, Jz, preferred_element_type=jnp.float32)
        eid_x = jnp.where(mask, entry_x * M + slot, G * M)
        eid_s = jnp.where(mask, entry_s * M + slot, G * M)
        E_lookup = jax.ops.segment_sum(
            jnp.concatenate([ej, ei], 0),
            jnp.concatenate([eid_x, eid_s], 0),
            num_segments=G * M + 1,
        )[: G * M].reshape(G, M, 6)

        # C, u over patches (K,)
        kid = jnp.where(mask, jnp.clip(kk, 0, K - 1), K)
        Cd = jax.ops.segment_sum(jnp.sum(w * Jz * Jz, -1), kid, num_segments=K + 1)[:K]
        u = jax.ops.segment_sum(jnp.sum(w * r * Jz, -1), kid, num_segments=K + 1)[:K]
        Q = 1.0 / (Cd + params.lmbda)

        # v over poses
        vi_vec = -jnp.einsum("er,eri->ei", w * r, Ji, preferred_element_type=jnp.float32)
        vj_vec = jnp.einsum("er,eri->ei", w * r, Jj, preferred_element_type=jnp.float32)
        vid_i = jnp.where(vi & mask, jnp.clip(ix, 0, N - 1), N)
        vid_j = jnp.where(vj & mask, jnp.clip(jx, 0, N - 1), N)
        v = jax.ops.segment_sum(
            jnp.concatenate([vi_vec, vj_vec], 0),
            jnp.concatenate([vid_i, vid_j], 0),
            num_segments=N + 1,
        )[:N].reshape(6 * N)

        # ---- EQEt via combos (block_e.cu:147-186) ----
        Qmap = Q.reshape(-1, M)                       # (n_frames<=K/M, M)
        E1 = jnp.take(E_lookup, combo_g1, axis=0, mode="clip")      # (C, M, 6)
        E2 = jnp.take(E_lookup, combo_g2, axis=0, mode="clip")
        src_i = jnp.take(g_i, combo_g1, axis=0, mode="clip")        # (C,)
        qrow = jnp.take(Qmap, jnp.clip(src_i, 0, K // M - 1), axis=0, mode="clip")  # (C, M)
        blocks = jnp.einsum("cka,ckb->cab", E1 * qrow[..., None], E2,
                            preferred_element_type=jnp.float32)     # (C,6,6)
        p1 = jnp.take(g_j, combo_g1, axis=0, mode="clip") - t0
        p2 = jnp.take(g_j, combo_g2, axis=0, mode="clip") - t0
        cvalid = combo_mask & (p1 >= 0) & (p2 >= 0)
        cid = jnp.where(cvalid, jnp.clip(p1, 0, N - 1) * N + jnp.clip(p2, 0, N - 1), bad)
        EQEt_flat = jax.ops.segment_sum(blocks, cid, num_segments=bad + 1)[:bad]
        EQEt = EQEt_flat.reshape(N, N, 6, 6).transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)

        # ---- E(Q u) via entries (block_e.cu:204-234) ----
        qu = (Q * u).reshape(-1, M)
        qu_g = jnp.take(qu, jnp.clip(g_i, 0, K // M - 1), axis=0, mode="clip")  # (G, M)
        ev_g = jnp.einsum("gk,gki->gi", qu_g, E_lookup,
                          preferred_element_type=jnp.float32)       # (G, 6)
        gp = g_j - t0
        gvalid = g_mask & (gp >= 0)
        gid = jnp.where(gvalid, jnp.clip(gp, 0, N - 1), N)
        EQu = jax.ops.segment_sum(ev_g, gid, num_segments=N + 1)[:N].reshape(6 * N)

        S = B - EQEt
        y = v - EQu
        S = S + jnp.diag(params.lm * jnp.diag(S) + params.ep)
        L, low = jax.scipy.linalg.cho_factor(S, lower=True)
        dX_flat = jax.scipy.linalg.cho_solve((L, low), y)
        dX_flat = jnp.where(jnp.any(jnp.isnan(dX_flat)), 0.0, dX_flat)

        # ---- E^T dX via entries (block_e.cu:253-283) ----
        dxg = jnp.take(dX_flat.reshape(N, 6), jnp.clip(gp, 0, N - 1), axis=0, mode="clip")
        dxg = jnp.where(gvalid[:, None], dxg, 0.0)
        etv_g = jnp.einsum("gki,gi->gk", E_lookup, dxg,
                           preferred_element_type=jnp.float32)      # (G, M)
        pid = (jnp.clip(g_i, 0, K // M - 1)[:, None] * M
               + jnp.arange(M)[None, :]).reshape(-1)
        pid = jnp.where(jnp.repeat(g_mask, M), pid, K)
        EtdX = jax.ops.segment_sum(etv_g.reshape(-1), pid, num_segments=K + 1)[:K]

        dZ = Q * (u - EtdX)
        dX = dX_flat.reshape(N, 6)

        # retractions (same clamps as local BA)
        win = t0 + jnp.arange(N)
        valid_w = win < poses.shape[0]
        old = jnp.take(poses, jnp.clip(win, 0, poses.shape[0] - 1), axis=0)
        new = se3_retr(old, dX.astype(dtype))
        poses = poses.at[jnp.clip(win, 0, poses.shape[0] - 1)].set(
            jnp.where(valid_w[:, None], new, old)
        )

        d_old = patches[:, 2, 0, 0]
        d_new = d_old + dZ.astype(dtype)
        d_new = jnp.where(d_new > 20.0, 1.0, d_new)
        d_new = jnp.maximum(d_new, 1e-4)
        touched = jax.ops.segment_sum(mask.astype(jnp.int32), kid, num_segments=K + 1)[:K] > 0
        d_new = jnp.where(touched, d_new, d_old)
        P = patches.shape[-1]
        patches = patches.at[:, 2].set(jnp.broadcast_to(d_new[:, None, None], (K, P, P)))

        return (poses, patches), None

    (poses, patches), _ = jax.lax.scan(one_iteration, (poses, patches), None, length=iterations)
    return poses, patches
