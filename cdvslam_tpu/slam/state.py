"""SLAM state: device buffers + host edge bookkeeping.

The reference's PatchGraph (reference: cdvslam/patchgraph.py) pre-allocates
everything -- that maps 1:1 onto fixed-shape JAX device buffers. Edge lists
(ii/jj/kk) stay host-side numpy (tiny, control-flow heavy); per-edge device
state (hidden net, target, weight) lives in bucket-padded device arrays
aligned with the host edge order.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class PatchGraph:
    """State container (device buffers + host mirrors)."""

    def __init__(self, cfg, P, DIM, DIMF, pmem, mem, ht4, wd4, dtype=jnp.float32,
                 fdtype=None):
        self.cfg = cfg
        self.P = P
        self.DIM = DIM
        self.M = cfg.PATCHES_PER_FRAME
        self.N = cfg.BUFFER_SIZE
        self.pmem = pmem
        self.mem = mem

        fdtype = fdtype or dtype
        self.fdtype = fdtype
        M, N = self.M, self.N
        self.n = 0      # number of keyframes
        self.m = 0      # number of patches
        self.counter = 0  # all processed frames

        self.tstamps_ = np.zeros(N, dtype=np.int64)
        self.poses_ = jnp.zeros((N, 7), dtype).at[:, 6].set(1.0)
        # patches stored flat (N*M, 3, P, P): frame f owns rows [f*M, (f+1)*M)
        self.patches_ = jnp.zeros((N * M, 3, P, P), dtype)
        self.intrinsics_ = jnp.zeros((N, 4), dtype)
        self.points_ = jnp.zeros((N * M, 3), dtype)
        self.colors_ = np.zeros((N, M, 3), np.uint8)
        self.colors_dev = jnp.zeros((N, M, 3), dtype)
        self.seg_dev = jnp.zeros((N, M), jnp.uint8)
        self.seg_ = np.zeros((N, M), np.uint8)
        self.scale_ = jnp.zeros(N, dtype)
        # per-patch selection score (SCORE strategy keeps the sampled
        # scores and they multiply the BA weights, net_cdv.py:543-545)
        self.score_dev = jnp.ones(N * M, dtype)

        # feature ring buffers (network compute dtype, e.g. bf16)
        self.imap_ = jnp.zeros((pmem * M, DIM), fdtype)
        self.gmap_ = jnp.zeros((pmem * M, DIMF, P, P), fdtype)
        # frame pyramids are stored PRE-PADDED in the corr kernel layout
        # (rows OUTER / channels sublane, zero border, two 64-shifted x
        # copies on the lane axis), so the pad + shift copies are not
        # rebuilt on every corr call
        from ..ops.corr_pallas import padded_dims
        Hp1, Wc1 = padded_dims(ht4, wd4)
        Hp2, Wc2 = padded_dims(ht4 // 4, wd4 // 4)
        self.fmap1_ = jnp.zeros((mem, Hp1, DIMF, 2 * Wc1), fdtype)
        self.fmap2_ = jnp.zeros((mem, Hp2, DIMF, 2 * Wc2), fdtype)

        # host edge lists (active)
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.kk = np.zeros(0, np.int64)
        # device per-edge state, bucket-padded, aligned with host order
        self.cap = 0
        self.net_valid = 0   # net rows >= this are stale (zeroed in-step)
        self.net = jnp.zeros((0, DIM), fdtype)
        self.target = jnp.zeros((0, 2), dtype)
        self.weight = jnp.zeros((0, 2), dtype)

        # inactive (retired) edges kept for global BA
        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.kk_inac = np.zeros(0, np.int64)
        self._target_inac = np.zeros((0, 2), np.float32)
        self._weight_inac = np.zeros((0, 2), np.float32)
        self._inac_pending = []   # deferred (device target, weight, mask)
        self._pending_gather = None  # deferred edge compaction (keep, nkeep)

        # relative poses of removed (non-key) frames: t -> (t0, dP 7-vec np)
        self.delta = {}

    # -- edge-count bucketing ------------------------------------------------
    def bucket(self, E):
        for b in self.cfg.EDGE_BUCKETS:
            if E <= b:
                return b
        # beyond the listed buckets, pad at 1024 granularity: per-edge
        # work (corr, BA) is ~2/3 of the frame program, so coarse 4096
        # rounding wasted up to ~28% of it at the EuRoC steady state
        return -(E // -1024) * 1024

    @property
    def E(self):
        return len(self.ii)

    def _grow(self, cap):
        if cap <= self.cap:
            return
        pad = cap - self.cap
        self.net = jnp.concatenate([self.net, jnp.zeros((pad, self.DIM), self.net.dtype)])
        self.target = jnp.concatenate([self.target, jnp.zeros((pad, 2), self.target.dtype)])
        self.weight = jnp.concatenate([self.weight, jnp.zeros((pad, 2), self.weight.dtype)])
        self.cap = cap

    def append_edges(self, ii, jj, kk):
        """Append edges (new hidden state = 0). reference slam.py:331-337."""
        E0 = self.E
        self.ii = np.concatenate([self.ii, np.asarray(ii, np.int64)])
        self.jj = np.concatenate([self.jj, np.asarray(jj, np.int64)])
        self.kk = np.concatenate([self.kk, np.asarray(kk, np.int64)])
        self._grow(self.bucket(self.E))
        # stale rows in [net_valid, E) are zeroed inside the jitted update
        # step (an eager zeroing op here would cost a device round trip)

    def remove_edges(self, drop_mask, store: bool):
        """Remove edges where drop_mask; optionally retire to the inactive
        store (reference slam.py:339-354)."""
        drop_mask = np.asarray(drop_mask, bool)
        if not drop_mask.any():
            return
        if store:
            # defer the device work entirely: stash buffer refs + mask;
            # materialized lazily by consumers (global BA)
            self.ii_inac = np.concatenate([self.ii_inac, self.ii[drop_mask]])
            self.jj_inac = np.concatenate([self.jj_inac, self.jj[drop_mask]])
            self.kk_inac = np.concatenate([self.kk_inac, self.kk[drop_mask]])
            self._inac_pending.append(
                (self.target, self.weight, self.E, drop_mask.copy())
            )
        keep = np.nonzero(~drop_mask)[0]
        self.ii = self.ii[~drop_mask]
        self.jj = self.jj[~drop_mask]
        self.kk = self.kk[~drop_mask]
        # compact device state: gather survivors to the front, zero the tail
        from .kernels import compact_edge_state
        idx = np.zeros(self.cap, np.int64)
        idx[: len(keep)] = keep
        self.net, self.target, self.weight = compact_edge_state(
            self.net, self.target, self.weight, jnp.asarray(idx), len(keep)
        )
        self.net_valid = min(self.net_valid, len(keep)) if False else len(keep)

    def reindex_after_removal(self, k):
        """Shift frame indices after deleting keyframe k
        (reference slam.py:427-429)."""
        M = self.M
        self.kk = np.where(self.ii > k, self.kk - M, self.kk)
        self.ii = np.where(self.ii > k, self.ii - 1, self.ii)
        self.jj = np.where(self.jj > k, self.jj - 1, self.jj)
        self.kk_inac = np.where(self.ii_inac > k, self.kk_inac - M, self.kk_inac)
        self.ii_inac = np.where(self.ii_inac > k, self.ii_inac - 1, self.ii_inac)
        self.jj_inac = np.where(self.jj_inac > k, self.jj_inac - 1, self.jj_inac)

    def _flush_inac(self):
        """Materialize deferred inactive-edge targets/weights (host)."""
        if not self._inac_pending:
            return
        parts_t, parts_w = [self._target_inac], [self._weight_inac]
        for tgt_dev, wgt_dev, E, mask in self._inac_pending:
            t_np = np.asarray(tgt_dev)[:E][mask]
            w_np = np.asarray(wgt_dev)[:E][mask]
            parts_t.append(t_np.astype(np.float32))
            parts_w.append(w_np.astype(np.float32))
        self._target_inac = np.concatenate(parts_t)
        self._weight_inac = np.concatenate(parts_w)
        self._inac_pending = []

    @property
    def target_inac(self):
        self._flush_inac()
        return self._target_inac

    @property
    def weight_inac(self):
        self._flush_inac()
        return self._weight_inac

    def remove_edges_combined(self, drop_mask, retire_mask, ii_post, jj_post,
                              kk_post, defer=False):
        """Drop + retire in ONE device compaction. Masks are over the
        CURRENT edge list; (ii/jj/kk)_post are post-removal reindexed
        values used for the retired store and the surviving list.

        With ``defer`` the device compaction is not dispatched: the
        survivor gather is stashed in ``_pending_gather`` and applied
        INSIDE the next fused update program (saves one dispatch per
        frame). Only valid when the retired targets/weights are never
        consumed (LOOP_CLOSURE off) -- the fused program donates the
        buffers the inactive store would reference."""
        drop_mask = np.asarray(drop_mask, bool)
        retire_mask = np.asarray(retire_mask, bool)
        gone = drop_mask | retire_mask
        if not gone.any():
            self.ii, self.jj, self.kk = ii_post, jj_post, kk_post
            return
        if retire_mask.any():
            self.ii_inac = np.concatenate([self.ii_inac, ii_post[retire_mask]])
            self.jj_inac = np.concatenate([self.jj_inac, jj_post[retire_mask]])
            self.kk_inac = np.concatenate([self.kk_inac, kk_post[retire_mask]])
            if not defer:
                self._inac_pending.append(
                    (self.target, self.weight, self.E, retire_mask.copy()))
        keep = np.nonzero(~gone)[0]
        self.ii = ii_post[~gone]
        self.jj = jj_post[~gone]
        self.kk = kk_post[~gone]
        if defer:
            self._pending_gather = (keep, len(keep))
            self.net_valid = len(keep)
            return
        from .kernels import compact_edge_state
        idx = np.zeros(self.cap, np.int64)
        idx[: len(keep)] = keep
        self.net, self.target, self.weight = compact_edge_state(
            self.net, self.target, self.weight, jnp.asarray(idx), len(keep)
        )
        self.net_valid = len(keep)
