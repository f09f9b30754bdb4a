"""The SLAM runtime driver (L4).

Mirrors the reference's SLAM class surface (reference: cdvslam/slam.py:24):
``slam = SLAM(cfg, network, ht, wd); slam(t, image, intrinsics);
poses, tstamps = slam.terminate()``.

Architecture: all heavy compute (feature extraction, correlation, update
operator, bundle adjustment) runs in bucketed jitted kernels
(slam/kernels.py); this driver keeps edge lists and control flow on the
host. One deliberate host sync per frame: the keyframe/motion-probe
decisions (scalar reads), same as the reference.

``update_override`` injects a replacement for the learned update operator
-- used by the test harness to run the full runtime with oracle
correspondences (ground-truth flow) so the geometry/state machinery is
validated independently of network weights.
"""
from __future__ import annotations

import math
from functools import partial
from warnings import warn

import numpy as np
import jax
import jax.numpy as jnp

from ..ba import ba_solve
from ..config import get_cfg
from ..geom import transform
from ..lie import SE3, se3_inv, se3_mul
from ..models import CDVNet, VONet, build_update_aux
from ..models.patchifier import (
    extract_patches, pyramidify, select_gradient_bias, select_random,
    select_random_grid, select_score,
)
from ..utils.timer import Timer
from .kernels import (
    compact_edge_state, compute_points, gather_rows, median_depth,
    motion_extrapolate, motionmag, remove_keyframe_shift, shift_gather,
    shift_span_body,
    update_body, update_step,
)
from .state import PatchGraph


class SLAM:
    def __init__(self, cfg=None, network="cdv", ht=480, wd=640, viz=False,
                 seed=0, params=None, update_override=None):
        self.cfg = cfg if cfg is not None else get_cfg()
        assert ht % 16 == 0 and wd % 16 == 0, "image dims must be multiples of 16"
        self.ht, self.wd = ht, wd
        self.is_initialized = False
        self.enable_timing = False
        self.update_override = update_override
        self.viz = viz

        self.is_cdv = network == "cdv" or isinstance(network, CDVNet)
        if isinstance(network, (CDVNet, VONet)):
            self.model = network
        elif network == "cdv":
            self.model = CDVNet()
        elif network == "dpv":
            self.model = VONet()
        else:
            raise NotImplementedError(network)

        self.DIM = self.model.DIM
        self.DIMF = self.model.DIMF
        self.RES = self.model.RES
        self.P = self.model.P

        self.M = self.cfg.PATCHES_PER_FRAME
        self.N = self.cfg.BUFFER_SIZE

        self.key = jax.random.PRNGKey(seed)

        # feature memory (reference slam.py:64-68)
        self.pmem = self.mem = 36
        self.last_global_ba = -1000
        if self.cfg.LOOP_CLOSURE:
            self.pmem = min(self.cfg.MAX_EDGE_AGE, self.cfg.BUFFER_SIZE)

        ht4, wd4 = ht // self.RES, wd // self.RES
        self.ht4, self.wd4 = ht4, wd4
        # static unpadded dims of the pre-padded frame pyramids
        self._hw1 = (ht4, wd4)
        self._hw2 = (ht4 // 4, wd4 // 4)
        self.fdtype = jnp.bfloat16 if self.cfg.MIXED_PRECISION else jnp.float32
        self.pg = PatchGraph(self.cfg, self.P, self.DIM, self.DIMF,
                             self.pmem, self.mem, ht4, wd4, fdtype=self.fdtype)

        # static capacities for the jitted update
        self.KWIN = (self.cfg.REMOVAL_WINDOW + 6) * self.M
        self.NW = self.cfg.POSE_WINDOW

        # row -> physical feature-slot indirection (fmap pyramids keyed by
        # frame row via fslot_rows; imap/gmap patch rows via pslot_rows).
        # Keyframe removals renumber ROWS only -- the tables absorb the
        # permutation so the ~200 MB of feature ring buffers never move
        # on device (round-5: the 4-slot fmap shift chain was ~15% of the
        # fused program's HBM traffic)
        self.fslot_rows = np.zeros(self.N, np.int32)
        self.pslot_rows = np.zeros(self.N, np.int32)

        self.tlist = []
        self.traj = {}
        # feature-fire counters (smoke tests assert the named subsystem of
        # each fidelity config actually executed, not just shape-validity)
        self.stats = {"updates": 0, "loop_edges": 0, "lc_attempts": 0,
                      "lc_applied": 0, "keyframe_removals": 0,
                      "global_ba": 0}
        self._ones_cache = {}
        self._prep_cache = {}
        self._intr_cache = {}
        self.terminating = False
        self.ran_global_ba = np.zeros(100000, dtype=bool)

        # optional seg/depth heads (reference slam.py:129-183)
        self.seg_params = None
        self.depth_params = None
        self.depth_is_dpt = False
        self.filt_index = None
        if self.is_cdv:
            self._setup_heads()

        self.long_term_lc = None
        if self.cfg.CLASSIC_LOOP_CLOSURE:
            try:
                from ..loop.long_term import LongTermLoopClosure
                self.long_term_lc = LongTermLoopClosure(self.cfg, self)
            except Exception as e:
                self.cfg.CLASSIC_LOOP_CLOSURE = False
                warn(f"classical loop closure unavailable: {e}")

        if params is not None:
            self.params = params
        else:
            self.params = self._init_params()
            warn("Network initialized with RANDOM weights (no checkpoint).")
        # compute-precision copy of the weights (reference runs autocast
        # half, slam.py:59-62; bf16 is the TPU-native equivalent)
        if self.cfg.MIXED_PRECISION:
            self.cparams = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                self.params,
            )
        else:
            self.cparams = self.params

        self.viewer = None
        if viz:
            # viz=True -> interactive browser viewer (reference o3dviewer
            # equivalent); viz="snapshot" -> headless PNG snapshots
            if viz == "snapshot":
                from ..viz.viewer import SnapshotViewer
                self.viewer = SnapshotViewer(self)
            else:
                try:
                    from ..viz.web_viewer import WebViewer
                    self.viewer = WebViewer(self)
                except Exception as e:
                    warn(f"web viewer unavailable ({e}); using snapshots")
                    from ..viz.viewer import SnapshotViewer
                    self.viewer = SnapshotViewer(self)

        self._frame_fn = None   # lazily built per network type
        self._frame_body = None
        self._fused_fn = None   # frame-insert + update in ONE dispatch
        self._kf_queue = []     # lagged keyframe decisions (pid, mm_dev)

    # ------------------------------------------------------------------
    def _alloc_slot(self, table, n, cap):
        """Pick a feature slot for new frame row n: any slot not held by
        the last cap-1 rows (edges only reference frames/patches within
        that window, same guarantee the old `row % cap` ring gave).
        Rotates from the previous row's slot, so with no removals this
        reproduces the plain ring."""
        used = set(table[max(0, n - cap + 1): n].tolist())
        s = (int(table[n - 1]) + 1) % cap if n > 0 else 0
        while s in used:
            s = (s + 1) % cap
        return s

    def _alloc_frame_slots(self, n):
        """Allocate + record the fmap/imap slots for new frame row n."""
        fs = self._alloc_slot(self.fslot_rows, n, self.mem)
        ps = self._alloc_slot(self.pslot_rows, n, self.pmem)
        self.fslot_rows[n] = fs
        self.pslot_rows[n] = ps
        return fs, ps

    # ------------------------------------------------------------------
    def _setup_heads(self):
        """Load seg/depth heads from checkpoints when configured; random
        init when the path is 'random' (for tests)."""
        from ..models.heads import DepthHeadFlatten, SegHeadFlatten

        cfg = self.cfg
        if cfg.SEG_HEAD and cfg.SEG_HEAD != "None":
            self.seg_head = SegHeadFlatten(num_classes=150)
            if cfg.SEG_HEAD == "random":
                self.seg_params = self.seg_head.init(
                    jax.random.PRNGKey(11), jnp.zeros((1, 384)))
            else:
                from pathlib import Path
                if Path(cfg.SEG_HEAD).exists():
                    from ..models.convert import load_seg_head
                    self.seg_params = load_seg_head(cfg.SEG_HEAD)
                else:
                    warn(f"seg head checkpoint not found: {cfg.SEG_HEAD}")
            if self.seg_params is not None:
                from ..models.datamaps import ADE20K_INDEX_FILT
                self.filt_index = np.asarray(ADE20K_INDEX_FILT, np.uint8)
        if cfg.DEPTH_HEAD and cfg.DEPTH_HEAD != "None":
            # 'dpt' selects the dense DPT head on the four DINO taps,
            # anything else the linear token head (reference slam.py:160-183)
            self.depth_is_dpt = "dpt" in cfg.DEPTH_HEAD
            from pathlib import Path
            if self.depth_is_dpt:
                from ..models.dpt import DPTHead
                self.depth_head = DPTHead()
                if cfg.DEPTH_HEAD in ("dpt", "dpt_random"):
                    hi = -(-self.ht // 14)
                    wi = -(-self.wd // 14)
                    taps = [(jnp.zeros((1, hi, wi, 384)), jnp.zeros((1, 384)))
                            for _ in range(4)]
                    self.depth_params = self.depth_head.init(
                        jax.random.PRNGKey(12), taps)
                elif Path(cfg.DEPTH_HEAD).exists():
                    from ..models.convert import load_dpt_head
                    self.depth_params = load_dpt_head(cfg.DEPTH_HEAD)
                else:
                    warn(f"depth head checkpoint not found: {cfg.DEPTH_HEAD}")
            else:
                self.depth_head = DepthHeadFlatten()
                if cfg.DEPTH_HEAD == "random":
                    self.depth_params = self.depth_head.init(
                        jax.random.PRNGKey(12), jnp.zeros((1, 768)))
                elif Path(cfg.DEPTH_HEAD).exists():
                    from ..models.convert import load_depth_head
                    self.depth_params = load_depth_head(cfg.DEPTH_HEAD)
                else:
                    warn(f"depth head checkpoint not found: {cfg.DEPTH_HEAD}")
            if self.depth_params is not None:
                self.scale_factor = self.depth_head.max_depth / 4.0

    def _init_params(self):
        img = jnp.zeros((1, self.ht, self.wd, 3))
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
        if self.is_cdv:
            pf = self.model.init(k1, img, method=CDVNet.features_f)
            pi = self.model.init(k2, img, method=CDVNet.features_i)
            E = 8
            net = jnp.zeros((1, E, self.DIM))
            corr = jnp.zeros((1, E, 2 * 49 * self.P * self.P))
            aux = build_update_aux(
                np.zeros(E, np.int64), np.arange(E), np.arange(E),
                0, 16, M=E, E_pad=E,
            )
            posenc = self.model.init(k4, jnp.zeros((1, E, 2)), method=CDVNet.posenc)
            pu = self.model.init(k3, net, net, corr, aux, 16,
                                 method=CDVNet.update)
            params = jax.tree_util.tree_map(lambda x: x, pf)
            merged = {}
            for p in (pf, pi, pu, posenc):
                merged = _deep_merge(merged, p)
            return merged
        else:
            pf = self.model.init(k1, img, method=VONet.features)
            E = 8
            net = jnp.zeros((1, E, self.DIM))
            corr = jnp.zeros((1, E, 2 * 49 * self.P * self.P))
            aux = build_update_aux(
                np.zeros(E, np.int64), np.arange(E), np.arange(E), 0, 16, E_pad=E
            )
            pu = self.model.init(k3, net, net, corr, aux, 16, E,
                                 method=VONet.update)
            return _deep_merge(dict(pf), dict(pu))

    # ------------------------------------------------------------------
    # frame feature extraction (jitted per network type)
    # ------------------------------------------------------------------
    def _process_frame(self, image_u8, key, fac, initialized, intr_row):
        """One fused dispatch for the whole per-frame state path: preprocess,
        feature extraction, patch selection/gather, motion model, depth
        init, ring-buffer + patch-row writes (reference spreads this over
        slam.py:625-682 with many separate kernel launches)."""
        cfg = self.cfg
        M, P = self.M, self.P
        pg = self.pg

        if self._frame_fn is None:
            model, is_cdv = self.model, self.is_cdv
            strategy = cfg.CENTROID_SEL_STRAT
            upperleft = cfg.CENTROID_SAMPLE_STRAT == "UPPERLEFT"
            simple = getattr(self.model, "simple_preprocess", False)
            cdtype = self.fdtype
            seg_head = getattr(self, "seg_head", None) if self.seg_params is not None else None
            seg_params = self.seg_params
            depth_head = getattr(self, "depth_head", None) if self.depth_params is not None else None
            depth_params = self.depth_params
            depth_is_dpt = self.depth_is_dpt
            scale_factor = getattr(self, "scale_factor", 20.0)
            pmem, mem, N = self.pmem, self.mem, self.N
            damping = cfg.MOTION_DAMPING
            filt_idx = (jnp.asarray(self.filt_index.astype(np.int32))
                        if self.filt_index is not None else None)
            from ..lie import se3_exp, se3_inv, se3_log, se3_mul
            from ..ops.patchify import patchify as patchify_op
            from ..models.patchifier import (
                coords_grid_with_index, seg_binary_score)
            ht_, wd_ = self.ht, self.wd
            import os as _os

            def frame_fn(params, image_u8, seed, poses, patches_buf, intr_buf,
                         imap_buf, gmap_buf, f1buf, f2buf, colors_buf,
                         seg_buf, scale_buf, score_buf, n, fac,
                         initialized, intr_row, fslot, pslot):
                # FUSE_ABL: phase ablations for perf budgeting, read at
                # TRACE time (inside the body, so an in-process re-jit --
                # e.g. tools/bench_abl_sweep -- picks up env changes; a
                # build-time read froze these to the warmup value)
                _abl = set(filter(
                    None, _os.environ.get("FUSE_ABL", "").split(",")))
                key = jax.random.fold_in(jax.random.PRNGKey(7), seed)
                # image arrives as a FLAT u8 upload (transport layout cost)
                img = image_u8.reshape(ht_, wd_, 3).astype(jnp.float32)
                image_f32 = (img / 255.0)[None] if simple else (2.0 * (img / 255.0) - 0.5)[None]
                image = image_f32.astype(cdtype)

                if is_cdv:
                    if "no_feat" in _abl:
                        # channel count from the gmap ring (24 for XFeat)
                        fmap = (jnp.zeros((1, gmap_buf.shape[1],
                                           ht_ // 4, wd_ // 4), cdtype)
                                + image[0, 0, 0, 0])
                    else:
                        fmap = model.apply(params, image, method=CDVNet.features_f)
                    tap_pairs = None
                    if "no_dino" in _abl:
                        hi_, wi_ = -(-ht_ // 14), -(-wd_ // 14)
                        dep = image[0, 0, 0, 0]
                        tmap = jnp.zeros((1, 384, hi_, wi_), cdtype) + dep
                        tn = jnp.zeros((1, hi_ * wi_, 384), cdtype) + dep
                        trw = tn
                        cls = jnp.zeros((1, 384), cdtype) + dep
                        score = (jnp.ones((1, hi_, wi_), jnp.float32)
                                 + dep.astype(jnp.float32) * 0)
                        if depth_head is not None and depth_is_dpt:
                            tap_pairs = [(tn.reshape(1, hi_, wi_, 384), cls)] * 4
                    elif depth_head is not None and depth_is_dpt:
                        tmap, tn, trw, cls, score, tap_pairs = model.apply(
                            params, image, method=CDVNet.features_i_taps
                        )
                    else:
                        tmap, tn, trw, cls, score = model.apply(
                            params, image, method=CDVNet.features_i
                        )
                    nb, _, hf, wf = fmap.shape
                    hi, wi = tmap.shape[2], tmap.shape[3]
                    scale_f2i = 4.0 / 14.0
                    score_row = jnp.ones((M,), jnp.float32)
                    if strategy == "SCORE" and score is not None:
                        coords, score_row = select_score(
                            key, score, M, scale_f2i, upperleft)
                    elif strategy == "SCORE" and seg_head is not None:
                        # no score head: selection-time dynamic-class
                        # filtering -- binary non-dynamic score map with
                        # zeroed borders (reference net_cdv.py:231-238)
                        filt = seg_head.apply(
                            seg_params, tn[0], filt_idx,
                            method=type(seg_head).filt_mask)
                        smap = seg_binary_score(filt, 1, hi, wi)
                        coords, score_row = select_score(
                            key, smap, M, scale_f2i, upperleft)
                    elif strategy == "SCORE":
                        raise ValueError(
                            "SCORE selection needs a score head or seg head "
                            "(reference net_cdv.py:318 asserts score_map)")
                    elif strategy == "RANDOM":
                        coords = select_random(key, nb, M, hf, wf)
                    else:
                        coords = select_random_grid(key, nb, M, hi, wi, P, scale_f2i, upperleft)
                    if "no_select" in _abl:
                        # knockout: replace the (sorted) selection with
                        # cheap random coords (score-head work upstream
                        # of the selection may be DCE'd with it)
                        coords = select_random(key, nb, M, hf, wf)
                        score_row = jnp.ones((M,), jnp.float32)
                    ictx = patchify_op(tmap, scale_f2i * coords, 0,
                                       mode="upperleft" if upperleft else "bilinear")[..., 0, 0]
                    ictx = model.apply(params, ictx, method=CDVNet.adapt)
                    if seg_head is not None:
                        # per-patch token classification (slam.py:543-552)
                        logit = seg_head.apply(
                            seg_params, (ictx[0] * 4.0).astype(jnp.float32))
                        seg_row = jnp.argmax(logit, axis=-1).astype(jnp.uint8)
                    else:
                        seg_row = jnp.zeros((M,), jnp.uint8)
                    gmap = patchify_op(fmap, coords, P // 2, mode="bilinear")
                    img_nchw = image_f32.transpose(0, 3, 1, 2)
                    clr = patchify_op(img_nchw, 4 * (coords + 0.5), 0, mode="bilinear")[..., 0, 0]
                    if depth_head is not None:
                        # dense monocular depth -> inverse-depth grid at
                        # (hf, wf), sampled into the patch grid like the
                        # reference (net_cdv.py:242-260, 363-368)
                        if depth_is_dpt:
                            dm = depth_head.apply(
                                depth_params, tap_pairs)[..., 0]
                        else:
                            # linear head over the RAW last-layer tokens
                            # + cls (net_cdv.py:244-251)
                            tok = jnp.concatenate(
                                [trw[0].astype(jnp.float32),
                                 jnp.broadcast_to(cls.astype(jnp.float32),
                                                  (hi * wi, 384))], axis=-1)
                            dm = depth_head.apply(
                                depth_params, tok)[:, 0].reshape(1, hi, wi)
                        dm = jnp.clip(dm / scale_factor, 1e-3, None)
                        disps = jax.image.resize(
                            1.0 / dm, (nb, hf, wf), method="bilinear"
                        ).astype(jnp.float32)
                    else:
                        disps = jnp.ones((nb, hf, wf), jnp.float32)
                    grid = coords_grid_with_index(disps[None])[0]
                    patch_row = patchify_op(grid, coords, P // 2, mode="bilinear")[0]
                else:
                    fmap, imap = model.apply(params, image, method=VONet.features)
                    nb, _, hf, wf = fmap.shape
                    if strategy == "GRADIENT_BIAS":
                        coords = select_gradient_bias(key, image[None], M, hf, wf)
                    else:
                        coords = select_random(key, nb, M, hf, wf)
                    disps = jnp.ones((nb, hf, wf), jnp.float32)
                    gmap, ictx, clr, patch_row4 = extract_patches(
                        fmap, imap, image_f32.astype(fmap.dtype), disps.astype(fmap.dtype), coords, P
                    )
                    patch_row = patch_row4[0].astype(jnp.float32)
                    clr = clr.astype(jnp.float32)
                    seg_row = jnp.zeros((M,), jnp.uint8)
                    score_row = jnp.ones((M,), jnp.float32)

                f1 = fmap[0]
                f2 = pyramidify(fmap, (4,))[0][0]

                # ---- state insert (fused) ----
                intr_buf = intr_buf.at[n].set(intr_row)

                # motion model (DAMPED_LINEAR, slam.py:652-666)
                P1 = jnp.take(poses, jnp.maximum(n - 1, 0), axis=0)
                P2 = jnp.take(poses, jnp.maximum(n - 2, 0), axis=0)
                xi = damping * fac * se3_log(se3_mul(P1, se3_inv(P2)))
                extrap = se3_mul(se3_exp(xi), P1)
                newpose = jnp.where(n > 1, extrap, jnp.where(n > 0, P1, poses[0]))
                poses = poses.at[n].set(newpose)

                # depth init (slam.py:668-676); with a depth head the
                # head-provided inverse depths are kept as-is
                i0 = jnp.maximum(n - 3, 0)
                idx3 = jnp.minimum(i0 + jnp.arange(3), jnp.maximum(n - 1, 0))
                pflat = patches_buf.reshape(N, M, 3, P, P)
                dmed = jnp.median(jnp.take(pflat, idx3, axis=0, mode="clip")[:, :, 2])
                key2 = jax.random.fold_in(key, 1)
                drand = jnp.broadcast_to(jax.random.uniform(key2, (M, 1, 1)), (M, P, P))
                d0 = jnp.where(initialized, jnp.broadcast_to(dmed, (M, P, P)), drand)
                patch_row = patch_row.astype(jnp.float32)
                if depth_head is None:
                    patch_row = patch_row.at[:, 2].set(d0)
                patches_buf = jax.lax.dynamic_update_slice(
                    patches_buf, patch_row, (n * M, 0, 0, 0))

                # ring buffers (slots are host-allocated: see
                # _alloc_frame_slots / the fslot_rows indirection tables)
                slot_p = pslot * M
                imap_buf = jax.lax.dynamic_update_slice(imap_buf, ictx[0], (slot_p, 0))
                gmap_buf = jax.lax.dynamic_update_slice(gmap_buf, gmap[0], (slot_p, 0, 0, 0))
                # frame pyramids live pre-padded in the corr kernel
                # layout (slot, Hp, C, 2*Wc): rows OUTER (dynamic row
                # bands need no alignment), channels on the sublane
                # axis, and two x copies concatenated on the lane axis
                # with image origins at D and Wc+D+64 (every 64-aligned
                # window origin is 128-aligned in one of them)
                def _wr(buf, f):
                    # ONE full-slot write via pad_fmap (the kernel-layout
                    # padder): a single dynamic_update_slice per buffer
                    # instead of two partial-row writes, so at most one
                    # whole-buffer materialization per insert if XLA
                    # declines to update in place
                    from ..ops.corr_pallas import pad_fmap
                    slot = pad_fmap(f[None]).astype(buf.dtype)  # (1,Hp,C,2Wc)
                    return jax.lax.dynamic_update_slice(
                        buf, slot, (fslot, 0, 0, 0))
                if "no_fmapwrites" not in _abl:
                    # knockout: skip the pyramid pad + slot DUS entirely
                    # (the buffers pass through untouched; the pyramid
                    # pad is DCE'd with its only consumer)
                    f1buf = _wr(f1buf, f1)
                    f2buf = _wr(f2buf, f2)
                colors_buf = colors_buf.at[n].set(clr[0].astype(colors_buf.dtype))
                seg_buf = seg_buf.at[n].set(seg_row)
                scale_buf = scale_buf.at[n].set(
                    jnp.mean(patch_row[:, 2, P // 2, P // 2]))
                score_buf = jax.lax.dynamic_update_slice(
                    score_buf, score_row.astype(score_buf.dtype), (n * M,))

                return (poses, patches_buf, intr_buf, imap_buf, gmap_buf,
                        f1buf, f2buf, colors_buf, seg_buf, scale_buf,
                        score_buf)

            self._frame_body = frame_fn
            self._frame_fn = jax.jit(
                frame_fn, donate_argnums=(3, 4, 5, 6, 7, 8, 9, 10))

        fs, ps = self._alloc_frame_slots(pg.n)
        out = self._frame_fn(
            self.cparams, image_u8, key, pg.poses_, pg.patches_, pg.intrinsics_,
            pg.imap_, pg.gmap_, pg.fmap1_, pg.fmap2_, pg.colors_dev,
            pg.seg_dev, pg.scale_, pg.score_dev, pg.n, fac,
            initialized, intr_row, fs, ps,
        )
        (pg.poses_, pg.patches_, pg.intrinsics_, pg.imap_, pg.gmap_,
         pg.fmap1_, pg.fmap2_, pg.colors_dev, pg.seg_dev, pg.scale_,
         pg.score_dev) = out

    # ------------------------------------------------------------------
    def _build_fused(self):
        """Frame insert + update in ONE jitted program: in steady state the
        per-frame work is exactly one device dispatch (each dispatch costs
        ~8 ms of transport on the remote-device link, so merging the two
        hot programs buys that back every frame)."""
        frame_body = self._frame_body
        model = self.model

        M_, pmem_, mem_ = self.M, self.pmem, self.mem
        import os as _os
        _abl = set(filter(None, _os.environ.get("FUSE_ABL", "").split(",")))

        @partial(
            jax.jit,
            static_argnames=("NW", "KWIN", "EPAD", "GROUP_M", "iterations",
                             "is_cdv", "HW1", "HW2", "shift_span", "LAT_L"),
            donate_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 17, 18, 19),
        )
        def fused_fn(params, image_u8, seed, poses, patches_buf, intr_buf,
                     imap_buf, gmap_buf, f1buf, f2buf, colors_buf, seg_buf,
                     scale_buf, score_buf, n, fac, intr_row,
                     net_full, target_full, weight_full, weight_mul, packed,
                     t0, k0, net_valid, ht4, wd4, mm_i, mm_j,
                     shift_k, shift_np, fslot, pslot, *,
                     NW, KWIN, EPAD, GROUP_M, iterations, is_cdv,
                     HW1, HW2, shift_span=0, LAT_L=0):
            # deferred keyframe removal rides this dispatch; shift_span is
            # STATIC (the host knows the removal span at dispatch time),
            # so the shift is SPAN fixed-shape slice copies -- a
            # whole-buffer jnp.take over the 393k patch rows measured
            # ~38 ms/frame on this chip (round-3 ablation)
            if "force_shiftg" in _abl:
                (poses, patches_buf, intr_buf, imap_buf, gmap_buf, f1buf,
                 f2buf, colors_buf, seg_buf, scale_buf, score_buf,
                 dP) = shift_gather(
                    poses, patches_buf, intr_buf, imap_buf, gmap_buf, f1buf,
                    f2buf, colors_buf, seg_buf, scale_buf, score_buf,
                    shift_k, shift_np, M=M_, pmem=pmem_, mem=mem_)
            elif "no_shiftg" in _abl or shift_span <= 0:
                dP = (jnp.asarray([0., 0., 0., 0., 0., 0., 1.], poses.dtype)
                      + 0.0 * poses[0, 0])
            else:
                (poses, patches_buf, intr_buf, imap_buf, gmap_buf, f1buf,
                 f2buf, colors_buf, seg_buf, scale_buf, score_buf,
                 dP) = shift_span_body(
                    poses, patches_buf, intr_buf, imap_buf, gmap_buf, f1buf,
                    f2buf, colors_buf, seg_buf, scale_buf, score_buf,
                    shift_k, shift_np, SPAN=shift_span, M=M_,
                    pmem=pmem_, mem=mem_)
            if "no_frame" not in _abl:
                (poses, patches_buf, intr_buf, imap_buf, gmap_buf, f1buf, f2buf,
                 colors_buf, seg_buf, scale_buf, score_buf) = frame_body(
                    params, image_u8, seed, poses, patches_buf, intr_buf,
                    imap_buf, gmap_buf, f1buf, f2buf, colors_buf, seg_buf,
                    scale_buf, score_buf, n, fac, True, intr_row,
                    fslot, pslot)
            if "no_updatebody" in _abl:
                mm = jnp.zeros((2,), jnp.float32) + 0.0 * poses[0, 0].astype(jnp.float32)
                return (poses, patches_buf, intr_buf, imap_buf, gmap_buf, f1buf,
                        f2buf, colors_buf, seg_buf, scale_buf, score_buf,
                        net_full, target_full, weight_full, mm, dP)
            # steady-state local BA uses the per-patch lattice assembly
            # (gathers + short ordered sums; no (K, 2E) one-hot HBM
            # traffic); init/termination/global solves go through
            # update_step and stay on 'scatter' (see ba_solve)
            (poses, patches_buf, net_full, target_full, weight_full, _dn,
             mm) = update_body(
                params, model, poses, patches_buf, intr_buf, imap_buf,
                gmap_buf, f1buf, f2buf, net_full, target_full, weight_full,
                weight_mul, score_buf, packed, t0, k0, net_valid, ht4, wd4,
                mm_i, mm_j,
                NW=NW, KWIN=KWIN, EPAD=EPAD, GROUP_M=GROUP_M,
                iterations=iterations, is_cdv=is_cdv, HW1=HW1, HW2=HW2,
                # default 'onehot': measured 2.6 ms faster in-program than
                # 'lattice' on the chip (round-5 sweep) -- the depth-side
                # lattice gather/where chains pay more serial latency than
                # the (K,2E) one-hot matmuls cost in HBM; the pose side
                # stays grouped (perm) either way
                ba_assembly=_os.environ.get("BA_ASSEMBLY", "onehot"),
                LAT_L=LAT_L)
            return (poses, patches_buf, intr_buf, imap_buf, gmap_buf, f1buf,
                    f2buf, colors_buf, seg_buf, scale_buf, score_buf,
                    net_full, target_full, weight_full, mm, dP)

        return fused_fn

    def _fused_frame_update(self, image_u8, seed, fac, intr_row):
        """Steady-state per-frame path: insert the frame AND run the update
        in one dispatch. Assumes edges for the new frame are already
        appended (host-side index bookkeeping only)."""
        pg = self.pg
        cfg = self.cfg
        self.stats["updates"] += 1
        if self._frame_body is None:
            # builds self._frame_body as a side effect (scratch dispatch is
            # never needed: pre-init frames always go through
            # _process_frame first, so the body already exists by the time
            # the SLAM is initialized; this is a safety net)
            raise RuntimeError("frame body not built; call _process_frame first")
        if self._fused_fn is None:
            self._fused_fn = self._build_fused()

        with Timer("prep", enabled=self.enable_timing):
            E = pg.E
            E_pad = pg.bucket(E)
            pg._grow(E_pad)
            k0, KWIN, packed, lat_l = self._prepare_update(
                pg.ii, pg.jj, pg.kk, E_pad)
        t0 = max(pg.n - cfg.OPTIMIZATION_WINDOW, 1)

        long_range = bool((pg.ii < pg.n - cfg.REMOVAL_WINDOW - 1).any()) \
            and not self.ran_global_ba[pg.n]
        ba_iters = 0 if long_range else 2

        if cfg.FILTER_DYNAMIC_CLASS and self.filt_index is not None:
            from .kernels import dynamic_class_weight
            weight_mul = dynamic_class_weight(
                pg.seg_dev, jnp.asarray(self.filt_index),
                jnp.asarray(np.concatenate(
                    [pg.kk, np.zeros(E_pad - E, np.int64)]), jnp.int32),
            )
        else:
            weight_mul = self._ones_cache.get(E_pad)
            if weight_mul is None:
                weight_mul = jnp.ones((E_pad, 2), jnp.float32)
                self._ones_cache[E_pad] = weight_mul

        mi = pg.n - cfg.KEYFRAME_INDEX - 1
        mj = pg.n - cfg.KEYFRAME_INDEX + 1
        n_row = pg.n - 1   # row the new frame lands in (pg.n already bumped)

        pend = getattr(self, "_pending_shift", None)
        shift_k, shift_np = pend if pend is not None else (-1, 0)
        shift_span = shift_np - 1 - shift_k if pend is not None else 0
        if pend is not None and not (1 <= shift_span <= cfg.KEYFRAME_INDEX + 2):
            # out-of-band span: apply eagerly outside the fused program
            # (generic gather path); the fused dispatch then has no shift
            self._apply_pending_shift()
            shift_k, shift_np, shift_span = -1, 0, 0
        else:
            self._pending_shift = None
        fs, ps = self._alloc_frame_slots(n_row)
        with Timer("dispatch", enabled=self.enable_timing):
            (pg.poses_, pg.patches_, pg.intrinsics_, pg.imap_, pg.gmap_,
             pg.fmap1_, pg.fmap2_, pg.colors_dev, pg.seg_dev, pg.scale_,
             pg.score_dev, pg.net, pg.target, pg.weight, mm,
             dP) = self._fused_fn(
                self.cparams, image_u8, seed, pg.poses_, pg.patches_,
                pg.intrinsics_, pg.imap_, pg.gmap_, pg.fmap1_, pg.fmap2_,
                pg.colors_dev, pg.seg_dev, pg.scale_, pg.score_dev, n_row, fac,
                intr_row,
                pg.net, pg.target, pg.weight, weight_mul, packed,
                t0, k0, pg.net_valid, float(self.ht4), float(self.wd4), mi, mj,
                shift_k, shift_np, fs, ps,
                NW=self.NW, KWIN=KWIN, EPAD=E_pad,
                GROUP_M=self.M if self.is_cdv else 0,
                iterations=ba_iters, is_cdv=self.is_cdv,
                HW1=self._hw1, HW2=self._hw2,
                shift_span=shift_span, LAT_L=lat_l,
            )
        pd = getattr(self, "_pending_delta", None)
        if pd is not None:
            t1d, t0d = pd
            pg.delta[t1d] = (t0d, dP)
            self._pending_delta = None
        try:
            mm.copy_to_host_async()
        except Exception:
            pass
        self._mm_cache = (mi, mj, mm)
        # queue the keyframe decision for the frame tested by (mi, mj),
        # keyed by its physical frame id (rows shift under later removals)
        if pg.n - cfg.KEYFRAME_INDEX >= 1:
            self._kf_queue.append(
                (int(pg.tstamps_[pg.n - cfg.KEYFRAME_INDEX]), mm))
        pg.net_valid = E

        if long_range:
            self._run_global_ba()
        elif self.depth_params is not None:
            from .kernels import scale_adjustment
            pg.poses_, pg.patches_ = scale_adjustment(
                pg.poses_, pg.patches_, pg.scale_, t0, pg.n, 0.2,
                M=self.M, P=self.P,
            )

    # ------------------------------------------------------------------
    def preprocess(self, image):
        """uint8 (H, W, 3) -> (1, H, W, 3) float (reference slam.py:370-378)."""
        img = jnp.asarray(image, jnp.float32)
        if getattr(self.model, "simple_preprocess", False):
            return (img / 255.0)[None]
        return (2.0 * (img / 255.0) - 0.5)[None]

    # ------------------------------------------------------------------
    # edge construction (reference slam.py:528-541)
    # ------------------------------------------------------------------
    def _edges_forw(self):
        r = self.cfg.PATCH_LIFETIME
        n, M = self.pg.n, self.M
        t0 = M * max(n - r, 0)
        t1 = M * max(n - 1, 0)
        kk = np.arange(t0, t1)
        jj = np.full(len(kk), n - 1)
        return kk, jj

    def _edges_back(self):
        r = self.cfg.PATCH_LIFETIME
        n, M = self.pg.n, self.M
        t0 = M * max(n - 1, 0)
        t1 = M * n
        kk, jj = np.meshgrid(np.arange(t0, t1), np.arange(max(n - r, 0), n), indexing="ij")
        return kk.reshape(-1), jj.reshape(-1)

    def append_factors(self, kk, jj):
        ii = kk // self.M
        self.pg.append_edges(ii, jj, kk)

    # ------------------------------------------------------------------
    # the fused update (reference slam.py:480-526)
    # ------------------------------------------------------------------
    def _kwin_for_span(self, span_frames):
        """Patch-window capacity: default for local tracking, power-of-two
        frame buckets when loop-closure edges widen the span."""
        base = self.cfg.REMOVAL_WINDOW + 6
        if span_frames <= base:
            return self.KWIN
        b = 64
        while b < span_frames + 2:
            b *= 2
        return b * self.M

    def _prepare_update(self, ii, jj, kk, E_pad):
        """Host-side index prep: everything packs into ONE (12, E_pad)
        int32 upload (each separate host->device transfer costs a
        transport round trip).

        Steady-state frames have IDENTICAL relative edge structure (the
        forward/backward edge pattern just slides by one frame), and the
        driving host has a single CPU core -- so the sort/unique-heavy
        parts (neighbors, groups, perm, corr order) are cached keyed by
        the shift-invariant relative index arrays, and only the
        absolute/modular rows are rebuilt per frame."""
        pg = self.pg
        M = self.M
        k0 = int(kk.min() // M) * M if len(kk) else 0
        k0 = min(k0, self.N * self.M - self.KWIN)
        span = int(kk.max()) - k0 + 1 if len(kk) else 1
        KWIN = self._kwin_for_span((span + M - 1) // M)
        assert int(kk.max()) - k0 < KWIN, "patch window overflow"
        E = len(ii)
        pad = E_pad - E

        def padi(a, fill=0):
            a = np.asarray(a, np.int64)
            return np.concatenate([a, np.full(pad, fill, np.int64)]) if pad else a

        key = None
        if E:
            rel = np.stack([np.asarray(ii) - int(ii[0]),
                            np.asarray(jj) - int(jj[0]),
                            np.asarray(kk) - int(kk[0])])
            # jj[0] % mem pins the ring-buffer wrap phase: the cached corr
            # plan (rows 13/14) sorts by jj % mem, which is NOT invariant
            # under a uniform frame shift -- the cache keeps one entry per
            # phase (the steady state cycles through all `mem` phases)
            key = (E_pad, KWIN, int(kk.min()) - k0, int(jj[0]) % self.mem,
                   rel.tobytes())
        # row -> physical feature slot (indirection tables; see
        # _alloc_frame_slots): ctx/gmap rows and corr frame ids
        ctx_rows = (self.pslot_rows[np.asarray(kk, np.int64) // M].astype(np.int64) * M
                    + np.asarray(kk, np.int64) % M) if E else np.zeros(0, np.int64)
        jjm_rows = self.fslot_rows[np.asarray(jj, np.int64)].astype(np.int64) \
            if E else np.zeros(0, np.int64)
        cached = self._prep_cache.get(key) if key is not None else None
        if cached is not None and getattr(pg, "_pending_gather", None) is None:
            # NOTE: cached rows 13/14 (host corr order) were sorted under
            # the slot assignment at cache-fill time; after removals the
            # slot tables can diverge from it. Harmless: the runtime
            # always passes HW1, so update_body rebuilds the plan on
            # device from the live coords (rows 13-15 are only consumed
            # by the no-HW1 / non-TPU fallback, which ignores plans)
            packed, lat_l = cached                  # i16 (i32 fallback); variant rows
            packed = packed.copy()
            EP2 = packed.shape[1]                   # are bounded << 2^15
            packed[0, :E_pad] = padi(ii)
            packed[1, :E_pad] = padi(jj)
            packed[3, :E_pad] = padi(ctx_rows)
            jjm_pad = padi(jjm_rows)
            packed[4, :E_pad] = jjm_pad
            # per-sub-tile corr frame ids from the cached order
            from ..ops.corr_pallas import SUBTE
            order = packed[13].astype(np.int64)
            jjm_ext = np.concatenate([jjm_pad, [-1]])
            packed[15, : EP2 // SUBTE] = np.maximum(
                jjm_ext[np.minimum(order, E_pad)].reshape(-1, SUBTE).max(1), 0)
            packed[15, EP2 // SUBTE:] = 0
            return k0, KWIN, jax.device_put(packed.reshape(-1)), lat_l

        aux = build_update_aux(
            ii, jj, kk, k0, KWIN,
            M=M if self.is_cdv else None,
            n_gseg=E_pad, E_pad=E_pad, as_numpy=True,
        )
        # host-computed corr edge-order plan (rows 13-15): saves the
        # device-side argsort/scatter in every corr call
        from ..ops.corr_pallas import corr_epad, plan_corr_order
        EP2 = corr_epad(E_pad, self.mem)
        jjm_pad = np.concatenate(
            [jjm_rows, np.zeros(pad, np.int64)]) if pad else jjm_rows
        order, jj_steps, inv = plan_corr_order(jjm_pad, self.mem, EP2)
        # row 12: survivor gather for a deferred edge compaction (identity
        # when none is pending) -- applied to the net hidden state inside
        # the update program itself, saving a separate compaction dispatch
        gather = np.arange(E_pad, dtype=np.int64)
        pend = getattr(pg, "_pending_gather", None)
        if pend is not None:
            keep, nkeep = pend
            gather[:] = 0
            gather[:nkeep] = keep
            pg._pending_gather = None

        rows13 = np.stack([
            padi(ii), padi(jj), padi(kk - k0),
            padi(ctx_rows), padi(jjm_rows),
            np.asarray(aux.ix), np.asarray(aux.jx),
            np.asarray(aux.kseg), np.asarray(aux.gseg),
            _pad_to(np.asarray(aux.perm).reshape(-1) if aux.perm is not None
                    else np.zeros(0, np.int64), E_pad),
            _pad_to(np.asarray(aux.inv_perm) if aux.inv_perm is not None
                    else np.zeros(0, np.int64), E_pad),
            np.asarray(aux.mask).astype(np.int64),
            gather,
        ])
        # rows 16+: per-patch edge lattice for the BA 'lattice' assembly
        # (fixed-shape gathers replace (K, 2E) one-hot matmuls, ~5 GB of
        # HBM traffic per steady-state solve); sentinel = E_pad
        from ..ba.ba import build_edge_lattice
        lat = build_edge_lattice(
            np.asarray(kk, np.int64) - k0, np.ones(E, bool), KWIN, E_pad)
        lat_l = lat.shape[1]
        nlr = -(-(KWIN * lat_l) // EP2)
        lat_flat = np.full(nlr * EP2, E_pad, np.int64)
        lat_flat[: KWIN * lat_l] = lat.reshape(-1)

        packed = np.zeros((16 + nlr, EP2), np.int64)
        packed[:13, :E_pad] = rows13
        packed[13] = order
        packed[14, :E_pad] = inv
        packed[15, : jj_steps.shape[0]] = jj_steps
        packed[16:] = lat_flat.reshape(nlr, EP2)
        # FLAT int16 upload: the remote transport pays a large layout /
        # size penalty on multi-dim payloads. Steady-state values all fit
        # i16, but edge-hoarding configurations (no keyframe removal and a
        # REMOVAL_WINDOW longer than the run) can push E_pad -- and with
        # it the lattice sentinel -- past 2^15; fall back to an i32 upload
        # there (a different traced program variant, not an error)
        if packed.max() < 32767 and packed.min() >= -32768:
            up_dtype = np.int16
        else:
            up_dtype = np.int32
        if key is not None and pend is None:
            if len(self._prep_cache) > 4 * self.mem:
                self._prep_cache.pop(next(iter(self._prep_cache)))
            self._prep_cache[key] = (packed.astype(up_dtype), lat_l)
        # device_put keeps the host->device copy asynchronous so it
        # overlaps the previous frame's device work
        return (k0, KWIN, jax.device_put(packed.astype(up_dtype).reshape(-1)),
                lat_l)

    def _packed_rows16(self, packed, E_pad):
        """Host view of the first 16 rows of a flat packed upload (the
        index rows; lattice rows 16+ are device-only)."""
        from ..ops.corr_pallas import corr_epad
        EP2 = corr_epad(E_pad, self.mem)
        return np.asarray(packed).reshape(-1, EP2)[:16, :E_pad].astype(np.int64)

    def _patch_window(self, k0, KWIN=None):
        KWIN = KWIN or self.KWIN
        k0 = min(k0, self.N * self.M - KWIN)
        return jax.lax.dynamic_slice(
            self.pg.patches_, (k0, 0, 0, 0),
            (KWIN, 3, self.P, self.P),
        ), k0

    def update(self):
        pg = self.pg
        E = pg.E
        if E == 0:
            return
        self.stats["updates"] += 1
        E_pad = pg.bucket(E)
        pg._grow(E_pad)
        k0, KWIN, packed, lat_l = self._prepare_update(
            pg.ii, pg.jj, pg.kk, E_pad)
        t0 = max(pg.n - self.cfg.OPTIMIZATION_WINDOW, 1) if self.is_initialized else 1

        # long-range (loop closure) edges present -> global BA this round
        long_range = bool((pg.ii < pg.n - self.cfg.REMOVAL_WINDOW - 1).any()) \
            and not self.ran_global_ba[pg.n]
        ba_iters = 0 if long_range else 2

        if self.cfg.FILTER_DYNAMIC_CLASS and self.filt_index is not None:
            # dynamic-class down-weighting (reference slam.py:585-594),
            # computed on device from the seg buffer
            from .kernels import dynamic_class_weight
            weight_mul = dynamic_class_weight(
                pg.seg_dev, jnp.asarray(self.filt_index),
                jnp.asarray(np.concatenate(
                    [pg.kk, np.zeros(E_pad - E, np.int64)]), jnp.int32),
            )
        else:
            weight_mul = self._ones_cache.get(E_pad)
            if weight_mul is None:
                weight_mul = jnp.ones((E_pad, 2), jnp.float32)
                self._ones_cache[E_pad] = weight_mul

        mi = pg.n - self.cfg.KEYFRAME_INDEX - 1
        mj = pg.n - self.cfg.KEYFRAME_INDEX + 1
        if self.update_override is not None:
            from ..models.update import UpdateAux
            pk = self._packed_rows16(packed, E_pad)
            aux = UpdateAux(
                ix=jnp.asarray(pk[5]), jx=jnp.asarray(pk[6]),
                kseg=jnp.asarray(pk[7]), gseg=jnp.asarray(pk[8]),
                perm=jnp.asarray(pk[9].reshape(-1, self.M)) if self.is_cdv else None,
                inv_perm=jnp.asarray(pk[10]), mask=jnp.asarray(pk[11].astype(bool)),
            )
            ii_p, jj_p, kkl = [jnp.asarray(pk[i]) for i in (0, 1, 2)]
            patches_win, _ = self._patch_window(k0, KWIN)
            net = jax.lax.dynamic_slice(pg.net, (0, 0), (E_pad, self.DIM))
            net = jnp.where((jnp.arange(E_pad) < pg.net_valid)[:, None], net, 0.0)
            poses, patches_win2, net_new, target, weight, _ = self._override_update(
                patches_win, net, ii_p, jj_p, kkl, aux, t0, k0, KWIN, ba_iters
            )
            self._mm_cache = None
            pg.poses_ = poses
            pg.patches_ = jax.lax.dynamic_update_slice(
                pg.patches_, patches_win2, (k0, 0, 0, 0)
            )
            pg.net = jax.lax.dynamic_update_slice(pg.net, net_new, (0, 0))
            pg.target = jax.lax.dynamic_update_slice(pg.target, target, (0, 0))
            pg.weight = jax.lax.dynamic_update_slice(pg.weight, weight, (0, 0))
        else:
            (pg.poses_, pg.patches_, pg.net, pg.target, pg.weight,
             _, mm) = update_step(
                self.cparams, self.model, pg.poses_, pg.patches_, pg.intrinsics_,
                pg.imap_, pg.gmap_, pg.fmap1_, pg.fmap2_,
                pg.net, pg.target, pg.weight,
                weight_mul, pg.score_dev, packed,
                t0, k0, pg.net_valid, float(self.ht4), float(self.wd4), mi, mj,
                NW=self.NW, KWIN=KWIN, EPAD=E_pad,
                GROUP_M=self.M if self.is_cdv else 0,
                iterations=ba_iters, is_cdv=self.is_cdv,
                HW1=self._hw1, HW2=self._hw2,
            )
            try:
                mm.copy_to_host_async()
            except Exception:
                pass
            self._mm_cache = (mi, mj, mm)
        pg.net_valid = E

        if long_range:
            self._run_global_ba()
        elif self.depth_params is not None and self.is_initialized:
            from .kernels import scale_adjustment
            pg.poses_, pg.patches_ = scale_adjustment(
                pg.poses_, pg.patches_, pg.scale_, t0, pg.n, 0.2,
                M=self.M, P=self.P,
            )

    def _override_update(self, patches_win, net, ii_p, jj_p, kkl, aux, t0, k0,
                         KWIN=None, ba_iters=2):
        """Oracle-update path for runtime validation without trained weights."""
        pg = self.pg
        KWIN = KWIN or self.KWIN
        coords = transform(
            SE3(pg.poses_[None]), patches_win[None], pg.intrinsics_[None],
            ii_p, jj_p, kkl,
        )
        center = coords[0, :, self.P // 2, self.P // 2, :]
        delta, weight = self.update_override(
            np.asarray(ii_p), np.asarray(jj_p), np.asarray(kkl) + k0, np.asarray(center)
        )
        target = jnp.asarray(center) + jnp.asarray(delta, jnp.float32)
        weight = jnp.asarray(weight, jnp.float32)
        if getattr(self, "ba_override", None) is not None:
            # test hook: swap the BA solver (e.g. the numpy transcription
            # of the reference CUDA BA) while keeping every other piece of
            # the runtime -- used to prove drift profiles are windowing
            # policy, not solver numerics
            poses, patches_win2 = self.ba_override(
                pg.poses_, patches_win, pg.intrinsics_[0], target, weight,
                ii_p, jj_p, kkl, np.asarray(aux.mask), t0,
                self.NW, ba_iters)
            poses = jnp.asarray(np.asarray(poses, np.float32))
            patches_win2 = jnp.asarray(np.asarray(patches_win2, np.float32))
        else:
            poses, patches_win2 = ba_solve(
                pg.poses_, patches_win, pg.intrinsics_[0], target, weight,
                ii_p, jj_p, kkl, aux.mask, t0,
                N=self.NW, K=KWIN, iterations=ba_iters,
            )
        return poses, patches_win2, net, target, weight, None

    # ------------------------------------------------------------------
    # global bundle adjustment + normalization (reference slam.py:460-478)
    # ------------------------------------------------------------------
    def normalize(self):
        """Rescale mean disparity to 1 and fix the gauge to pose 0
        (reference patchgraph.py:99-119)."""
        pg = self.pg
        n, M = pg.n, self.M
        if n == 0:
            return
        d = pg.patches_[: n * M, 2]
        s = float(jnp.mean(d))
        if not np.isfinite(s) or s <= 0:
            return
        pg.patches_ = pg.patches_.at[: n * M, 2].divide(s)
        pg.poses_ = pg.poses_.at[:n, :3].multiply(s)
        for tkey, (tt0, dP) in list(pg.delta.items()):
            dP = np.asarray(dP).astype(np.float32).copy()
            dP[:3] *= s
            pg.delta[tkey] = (tt0, dP)
        from ..lie import se3_inv as _inv, se3_mul as _mul
        g0_inv = _inv(pg.poses_[0])
        pg.poses_ = pg.poses_.at[:n].set(_mul(pg.poses_[:n], g0_inv[None]))

    def _run_global_ba(self):
        """Global BA over active + inactive edges with the block-sparse
        pose-depth coupling (reference slam.py:460-478, eff_impl)."""
        from ..ba.global_ba import build_global_indices, global_ba_solve

        self.stats["global_ba"] += 1
        pg = self.pg
        n, M = pg.n, self.M
        full_ii = np.concatenate([pg.ii_inac, pg.ii])
        full_jj = np.concatenate([pg.jj_inac, pg.jj])
        full_kk = np.concatenate([pg.kk_inac, pg.kk])
        tgt_act = np.asarray(pg.target[: pg.E])
        wgt_act = np.asarray(pg.weight[: pg.E])
        full_t = np.concatenate([pg.target_inac, tgt_act]).astype(np.float32)
        full_w = np.concatenate([pg.weight_inac, wgt_act]).astype(np.float32)

        self.normalize()

        t0 = int(pg.ii.min()) if pg.E else 1
        span = n - t0
        Nb = next((b for b in self.cfg.GLOBAL_POSE_BUCKETS if span <= b),
                  self.cfg.GLOBAL_POSE_BUCKETS[-1])
        Kf = next((b for b in self.cfg.GLOBAL_POSE_BUCKETS if n <= b),
                  self.cfg.GLOBAL_POSE_BUCKETS[-1])
        Kb = min(Kf * M, self.N * M)

        idx = build_global_indices(full_ii, full_jj, full_kk, M)
        E_pad = idx["E_pad"]
        tgt_p = np.zeros((E_pad, 2), np.float32)
        tgt_p[: len(full_t)] = full_t
        wgt_p = np.zeros((E_pad, 2), np.float32)
        wgt_p[: len(full_w)] = full_w

        patches_k = jax.lax.dynamic_slice(
            pg.patches_, (0, 0, 0, 0), (Kb, 3, self.P, self.P)
        )
        poses, patches_k = global_ba_solve(
            pg.poses_, patches_k, pg.intrinsics_[0],
            jnp.asarray(tgt_p), jnp.asarray(wgt_p),
            jnp.asarray(idx["ii"], jnp.int32), jnp.asarray(idx["jj"], jnp.int32),
            jnp.asarray(idx["kk"], jnp.int32), jnp.asarray(idx["mask"]),
            jnp.asarray(idx["entry_x"], jnp.int32), jnp.asarray(idx["entry_s"], jnp.int32),
            jnp.asarray(idx["slot"], jnp.int32),
            jnp.asarray(idx["g_i"], jnp.int32), jnp.asarray(idx["g_j"], jnp.int32),
            jnp.asarray(idx["g_mask"]),
            jnp.asarray(idx["combo_g1"], jnp.int32), jnp.asarray(idx["combo_g2"], jnp.int32),
            jnp.asarray(idx["combo_mask"]),
            t0, N=Nb, K=Kb, M=M, G=idx["G_pad"], C=idx["C_pad"], iterations=2,
        )
        pg.poses_ = poses
        pg.patches_ = jax.lax.dynamic_update_slice(pg.patches_, patches_k, (0, 0, 0, 0))
        self.ran_global_ba[n] = True

    # ------------------------------------------------------------------
    # motion probe (reference slam.py:380-397)
    # ------------------------------------------------------------------
    def motion_probe(self):
        pg = self.pg
        n, M = pg.n, self.M
        kk = np.arange(pg.m - M, pg.m)
        jj = np.full(M, n)
        ii = kk // M
        E_pad = pg.bucket(M)
        k0, KWIN, packed, lat_l = self._prepare_update(ii, jj, kk, E_pad)

        if self.update_override is not None:
            pk = self._packed_rows16(packed, E_pad)
            ii_p, jj_p, kkl = [jnp.asarray(pk[i]) for i in (0, 1, 2)]
            patches_win, k0 = self._patch_window(k0, KWIN)
            coords = transform(
                SE3(pg.poses_[None]), patches_win[None], pg.intrinsics_[None],
                ii_p, jj_p, kkl,
            )
            center = coords[0, :, 1, 1, :]
            delta, _ = self.update_override(
                np.asarray(ii_p), np.asarray(jj_p), np.asarray(kkl) + k0, np.asarray(center)
            )
            dn = np.linalg.norm(np.asarray(delta), axis=-1)[:M]
            return float(np.median(dn))

        # probe runs the fused update with zero BA iterations on scratch
        # per-edge buffers (fresh hidden state, nothing written back)
        net = jnp.zeros((E_pad, self.DIM), pg.net.dtype)
        tgt = jnp.zeros((E_pad, 2), jnp.float32)
        wgt = jnp.zeros((E_pad, 2), jnp.float32)
        wm = jnp.ones((E_pad, 2), jnp.float32)
        poses, patches, *_rest, delta_norm, _ = update_step(
            self.cparams, self.model, pg.poses_, pg.patches_, pg.intrinsics_,
            pg.imap_, pg.gmap_, pg.fmap1_, pg.fmap2_,
            net, tgt, wgt,
            wm, pg.score_dev, packed,
            1, k0, E_pad, float(self.ht4), float(self.wd4), -1, -1,
            NW=self.NW, KWIN=KWIN, EPAD=E_pad,
            GROUP_M=self.M if self.is_cdv else 0,
            iterations=0, is_cdv=self.is_cdv,
            HW1=self._hw1, HW2=self._hw2,
        )
        # donated inputs: re-adopt the (unchanged) returned buffers
        pg.poses_ = poses
        pg.patches_ = patches
        return float(jnp.quantile(delta_norm[:M], 0.5))

    # ------------------------------------------------------------------
    # keyframing (reference slam.py:408-458)
    # ------------------------------------------------------------------
    def motionmag(self, i, j):
        pg = self.pg
        sel = (pg.ii == i) & (pg.jj == j)
        if not sel.any():
            return 0.0
        ii, jj, kk = pg.ii[sel], pg.jj[sel], pg.kk[sel]
        E_pad = pg.bucket(len(ii))
        k0, KWIN, packed, _lat_l = self._prepare_update(ii, jj, kk, E_pad)
        pk = self._packed_rows16(packed, E_pad)
        patches_win, k0 = self._patch_window(k0, KWIN)
        m = motionmag(pg.poses_, patches_win, pg.intrinsics_,
                      jnp.asarray(pk[0]), jnp.asarray(pk[1]), jnp.asarray(pk[2]),
                      jnp.asarray(pk[11].astype(bool)))
        return float(m)

    def keyframe(self, staging=False):
        """Synchronous keyframe decision (reference slam.py:408-458): used
        on the pre-init/override path and at termination. The fused
        steady-state path instead queues the decision two frames deep
        (see _call_fused) so the motion-magnitude pull never stalls."""
        cfg = self.cfg
        pg = self.pg
        i = pg.n - cfg.KEYFRAME_INDEX - 1
        j = pg.n - cfg.KEYFRAME_INDEX + 1
        mm = getattr(self, "_mm_cache", None)
        if mm is not None and mm[0] == i and mm[1] == j:
            m = float(np.asarray(mm[2]).sum())
        else:
            m = self.motionmag(i, j) + self.motionmag(j, i)

        k = pg.n - cfg.KEYFRAME_INDEX if m / 2 < cfg.KEYFRAME_THRESH else None
        self._kf_apply(k, staging=staging)

    def _decide_row(self, pid, mm):
        """Resolve a queued keyframe decision: physical frame id -> current
        buffer row, or None if the motion test passes / row is gone."""
        pg = self.pg
        m = float(np.asarray(mm).sum())
        if m / 2 >= self.cfg.KEYFRAME_THRESH:
            return None
        rows = np.nonzero(pg.tstamps_[: pg.n] == pid)[0]
        if len(rows) != 1 or rows[0] < 1:
            return None
        return int(rows[0])

    def _kf_apply(self, k, staging=False, defer=False, fused_shift=False):
        """Apply a keyframe-removal decision (k = row or None) plus the
        per-frame edge retirement in ONE device compaction (or, with
        ``defer``, zero extra dispatches: the compaction gather rides the
        next fused update program). With ``fused_shift`` the device
        buffer shift ALSO rides the next fused dispatch as a no-op-able
        gather (only valid when a fused update follows this frame)."""
        cfg = self.cfg
        pg = self.pg
        M = self.M
        removed = k is not None
        if removed:
            self.stats["keyframe_removals"] += 1
            t0 = pg.tstamps_[k - 1]
            t1 = pg.tstamps_[k]
            drop = (pg.ii == k) | (pg.jj == k)
            # post-removal reindexing (reference slam.py:427-429), applied
            # host-side so drop + retire compact the device state once
            kk_post = np.where(pg.ii > k, pg.kk - M, pg.kk)
            ii_post = np.where(pg.ii > k, pg.ii - 1, pg.ii)
            jj_post = np.where(pg.jj > k, pg.jj - 1, pg.jj)
            pg.kk_inac = np.where(pg.ii_inac > k, pg.kk_inac - M, pg.kk_inac)
            pg.ii_inac = np.where(pg.ii_inac > k, pg.ii_inac - 1, pg.ii_inac)
            pg.jj_inac = np.where(pg.jj_inac > k, pg.jj_inac - 1, pg.jj_inac)
            n_after = pg.n - 1
        else:
            drop = np.zeros(len(pg.ii), bool)
            ii_post, jj_post, kk_post = pg.ii, pg.jj, pg.kk
            n_after = pg.n

        # retire edges outside the optimization window
        retire = (kk_post // M) < n_after - cfg.REMOVAL_WINDOW
        if cfg.LOOP_CLOSURE:
            lc_edges = ((jj_post - ii_post) > 30) & \
                (jj_post > (n_after - cfg.OPTIMIZATION_WINDOW))
            retire = retire & ~lc_edges
        pg.remove_edges_combined(drop, retire & ~drop, ii_post, jj_post,
                                 kk_post, defer=defer)

        if removed:
            if fused_shift and not staging:
                # host-side row shifts now; device gather rides the next
                # fused dispatch, which also returns dP for the delta chain
                n = pg.n
                pg.tstamps_[k : n - 1] = pg.tstamps_[k + 1 : n]
                pg.colors_[k : n - 1] = pg.colors_[k + 1 : n]
                pg.seg_[k : n - 1] = pg.seg_[k + 1 : n]
                self.fslot_rows[k : n - 1] = self.fslot_rows[k + 1 : n]
                self.pslot_rows[k : n - 1] = self.pslot_rows[k + 1 : n]
                self._pending_shift = (k, n)
                self._pending_delta = (int(t1), int(t0))
            else:
                dP = self._shift_buffers(k, staging=staging)
                if dP is not None:
                    pg.delta[int(t1)] = (int(t0), dP)
            pg.n -= 1
            pg.m -= self.M

    def _apply_pending_shift(self):
        """Apply a deferred (fused) keyframe device-buffer shift NOW.

        ``_kf_apply(fused_shift=True)`` updates host state immediately but
        leaves the device poses_/patches_/feature shift to ride the next
        fused dispatch. Anything that reads device frame rows BEFORE that
        dispatch (edges_loop computing loop-closure candidate flow) would
        see un-shifted buffers under post-removal numbering (rows >= k
        off by one frame), so such consumers call this first."""
        pend = getattr(self, "_pending_shift", None)
        if pend is None:
            return
        k, n = pend
        self._pending_shift = None
        dP = self._shift_buffers(k, n_rows=n, host=False)
        pd = getattr(self, "_pending_delta", None)
        if pd is not None:
            t1d, t0d = pd
            self.pg.delta[t1d] = (t0d, dP)
            self._pending_delta = None

    def _shift_buffers(self, k, staging=False, n_rows=None, host=True):
        """Delete frame k: shift frame rows left by one
        (reference slam.py:431-441). When ``staging`` the just-written
        frame at row n is included in the shift. Fixed-span fused kernel
        in steady state; generic gather fallback otherwise. With
        ``host=False`` only the device buffers move (used when the host
        rows were already shifted by the deferred-shift path)."""
        pg = self.pg
        M, N = self.M, self.N
        n = n_rows if n_rows is not None else pg.n + (1 if staging else 0)
        span = n - 1 - k
        if host:
            pg.tstamps_[k : n - 1] = pg.tstamps_[k + 1 : n]
            pg.colors_[k : n - 1] = pg.colors_[k + 1 : n]
            pg.seg_[k : n - 1] = pg.seg_[k + 1 : n]
            self.fslot_rows[k : n - 1] = self.fslot_rows[k + 1 : n]
            self.pslot_rows[k : n - 1] = self.pslot_rows[k + 1 : n]

        if 1 <= span <= self.cfg.KEYFRAME_INDEX + 2:
            # small-span removals (the steady-state case; the lagged
            # decision queue makes span = KEYFRAME_INDEX+1 typical) use a
            # fixed-span fused kernel -- one compile per distinct span
            (pg.poses_, pg.patches_, pg.intrinsics_, pg.imap_, pg.gmap_,
             pg.fmap1_, pg.fmap2_, pg.colors_dev, pg.seg_dev, pg.scale_,
             pg.score_dev, dP) = remove_keyframe_shift(
                pg.poses_, pg.patches_, pg.intrinsics_, pg.imap_, pg.gmap_,
                pg.fmap1_, pg.fmap2_, pg.colors_dev, pg.seg_dev, pg.scale_,
                pg.score_dev, k, n,
                SPAN=span, M=M,
                pmem=self.pmem, mem=self.mem,
            )
            return dP

        from .kernels import relative_pose_row
        dP = relative_pose_row(pg.poses_, k)
        fidx = np.arange(N)
        fidx[k : n - 1] = fidx[k + 1 : n]
        fidx_j = jnp.asarray(fidx)
        pg.poses_ = gather_rows(pg.poses_, fidx_j)
        pg.intrinsics_ = gather_rows(pg.intrinsics_, fidx_j)
        pidx = (fidx[:, None] * M + np.arange(M)[None, :]).reshape(-1)
        pg.patches_ = gather_rows(pg.patches_, jnp.asarray(pidx))
        pg.score_dev = gather_rows(pg.score_dev, jnp.asarray(pidx))
        # imap/gmap/fmap pyramids stay put: the slot tables (shifted
        # above) re-route the packed index rows
        return dP

    # ------------------------------------------------------------------
    # per-frame entry (reference slam.py:612-740)
    # ------------------------------------------------------------------
    def prefetch(self, image):
        """Start the async host->device upload of a future frame; pass the
        same array to __call__ later and the upload will already be in
        flight (hides the image transfer latency)."""
        arr = jax.device_put(np.asarray(image).reshape(-1))
        if not hasattr(self, "_prefetched"):
            self._prefetched = {}
        self._prefetched[id(image)] = arr
        if len(self._prefetched) > 4:
            self._prefetched.pop(next(iter(self._prefetched)))
        return arr

    def __call__(self, tstamp, image, intrinsics):
        cfg = self.cfg
        pg = self.pg
        n, M = pg.n, self.M

        if (n + 1) >= self.N:
            raise Exception(
                f"The buffer size is too small. You can increase it using "
                f'"--opts BUFFER_SIZE={self.N*2}"'
            )

        if (self.is_initialized and self.update_override is None
                and self._frame_body is not None):
            return self._call_fused(tstamp, image, intrinsics)

        if self.long_term_lc is not None:
            self.long_term_lc(image, n)

        with Timer("patch", enabled=self.enable_timing):
            k1 = pg.counter  # per-frame seed, folded inside the jit
            self.tlist.append(tstamp)
            pref = getattr(self, "_prefetched", {})
            image_dev = pref.pop(id(image), None)
            if image_dev is None:
                image_dev = jax.device_put(np.asarray(image).reshape(-1))
            pg.tstamps_[n] = pg.counter
            if n > 1 and cfg.MOTION_MODEL == "DAMPED_LINEAR":
                *_, a, b, c = [1] * 3 + self.tlist
                fac = float((c - b) / max(b - a, 1e-9))
            else:
                fac = 0.0
            intr_key = tuple(np.asarray(intrinsics, np.float64))
            intr_dev = self._intr_cache.get(intr_key)
            if intr_dev is None:
                intr_dev = jnp.asarray(
                    np.asarray(intrinsics, np.float64) / self.RES, jnp.float32)
                self._intr_cache[intr_key] = intr_dev
            self._process_frame(image_dev, k1, fac, self.is_initialized, intr_dev)
            if self.enable_timing:
                jax.block_until_ready(pg.poses_)

        pg.counter += 1

        # deferred keyframe decision: the motion-magnitude pull now overlaps
        # the frame kernel dispatched above; on removal the fused shift also
        # moves the just-written staging row (span = KEYFRAME_INDEX)
        if getattr(self, "_pending_keyframe", False):
            self._pending_keyframe = False
            with Timer("keyframe", enabled=self.enable_timing):
                self.keyframe(staging=True)
            n = pg.n

        # MOTION_PROBE_THR < 0 can never gate a frame (the probe returns a
        # norm >= 0), so skip the probe dispatch AND its blocking sync
        # entirely -- under the bench config this removed one device round
        # trip per pre-init frame and a single point of failure
        if n > 0 and not self.is_initialized and cfg.MOTION_PROBE_THR >= 0:
            if self.motion_probe() < cfg.MOTION_PROBE_THR:
                pg.delta[pg.counter - 1] = (pg.counter - 2, np.asarray(SE3.Identity(()).data))
                return "Not keyframe"

        pg.n += 1
        pg.m += M

        if cfg.LOOP_CLOSURE:
            if pg.n - self.last_global_ba >= cfg.GLOBAL_OPT_FREQ:
                from ..loop.proximity import edges_loop
                lkk, ljj = edges_loop(pg, cfg)
                if len(lkk) > 0:
                    self.last_global_ba = pg.n
                    self.stats["loop_edges"] += len(lkk)
                    self.pg.append_edges(lkk // M, ljj, lkk)

        # add forward and backward factors
        kf, jf = self._edges_forw()
        self.append_factors(kf, jf)
        kb, jb = self._edges_back()
        self.append_factors(kb, jb)

        if pg.n == 8 and not self.is_initialized:
            self.is_initialized = True
            for _ in range(12):
                self.update()
            if self.long_term_lc is not None:
                self.long_term_lc.attempt_loop_closure(pg.n)
                self.long_term_lc.lc_callback()
        elif self.is_initialized:
            with Timer("update", enabled=self.enable_timing):
                self.update()
                if self.enable_timing:
                    jax.block_until_ready(pg.poses_)
            # keyframe decision deferred to the start of the next __call__
            # so the motion-magnitude device->host pull overlaps the next
            # frame's feature extraction (nothing happens between the end
            # of this frame and the start of the next, so the operation
            # order is identical to the reference's update->keyframe)
            self._pending_keyframe = True
            if self.long_term_lc is not None:
                try:
                    self.long_term_lc.attempt_loop_closure(pg.n)
                    self.long_term_lc.lc_callback()
                except IndexError as e:
                    print(e)

        if self.viewer is not None:
            self.viewer.update_image(image)
        return "Is keyframe"

    def _call_fused(self, tstamp, image, intrinsics):
        """Steady-state per-frame path: keyframe decision for the PREVIOUS
        frame first (host, using the async-pulled motion magnitude), then
        frame insert + update in a single fused dispatch. Operation order
        matches the reference's update -> keyframe -> next frame
        (slam.py:612-740); only the program boundaries differ."""
        cfg, pg, M = self.cfg, self.pg, self.M

        # apply the keyframe decision measured TWO frames ago: its motion
        # magnitude finished computing during the previous frame's interval
        # and was pulled asynchronously, so this never stalls the pipeline
        # (the reference blocks on this value every frame, slam.py:399-406)
        with Timer("keyframe", enabled=self.enable_timing):
            defer = not cfg.LOOP_CLOSURE  # retired edges unused -> no dispatch
            if len(self._kf_queue) >= 2:
                pid, mm = self._kf_queue.pop(0)
                self._kf_apply(self._decide_row(pid, mm), defer=defer,
                               fused_shift=True)
            else:
                self._kf_apply(None, defer=defer)

        n = pg.n
        if self.long_term_lc is not None:
            self.long_term_lc(image, n)

        k1 = pg.counter
        self.tlist.append(tstamp)
        pref = getattr(self, "_prefetched", {})
        image_dev = pref.pop(id(image), None)
        if image_dev is None:
            # flat 1-D upload (multi-dim payloads are slow on the remote
            # transport); frame_fn reshapes on device
            image_dev = jax.device_put(np.asarray(image).reshape(-1))
        pg.tstamps_[n] = pg.counter
        if n > 1 and cfg.MOTION_MODEL == "DAMPED_LINEAR":
            *_, a, b, c = [1] * 3 + self.tlist
            fac = float((c - b) / max(b - a, 1e-9))
        else:
            fac = 0.0
        intr_key = tuple(np.asarray(intrinsics, np.float64))
        intr_dev = self._intr_cache.get(intr_key)
        if intr_dev is None:
            intr_dev = jnp.asarray(
                np.asarray(intrinsics, np.float64) / self.RES, jnp.float32)
            self._intr_cache[intr_key] = intr_dev

        pg.counter += 1
        pg.n += 1
        pg.m += M

        with Timer("edges", enabled=self.enable_timing):
            if cfg.LOOP_CLOSURE:
                if pg.n - self.last_global_ba >= cfg.GLOBAL_OPT_FREQ:
                    # edges_loop reads device frame rows; a keyframe shift
                    # deferred to the fused dispatch must land first
                    self._apply_pending_shift()
                    from ..loop.proximity import edges_loop
                    lkk, ljj = edges_loop(pg, cfg)
                    if len(lkk) > 0:
                        self.last_global_ba = pg.n
                        self.stats["loop_edges"] += len(lkk)
                        pg.append_edges(lkk // M, ljj, lkk)

            kf, jf = self._edges_forw()
            self.append_factors(kf, jf)
            kb, jb = self._edges_back()
            self.append_factors(kb, jb)

        with Timer("frame+update", enabled=self.enable_timing):
            self._fused_frame_update(image_dev, k1, fac, intr_dev)
            if self.enable_timing:
                jax.block_until_ready(pg.poses_)

        if self.long_term_lc is not None:
            try:
                self.long_term_lc.attempt_loop_closure(pg.n)
                self.long_term_lc.lc_callback()
            except IndexError as e:
                print(e)

        if self.viewer is not None:
            self.viewer.update_image(image)
        return "Is keyframe"

    # ------------------------------------------------------------------
    def get_pose(self, t):
        if t in self.traj:
            return self.traj[t]
        t0, dP = self.pg.delta[t]
        pose = np.asarray(se3_mul(jnp.asarray(np.asarray(dP)), jnp.asarray(self.get_pose(t0))))
        if self.terminating:
            self.traj[t] = pose
        return pose

    def terminate(self):
        pg = self.pg
        if not self.is_initialized:
            warn(f"SLAM terminates without initialization! Frame count: {pg.counter}")
            poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0]), (pg.counter, 1))
            return poses, np.array(self.tlist, np.float64)

        self.terminating = True
        while self._kf_queue:
            pid, mm = self._kf_queue.pop(0)
            self._kf_apply(self._decide_row(pid, mm), staging=False)
        if getattr(self, "_pending_keyframe", False):
            self._pending_keyframe = False
            self.keyframe(staging=False)
        if self.long_term_lc is not None:
            self.long_term_lc.terminate(pg.n)
        if self.cfg.LOOP_CLOSURE:
            from ..loop.proximity import edges_loop
            lkk, ljj = edges_loop(pg, self.cfg)
            if len(lkk) > 0:
                self.pg.append_edges(lkk // self.M, ljj, lkk)
        for _ in range(12):
            self.ran_global_ba[pg.n] = False
            self.update()

        if True:
            c = np.asarray(pg.colors_dev)
            pg.colors_[:] = np.clip((c[:, :, [2, 1, 0]] + 0.5) * (255.0 / 2), 0, 255).astype(np.uint8)
        self.traj = {}
        poses_np = np.asarray(pg.poses_)
        for i in range(pg.n):
            self.traj[int(pg.tstamps_[i])] = poses_np[i]

        poses = np.stack([self.get_pose(t) for t in range(pg.counter)])
        poses = np.asarray(se3_inv(jnp.asarray(poses)))
        tstamps = np.array(self.tlist, np.float64)
        if self.viewer is not None:
            self.viewer.join()
        self.terminating = False
        return poses, tstamps

    @property
    def n(self):
        return self.pg.n

    @property
    def m(self):
        return self.pg.m

    def points(self):
        ix = jnp.asarray(np.arange(self.pg.m) // self.M, jnp.int32)
        pts = compute_points(
            self.pg.poses_, self.pg.patches_[: self.pg.m], self.pg.intrinsics_, ix
        )
        return np.asarray(pts)


def _pad_to(a, n, fill=0):
    a = np.asarray(a, np.int64)
    if len(a) >= n:
        return a[:n]
    return np.concatenate([a, np.full(n - len(a), fill, np.int64)])


def _deep_merge(a, b):
    """Merge nested flax param dicts."""
    if not isinstance(a, dict):
        return b
    out = dict(a)
    for k, v in dict(b).items():
        out[k] = _deep_merge(out[k], v) if k in out else v
    return out
