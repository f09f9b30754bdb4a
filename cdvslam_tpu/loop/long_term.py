"""Classical long-term loop closure (the DPV-SLAM++ backend).

Orchestration mirrors the reference (reference:
cdvslam/loop_closure/long_term.py): BoW place recognition with a
repetition check -> triplet-based 3D keypoint estimation (keypoint
matching across (i-1, i, i+1), structure-only BA triangulation, residual
filtering) -> RANSAC-Umeyama Sim3 between the two local point clouds ->
Sim3 pose-graph optimization -> pose/patch rewrite.

Substitutions vs the reference's optional dependency stack: DISK +
LightGlue (kornia) keypoints/matcher -> ORB + native Hamming matcher;
DBoW2 -> online-vocabulary BoW (native C++); the PGO process pool -> a
worker thread with the jitted JAX LM solver.
"""
from __future__ import annotations

import queue
import threading

import numpy as np
import jax.numpy as jnp

from ..ba import ba_solve
from ..ba.pgo import run_pgo, se3_to_sim3
from ..geom import iproj
from ..lie import SE3, se3_inv, se3_mul, se3_scale, sim3_inv, sim3_mul
from .retrieval import RetrievalBoW


def umeyama_sim3(x, y):
    """Sim3 (R, t, s) aligning x -> y, (N,3) each (optim_utils.py:63-116)."""
    mx, my = x.mean(0), y.mean(0)
    xc, yc = x - mx, y - my
    sigma_x = (xc ** 2).sum() / len(x)
    cov = yc.T @ xc / len(x)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    c = np.trace(np.diag(D) @ S) / max(sigma_x, 1e-12)
    t = my - c * R @ mx
    return R, t, c


def ransac_umeyama(x, y, iters=200, thresh=0.1, seed=0):
    """RANSAC wrapper (optim_utils.py:118-151)."""
    rng = np.random.RandomState(seed)
    best = None
    best_inl = -1
    n = len(x)
    if n < 4:
        return None
    for _ in range(iters):
        sel = rng.choice(n, 3, replace=False)
        try:
            R, t, c = umeyama_sim3(x[sel], y[sel])
        except np.linalg.LinAlgError:
            continue
        err = np.linalg.norm((c * (R @ x.T)).T + t - y, axis=1)
        inl = int((err < thresh).sum())
        if inl > best_inl:
            best_inl = inl
            best = err < thresh
    if best is None or best.sum() < 4:
        return None
    R, t, c = umeyama_sim3(x[best], y[best])
    return R, t, c, int(best.sum())


class LongTermLoopClosure:
    """Classical LC driver, hooked into the SLAM runtime like the
    reference (slam.py:615-616, 722-730)."""

    def __init__(self, cfg, slam):
        self.cfg = cfg
        self.slam = slam
        self.retrieval = RetrievalBoW(rad=cfg.get("LOOP_RETR_RADIUS", 50),
                                      thresh=cfg.LOOP_RETR_THRESH)
        self.result_q = queue.Queue()
        self.worker = None
        self.lc_count = 0
        self.frame_of = {}          # retrieval id -> insertion-time n
        self.gray = {}              # retrieval id -> downscaled gray frame
        # accumulated loop measurements (reference long_term.py:37-38,
        # 248-257: every PGO run sees ALL prior loop edges, re-measured
        # from the current -- already corrected -- estimates); keyed by
        # global frame id so keyframe removal cannot invalidate them
        self.loop_pairs = []        # [(fid_i, fid_j)]

    # -- per-frame hooks ------------------------------------------------
    def __call__(self, image, n):
        """Buffer + index the incoming frame (reference long_term.py:61-68)."""
        import cv2

        g = cv2.cvtColor(np.asarray(image), cv2.COLOR_RGB2GRAY)
        fid = self.slam.pg.counter
        self.retrieval.insert_image(g, fid)
        self.frame_of[fid] = n
        self.gray[fid] = g
        # bound memory
        if len(self.gray) > 2000:
            old = sorted(self.gray)[0]
            del self.gray[old]

    def keyframe(self, k):
        """Notification that SLAM removed keyframe row k (no-op: we key by
        the global frame counter, which survives removal)."""

    # -- loop attempt -----------------------------------------------------
    def attempt_loop_closure(self, n):
        fid = self.slam.pg.counter - 1
        hit = self.retrieval.detect_loop(fid)
        if hit is None:
            return
        i, j = hit
        # NMS around already-CLOSED loops (reference retrieval_dbow.py:
        # 14,74-107, NMS=50): without it every frame of a revisit re-fires
        # a near-duplicate closure whose repeated Sim3 applications only
        # churn the trajectory
        nms = self.cfg.get("LOOP_CLOSE_NMS", 50)
        for (a, b) in self.loop_pairs:
            if (i - a) ** 2 + (j - b) ** 2 < nms ** 2:
                return
        if self.worker is not None and self.worker.is_alive():
            return
        self.close_loop(i, j)

    def _keypoints_3d(self, fid):
        """Triplet structure-only triangulation (long_term.py:70-138):
        match ORB keypoints (fid-1, fid+1) -> fid, build a mini patch
        graph, run structure-only BA, keep low-residual points."""
        pg = self.slam.pg
        rows = np.nonzero(pg.tstamps_[: pg.n] == fid)[0]
        if len(rows) == 0:
            self._fail = f"frame {fid} not a keyframe"
            return None
        row = int(rows[-1])

        pts_c, pts_n, pts_p = [], [], []
        for nb, store in ((fid - 1, pts_p), (fid + 1, pts_n)):
            a, b = self.retrieval.match(nb, fid)
            if len(a) < 8:
                self._fail = f"too few matches {len(a)} between {nb} and {fid}"
                return None
            store.append((a, b))

        # form consistent TRACKS across the triplet: a center keypoint must
        # be matched by both neighbors (associate the two match sets on the
        # center-frame keypoint coordinates)
        (ap, bp), = pts_p
        (an, bn), = pts_n
        sel_p, sel_n = [], []
        used = set()
        for ip in range(len(bp)):
            d = np.linalg.norm(bn - bp[ip][None], axis=1)
            inn = int(np.argmin(d))
            if d[inn] < 1.0 and inn not in used:
                used.add(inn)
                sel_p.append(ip)
                sel_n.append(inn)
        if len(sel_p) < 8:
            self._fail = f"only {len(sel_p)} triplet tracks for {fid}"
            return None
        ap, bp = ap[sel_p], bp[sel_p]
        an = an[sel_n]
        centers_full = bp
        K = min(len(centers_full), 96)
        centers = centers_full[:K] / self.slam.RES

        # mini problem: 3 poses (prev, cur, next) from current estimates
        rows_p = np.nonzero(pg.tstamps_[: pg.n] == fid - 1)[0]
        rows_n = np.nonzero(pg.tstamps_[: pg.n] == fid + 1)[0]
        if len(rows_p) == 0 or len(rows_n) == 0:
            self._fail = f"triplet neighbors of {fid} not keyframes"
            return None
        poses3 = np.asarray(pg.poses_)[[int(rows_p[-1]), row, int(rows_n[-1])]]

        # The reference runs this mini problem in a scene normalize()d to
        # mean disparity 1 (patchgraph.py:99-104), where its absolute
        # constants -- the 1e-4 depth clamp, the d>20 reset, the z<20
        # point filter, the GN damping -- have their intended meaning.
        # Our monocular gauge floats freely (drift can move it orders of
        # magnitude), so NORMALIZE the triplet problem locally: rescale
        # the scene so the keyframe's median disparity
        # (long_term.py:108-109) is 1, init structure at 1, and scale the
        # triangulated points back to world units afterwards.
        M = self.slam.M
        true_disp = float(np.median(
            np.asarray(pg.patches_[row * M:(row + 1) * M, 2, 1, 1])))
        if not np.isfinite(true_disp) or true_disp <= 1e-6:
            true_disp = 1.0
        poses3 = poses3.copy()
        poses3[:, :3] *= true_disp            # scene scale sigma = true_disp
        patches = np.zeros((K, 3, 1, 1), np.float32)
        patches[:, 0, 0, 0] = centers[:, 0]
        patches[:, 1, 0, 0] = centers[:, 1]
        patches[:, 2, 0, 0] = 1.0

        tgt_p = ap[:K] / self.slam.RES
        tgt_n = an[:K] / self.slam.RES
        target = np.concatenate([tgt_p, tgt_n], 0).astype(np.float32)
        ii = np.concatenate([np.ones(K), np.ones(K)]).astype(np.int32)
        jj = np.concatenate([np.zeros(K), 2 * np.ones(K)]).astype(np.int32)
        kk = np.concatenate([np.arange(K), np.arange(K)]).astype(np.int32)
        w = np.ones((2 * K, 2), np.float32)
        mask = np.ones(2 * K, bool)

        poses_out, patches_out = ba_solve(
            jnp.asarray(poses3), jnp.asarray(patches), pg.intrinsics_[0],
            jnp.asarray(target), jnp.asarray(w),
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk),
            jnp.asarray(mask), 3, N=1, K=K, iterations=6, structure_only=True,
        )
        patches_out = np.asarray(patches_out)

        # residual filter (long_term.py:120-137)
        from ..geom import transform
        coords = transform(
            SE3(jnp.asarray(poses3)[None]), jnp.asarray(patches_out)[None],
            jnp.broadcast_to(pg.intrinsics_[0], (1, 3, 4)),
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk),
        )
        res = np.linalg.norm(np.asarray(coords[0, :, 0, 0]) - target, axis=1)
        # residual gate (long_term.py:131-133): the reference uses a fixed
        # 2 px max over the track pair; under drifty local geometry every
        # residual inflates together, so widen to a robust quantile (but
        # never below the reference's 2 px) and drop clamp-collapsed depths
        rmax = np.maximum(res[:K], res[K:])
        thr = max(2.0, 2.5 * float(np.median(rmax)))
        # in normalized units this is EXACTLY the reference's z < 20
        # point filter (long_term.py:219) plus a guard just off the BA's
        # 1e-4 depth clamp (collapse marker)
        good = (rmax < thr) & (patches_out[:, 2, 0, 0] > max(1.02e-4, 1 / 20.0))
        if good.sum() < 6:
            self._fail = f"only {int(good.sum())} triangulated points for {fid}"
            return None

        X = np.asarray(
            iproj(jnp.asarray(patches_out)[None],
                  jnp.broadcast_to(pg.intrinsics_[0], (1, K, 4)))
        )[0, :, 0, 0]                                  # (K, 4) homogeneous
        Xc = X[:, :3] / np.clip(X[:, 3:], 1e-6, None)  # normalized units
        Xc = Xc / true_disp                            # back to world units
        Ginv = np.asarray(se3_inv(jnp.asarray(
            np.asarray(pg.poses_)[row])))              # original-scale pose
        Xw = np.asarray(SE3(jnp.asarray(Ginv)[None]).act(jnp.asarray(Xc[None])))[0]
        return centers, Xw, Xc, good

    def close_loop(self, i, j):
        """Estimate Sim3 between loop frames and launch async PGO
        (long_term.py:205-266)."""
        stats = getattr(self.slam, "stats", None)
        if stats is not None:
            stats["lc_attempts"] += 1
        out_i = self._keypoints_3d(i)
        out_j = self._keypoints_3d(j)
        if out_i is None or out_j is None:
            return

        # match i <-> j keypoints, then align their 3D point sets
        a, b = self.retrieval.match(i, j)
        if len(a) < 8:
            return
        ci, Xi_w, Xi_c, gi = out_i
        cj, Xj_w, Xj_c, gj = out_j

        # associate by nearest keypoint coordinates
        def assoc(query, bank, pts, good):
            out = np.full(len(query), -1, np.int64)
            for qi, q in enumerate(query):
                d = np.linalg.norm(bank - q[None] / self.slam.RES, axis=1)
                kbest = int(np.argmin(d))
                if d[kbest] < 2.0 and good[kbest]:
                    out[qi] = kbest
            return out

        ai = assoc(a, ci, Xi_c, gi)
        bj = assoc(b, cj, Xj_c, gj)
        sel = (ai >= 0) & (bj >= 0)
        if sel.sum() < 6:
            return
        Pi = Xi_c[ai[sel]]
        Pj = Xj_c[bj[sel]]

        # scale-invariant inlier threshold: the reference's 0.1 world
        # units (400 iterations, long_term.py:243) assume a normalize()d
        # scene -- mean disparity 1, point norms O(1). Ours floats with
        # the monocular gauge, so when the TARGET (Pj) cloud -- whose
        # units the residual is measured in -- has drifted large, scale
        # the threshold with its typical point norm; never tighten below
        # the reference's 0.1.
        s_pts = float(np.median(np.linalg.norm(Pj, axis=1)))
        fit = ransac_umeyama(Pi, Pj, iters=400,
                             thresh=0.1 * max(s_pts / 3.0, 1.0))
        if fit is None:
            return
        R, t, s, ninl = fit

        # Sim3 measurement between poses i and j (camera frames)
        from scipy.spatial.transform import Rotation as Rot
        q = Rot.from_matrix(R).as_quat()
        dS = np.concatenate([t, q, [s]]).astype(np.float32)

        pg = self.slam.pg
        rows_i = np.nonzero(pg.tstamps_[: pg.n] == i)[0]
        rows_j = np.nonzero(pg.tstamps_[: pg.n] == j)[0]
        if len(rows_i) == 0 or len(rows_j) == 0:
            return
        ri, rj = int(rows_i[-1]), int(rows_j[-1])
        poses = np.asarray(pg.poses_[: pg.n])

        # accumulate ALL loop measurements (reference long_term.py:248-257):
        # prior loop pairs enter each new PGO as scale-1 Sim3 constraints
        # re-measured from the CURRENT (already corrected) estimates, so a
        # new closure cannot undo old ones
        dS_rows = [dS]
        ii_rows = [max(ri, rj)]
        jj_rows = [min(ri, rj)]
        tst = pg.tstamps_[: pg.n]
        pred = se3_to_sim3(poses)               # world->cam Sim3
        for (fi, fj) in self.loop_pairs:
            rfi = np.nonzero(tst == fi)[0]
            rfj = np.nonzero(tst == fj)[0]
            if len(rfi) == 0 or len(rfj) == 0:
                continue
            a, bb = int(rfi[-1]), int(rfj[-1])
            hi, lo = max(a, bb), min(a, bb)
            # constraint satisfied at the current estimate:
            # C = G_lo * G_hi^-1 with G = world->cam (the PGO's loop-edge
            # convention, see ba/pgo.py perform_updates)
            C = np.asarray(sim3_mul(jnp.asarray(pred[lo]),
                                    sim3_inv(jnp.asarray(pred[hi]))))
            dS_rows.append(C.astype(np.float32))
            ii_rows.append(hi)
            jj_rows.append(lo)
        self.loop_pairs.append((int(i), int(j)))
        dS_all = np.stack(dS_rows)
        ii_all = np.asarray(ii_rows)
        jj_all = np.asarray(jj_rows)

        def work():
            try:
                safe_i, corrected = run_pgo(
                    poses, dS_all, ii_all, jj_all, iters=30,
                )
                self.result_q.put((safe_i, corrected))
            except Exception as e:  # pragma: no cover
                print("PGO failed:", e)

        if self.cfg.get("CLASSIC_LOOP_SYNC", False):
            work()
        else:
            self.worker = threading.Thread(target=work, daemon=True)
            self.worker.start()

    def lc_callback(self):
        """Apply finished PGO results (long_term.py:189-203); drains the
        queue so a result is never dropped between polls."""
        while True:
            try:
                safe_i, corrected = self.result_q.get_nowait()
            except queue.Empty:
                return
            self._apply_correction(safe_i, corrected)

    def _apply_correction(self, safe_i, corrected):
        pg = self.slam.pg
        n = pg.n
        m = min(safe_i, n)
        # corrected: (m, 8) Sim3 of world->cam; write back SE3 part and
        # rescale patch depths by the Sim3 scale
        corr = np.asarray(corrected[:m])
        scales = corr[:, 7]
        se3_part = corr[:, :7].copy()
        pg.poses_ = pg.poses_.at[:m].set(jnp.asarray(se3_part))
        M = self.slam.M
        srep = np.repeat(scales, M).astype(np.float32)
        pg.patches_ = pg.patches_.at[: m * M, 2].multiply(
            jnp.asarray(srep)[:, None, None]
        )
        # rescale the delta chain (reference long_term.py:176-186 +
        # lc_callback): removed frames' relative poses hang off a live
        # keyframe whose local scene scale just changed; walk each chain
        # to its live root and scale the SE3 translation. `scales` here
        # is the world->cam Sim3 scale (inverse depths multiply by it),
        # so translations scale by 1/scales (the reference's s).
        s_of_t = {}
        for r in range(n):
            s_of_t[int(pg.tstamps_[r])] = (
                float(1.0 / max(scales[r], 1e-12)) if r < m else 1.0)
        for t, (t0, dP) in list(pg.delta.items()):
            t_src = t
            while t_src in pg.delta:
                t_src = pg.delta[t_src][0]
            s1 = s_of_t.get(int(t_src), 1.0)
            if s1 != 1.0:
                dPn = np.asarray(dP, np.float32).copy()
                dPn[:3] *= s1
                pg.delta[t] = (t0, dPn)
        # re-fix gauge + unit mean disparity (reference lc_callback tail)
        self.slam.normalize()
        self.lc_count += 1
        stats = getattr(self.slam, "stats", None)
        if stats is not None:
            stats["lc_applied"] += 1

    def terminate(self, n):
        self.attempt_loop_closure(n)
        if self.worker is not None:
            self.worker.join(timeout=60)
        self.lc_callback()
