"""Synthetic sequence generator + oracle update operator.

Gives the SLAM runtime ground-truth correspondences (the job of the
learned update network) so the geometry/state machinery -- edges, BA,
keyframing, ring buffers, termination -- is validated end-to-end without
pretrained weights.

World model: a bumpy plane z = Z0 + A*sin(...) observed by a moving
camera. For any pixel in any frame the true inverse depth is computed by
ray marching; reprojection through the GT poses yields the oracle flow.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from cdvslam_tpu.lie import SE3, se3_inv, se3_mul
from cdvslam_tpu.geom import transform


def make_gt_poses(F, motion="orbit", step=0.15, seed=0, orbit_r=1.0, yaw_factor=0.6):
    """World->camera SE3 poses, (F, 7) numpy.

    Default 'orbit': the camera circles inside the scene sphere at unit
    scale, so true inverse depths are O(1) -- matching the reference's
    disparity-normalization convention (reference data_readers/base.py:
    0.98-quantile disparity normalization) that the U[0,1] random depth
    init assumes.
    """
    from cdvslam_tpu.lie import se3_exp

    if motion == "orbit":
        poses = []
        for f in range(F):
            th = step * f
            C = np.array([orbit_r * np.sin(th), 0.12 * np.sin(0.5 * th),
                          orbit_r * (1 - np.cos(th))])
            # yaw_factor=1.0 makes the camera yaw with the orbit (tangent),
            # so a full circle is a true loop (frame f == frame f + 2*pi/step);
            # smaller factors give sideways-looking, higher-parallax views
            yaw = yaw_factor * th
            pitch = 0.05 * np.sin(0.8 * th)
            q = np.asarray(
                se3_exp(jnp.asarray([0, 0, 0, pitch, yaw, 0.0], jnp.float32))
            )[3:7]
            from cdvslam_tpu.lie.quaternion import qrot
            t = -np.asarray(qrot(jnp.asarray(q)[None], jnp.asarray(C)[None]))[0]
            poses.append(np.concatenate([t, q]))
        return np.stack(poses).astype(np.float32)

    xi = np.stack([
        np.array([step * f, 0, 0, 0, 0, 0], np.float32) for f in range(F)
    ])
    return np.asarray(se3_exp(jnp.asarray(xi)))


class SynthScene:
    """Textured sphere of radius R around the origin: every camera ray has
    a unique, well-defined positive depth as long as the camera stays
    inside the sphere."""

    def __init__(self, intr4, radius=3.5, seed=0):
        self.intr4 = np.asarray(intr4, np.float32)  # intrinsics at 1/4 res
        self.R = radius

    def true_inv_depth(self, pose, px, py):
        """pose: world->cam (7,), pixel coords at 1/4 res -> inverse depth."""
        fx, fy, cx, cy = self.intr4
        r = np.stack([(px - cx) / fx, (py - cy) / fy, np.ones_like(px)], -1)
        g = jnp.asarray(pose)[None]
        Ginv = np.asarray(se3_inv(g))[0]
        from cdvslam_tpu.lie.quaternion import qrot

        D = np.asarray(qrot(jnp.asarray(Ginv[3:7])[None], jnp.asarray(r)))
        Dn = D / np.linalg.norm(D, axis=-1, keepdims=True)
        C = Ginv[:3]
        # ray-sphere: |C + lam*Dn|^2 = R^2, camera inside -> one positive root
        b = Dn @ C
        disc = np.maximum(b * b - (C @ C - self.R ** 2), 1e-9)
        lam = -b + np.sqrt(disc)
        P = C[None] + lam[:, None] * Dn
        Pc = np.asarray(SE3(jnp.asarray(pose)[None]).act(jnp.asarray(P[None])))[0]
        return 1.0 / np.clip(Pc[:, 2], 0.05, None)


class OracleUpdate:
    """Callable(ii, jj, kk, centers) -> (delta, weight) with GT flow.

    Maintains a registry of TRUE patch states (x, y, d_true) keyed by the
    ORIGINAL frame id (the SLAM's tstamps_ counter value), so keyframe
    removal / index shifting in the runtime is handled transparently.
    """

    def __init__(self, slam, scene: SynthScene, gt_poses, noise=0.0, seed=0):
        self.slam = slam
        self.scene = scene
        self.gt = np.asarray(gt_poses)  # (F, 7) original frame id -> pose
        self.true_xy = {}               # orig frame -> (M, 2)
        self.noise = noise
        self.rng = np.random.RandomState(seed)

    def register_frame(self, orig_frame):
        """Record the true patch states of the newest frame (call after
        slam() returns)."""
        pg = self.slam.pg
        M = self.slam.M
        # the newest committed frame is at row n-1 unless probe-rejected;
        # either way row with tstamps_ == orig_frame (or staging row n)
        rows = np.nonzero(pg.tstamps_[: pg.n] == orig_frame)[0]
        row = int(rows[-1]) if len(rows) else pg.n
        patch = np.asarray(pg.patches_[row * M : (row + 1) * M, :, 1, 1])
        self.true_xy[orig_frame] = patch[:, :2].copy()

    def _true_patch_array(self, frames):
        """Build (K, 3, 1, 1) true patches for the current graph layout."""
        pg = self.slam.pg
        M = self.slam.M
        n = max(pg.n, 1)
        K = (n + 1) * M
        arr = np.zeros((K, 3, 1, 1), np.float32)
        for row in range(n + 1):
            of = int(pg.tstamps_[row]) if row < len(pg.tstamps_) else None
            if of is None or of not in self.true_xy:
                continue
            xy = self.true_xy[of]
            d = self.scene.true_inv_depth(self.gt[of], xy[:, 0], xy[:, 1])
            arr[row * M : (row + 1) * M, 0, 0, 0] = xy[:, 0]
            arr[row * M : (row + 1) * M, 1, 0, 0] = xy[:, 1]
            arr[row * M : (row + 1) * M, 2, 0, 0] = d
        return arr

    def __call__(self, ii, jj, kk, centers):
        pg = self.slam.pg
        M = self.slam.M
        true_patches = self._true_patch_array(ii)
        K = true_patches.shape[0]
        kk = np.clip(kk, 0, K - 1)
        # GT poses by original frame id of current rows ii/jj
        nrows = pg.n + 1
        orig = pg.tstamps_[:nrows].astype(int)
        gtp = self.gt[np.clip(orig, 0, len(self.gt) - 1)]
        ii_c = np.clip(ii, 0, nrows - 1)
        jj_c = np.clip(jj, 0, nrows - 1)
        coords = transform(
            SE3(jnp.asarray(gtp)[None]),
            jnp.asarray(true_patches)[None],
            jnp.broadcast_to(jnp.asarray(self.scene.intr4), (1, nrows, 4)),
            jnp.asarray(ii_c), jnp.asarray(jj_c), jnp.asarray(kk),
        )
        gt_center = np.asarray(coords[0, :, 0, 0, :])
        delta = gt_center - centers
        if self.noise:
            delta = delta + self.noise * self.rng.randn(*delta.shape)
        # The trained update net emits small *incremental* flow corrections
        # (bounded regression head); mimic that by clamping the step and
        # down-weighting far-off edges, otherwise GN sees unrealistically
        # large consistent steps and overshoots during init.
        dn = np.linalg.norm(delta, axis=-1, keepdims=True)
        clip = 12.0
        delta = delta * np.minimum(1.0, clip / np.maximum(dn, 1e-9))
        w = np.where(dn > 96, 0.0, np.where(dn > 24, 0.3, 1.0))
        w = np.broadcast_to(w, delta.shape).copy()
        return delta.astype(np.float32), w.astype(np.float32)
