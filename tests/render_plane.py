"""Planar-scene renderer for end-to-end tests with REAL images.

A textured plane z=0 in the world, viewed by a moving camera: every image
is an exact homography warp of the base texture, so ORB keypoints,
optical flow, and triangulated geometry are all physically consistent
with the ground-truth poses. This lets the classical loop-closure stack
(ORB + BoW + triplet triangulation + Sim3 PGO) be driven end-to-end
without datasets.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from cdvslam_tpu.lie import SE3, se3_inv
from cdvslam_tpu.lie.quaternion import qmat


class PlaneScene:
    def __init__(self, intr, ht, wd, tex_size=2048, extent=8.0, seed=0):
        """intr: full-res (fx, fy, cx, cy). The texture spans
        [-extent, extent]^2 in world x, y at z=0."""
        import cv2

        rng = np.random.RandomState(seed)
        tex = (rng.rand(tex_size // 16, tex_size // 16) * 255).astype(np.uint8)
        tex = cv2.resize(tex, (tex_size, tex_size), interpolation=cv2.INTER_NEAREST)
        tex = cv2.GaussianBlur(tex, (7, 7), 1.2)
        self.tex = np.stack([tex] * 3, -1)
        # add colored blobs for richer ORB features
        for _ in range(400):
            c = rng.randint(0, tex_size, 2)
            r = rng.randint(4, 24)
            col = rng.randint(0, 255, 3).tolist()
            cv2.circle(self.tex, (int(c[0]), int(c[1])), int(r), col, -1)
        self.ts = tex_size
        self.extent = extent
        self.intr = np.asarray(intr, np.float64)
        self.intr4 = self.intr / 4.0    # OracleUpdate convention
        self.ht, self.wd = ht, wd

    def world_to_tex(self, xy):
        return (xy + self.extent) / (2 * self.extent) * self.ts

    def render(self, pose):
        """pose: world->cam SE3 (7,). Returns (H, W, 3) uint8."""
        import cv2

        fx, fy, cx, cy = self.intr
        Ginv = np.asarray(se3_inv(jnp.asarray(pose, jnp.float32)))
        R_cw = np.asarray(qmat(jnp.asarray(Ginv[3:7])[None]))[0]  # cam->world rot
        C = Ginv[:3]

        # homography from image pixel to plane point:
        # ray dir world = R_cw @ K^-1 [u, v, 1]; lambda = -C_z / d_z
        u, v = np.meshgrid(np.arange(self.wd), np.arange(self.ht))
        r = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u, np.float64)], -1)
        d = r @ R_cw.T
        lam = -C[2] / np.where(np.abs(d[..., 2]) > 1e-9, d[..., 2], 1e-9)
        Pxy = C[None, None, :2] + lam[..., None] * d[..., :2]
        txy = self.world_to_tex(Pxy)
        valid = (lam > 0.05)
        mapx = np.where(valid, txy[..., 0], -1).astype(np.float32)
        mapy = np.where(valid, txy[..., 1], -1).astype(np.float32)
        img = cv2.remap(self.tex, mapx, mapy, cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_WRAP)
        return img

    def true_inv_depth(self, pose, px, py, res=4):
        """Inverse depth of plane points at 1/res pixel coords."""
        fx, fy, cx, cy = self.intr / res
        Ginv = np.asarray(se3_inv(jnp.asarray(pose, jnp.float32)))
        R_cw = np.asarray(qmat(jnp.asarray(Ginv[3:7])[None]))[0]
        C = Ginv[:3]
        r = np.stack([(px - cx) / fx, (py - cy) / fy, np.ones_like(px)], -1)
        d = r @ R_cw.T
        lam = -C[2] / np.where(np.abs(d[..., 2]) > 1e-9, d[..., 2], 1e-9)
        P = C[None] + lam[:, None] * d
        Pc = np.asarray(SE3(jnp.asarray(pose, jnp.float32)[None]).act(
            jnp.asarray(P[None], jnp.float32)))[0]
        return 1.0 / np.clip(Pc[:, 2], 0.05, None)


def overhead_loop_poses(F, height=2.0, radius=0.8, seed=0):
    """Camera above the plane looking down, circling: a true loop."""
    from cdvslam_tpu.lie import se3_exp, se3_mul

    poses = []
    # base orientation: look straight down (+z cam axis toward -z world)
    base = np.asarray(se3_exp(jnp.asarray([0, 0, 0, np.pi, 0, 0], jnp.float32)))
    for f in range(F):
        th = 2 * np.pi * f / (F - 8)
        C = np.array([radius * np.cos(th), radius * np.sin(th), height])
        yaw = np.asarray(se3_exp(jnp.asarray([0, 0, 0, 0, 0, 0.3 * np.sin(th)], jnp.float32)))
        R = np.asarray(se3_mul(jnp.asarray(yaw), jnp.asarray(base)))
        q = R[3:7]
        t = -np.asarray(qmat(jnp.asarray(q)[None]))[0] @ C
        poses.append(np.concatenate([t, q]).astype(np.float32))
    return np.stack(poses)
