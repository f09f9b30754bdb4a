"""Projective geometry for patch SLAM (L1).

Reimplements the reference's projective ops (reference:
cdvslam/projective_ops.py) in JAX with identical numerics: inverse/forward
pinhole projection of PxP patches stored as (x, y, inverse-depth), SE3/Sim3
relative transforms with analytic pose/depth Jacobians, point clouds, and
the flow-magnitude heuristic.

Conventions:
  patches     (B, K, 3, P, P)   channels = (x, y, d) at 1/RES resolution
  intrinsics  (B, N, 4)         (fx, fy, cx, cy)
  poses       SE3/Sim3 wrapper with data (B, N, 7|8)
  ii, jj, kk  (E,) int arrays: source frame, target frame, patch index

Clamps match the reference exactly: proj clamps Z >= 0.1
(projective_ops.py:43); Jacobians/validity use Z > 0.2
(projective_ops.py:80,108; MIN_DEPTH at :6).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..lie import SE3, Sim3, se3_inv, se3_mul, se3_adjT, sim3_inv, sim3_mul, sim3_adjT

MIN_DEPTH = 0.2


def iproj(patches: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Inverse projection: (B,E,3,P,P) patches -> (B,E,P,P,4) homogeneous.

    reference projective_ops.py:19-29.
    """
    x = patches[:, :, 0]
    y = patches[:, :, 1]
    d = patches[:, :, 2]
    fx, fy, cx, cy = [intrinsics[..., i, None, None] for i in range(4)]
    xn = (x - cx) / fx
    yn = (y - cy) / fy
    return jnp.stack([xn, yn, jnp.ones_like(d), d], axis=-1)


def proj(X: jnp.ndarray, intrinsics: jnp.ndarray, depth: bool = False) -> jnp.ndarray:
    """Pinhole projection with Z >= 0.1 clamp (projective_ops.py:32-50)."""
    Xx, Xy, Xz = X[..., 0], X[..., 1], X[..., 2]
    fx, fy, cx, cy = [intrinsics[..., i, None, None] for i in range(4)]
    d = 1.0 / jnp.clip(Xz, min=0.1)
    x = fx * (d * Xx) + cx
    y = fy * (d * Xy) + cy
    if depth:
        return jnp.stack([x, y, d], axis=-1)
    return jnp.stack([x, y], axis=-1)


def _rel_pose(poses, ii, jj, tonly=False):
    """G_ij = G_j * G_i^-1, gathered per edge."""
    data = poses.data
    gi = jnp.take(data, ii, axis=1, mode="clip")
    gj = jnp.take(data, jj, axis=1, mode="clip")
    if isinstance(poses, Sim3):
        gij = sim3_mul(gj, sim3_inv(gi))
        cls = Sim3
    else:
        gij = se3_mul(gj, se3_inv(gi))
        cls = SE3
    if tonly:
        # zero out rotation (+scale) like the reference (projective_ops.py:62-63)
        ident = jnp.zeros_like(gij).at[..., -(cls.embedded_dim - 3):].set(
            jnp.asarray([0.0, 0.0, 0.0, 1.0] + ([1.0] if cls is Sim3 else []), gij.dtype)
        )
        gij = jnp.concatenate([gij[..., :3], ident[..., 3:]], axis=-1)
    return cls(gij)


def transform(poses, patches, intrinsics, ii, jj, kk,
              depth=False, valid=False, jacobian=False, tonly=False):
    """Projective transform of patches kk from frame ii into frame jj.

    reference projective_ops.py:53-113. With ``jacobian=True`` also returns
    the center-pixel validity mask and analytic Jacobians
    (Ji, Jj, Jz): 2x(6|7) pose Jacobians and 2x1 depth Jacobian.
    """
    X0 = iproj(jnp.take(patches, kk, axis=1, mode="clip"), jnp.take(intrinsics, ii, axis=1, mode="clip"))
    Gij = _rel_pose(poses, ii, jj, tonly=tonly)

    # act on homogeneous points: (B,E,P,P,4)
    X1 = type(Gij)(Gij.data[:, :, None, None]).act(X0)

    intr_j = jnp.take(intrinsics, jj, axis=1, mode="clip")
    x1 = proj(X1, intr_j, depth=depth)

    if jacobian:
        p = X1.shape[2]
        Xc = X1[..., p // 2, p // 2, :]
        X, Y, Z, H = Xc[..., 0], Xc[..., 1], Xc[..., 2], Xc[..., 3]
        o = jnp.zeros_like(H)

        fx, fy = intr_j[..., 0], intr_j[..., 1]

        # d = 1/Z where |Z| > 0.2 else 0 (projective_ops.py:79-80)
        d = jnp.where(jnp.abs(Z) > 0.2, 1.0 / jnp.where(jnp.abs(Z) > 0.2, Z, 1.0), 0.0)

        if isinstance(Gij, SE3):
            Ja = jnp.stack(
                [
                    H, o, o, o, Z, -Y,
                    o, H, o, -Z, o, X,
                    o, o, H, Y, -X, o,
                    o, o, o, o, o, o,
                ],
                axis=-1,
            ).reshape(*H.shape, 4, 6)
            adjT = se3_adjT
        else:
            Ja = jnp.stack(
                [
                    H, o, o, o, Z, -Y, X,
                    o, H, o, -Z, o, X, Y,
                    o, o, H, Y, -X, o, Z,
                    o, o, o, o, o, o, o,
                ],
                axis=-1,
            ).reshape(*H.shape, 4, 7)
            adjT = sim3_adjT

        Jp = jnp.stack(
            [
                fx * d, o, -fx * X * d * d, o,
                o, fy * d, -fy * Y * d * d, o,
            ],
            axis=-1,
        ).reshape(*H.shape, 2, 4)

        Jj = Jp @ Ja                                   # (B,E,2,K)
        Ji = -adjT(Gij.data[:, :, None], Jj)           # row-wise AdjT
        Jz = Jp @ Gij.matrix()[..., :, 3:]             # (B,E,2,1)

        return x1, (Z > 0.2).astype(x1.dtype), (Ji, Jj, Jz)

    if valid:
        return x1, (X1[..., 2] > 0.2).astype(x1.dtype)
    return x1


def point_cloud(poses, patches, intrinsics, ix):
    """Backproject patches into world frame (projective_ops.py:115-117)."""
    X = iproj(patches, jnp.take(intrinsics, ix, axis=1, mode="clip"))
    Ginv = poses.inv()
    g = jnp.take(Ginv.data, ix, axis=1, mode="clip")[:, :, None, None]
    return type(poses)(g).act(X)


def flow_mag(poses, patches, intrinsics, ii, jj, kk, beta=0.3):
    """Blended full/translation-only flow magnitude (projective_ops.py:120-130)."""
    coords0 = transform(poses, patches, intrinsics, ii, ii, kk)
    coords1, val = transform(poses, patches, intrinsics, ii, jj, kk, valid=True)
    coords2 = transform(poses, patches, intrinsics, ii, jj, kk, tonly=True)

    flow1 = jnp.linalg.norm(coords1 - coords0, axis=-1)
    flow2 = jnp.linalg.norm(coords2 - coords0, axis=-1)
    return beta * flow1 + (1 - beta) * flow2, val > 0.5
