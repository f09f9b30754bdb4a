"""Numpy transcription of the REFERENCE CUDA bundle adjustment.

A slow, literal port of the reference solver's semantics
(reference: cdvslam/fastba/ba_cuda.cu) used ONLY as a test oracle:

  * per-edge residual/Jacobian math: reprojection_residuals_and_hessian
    (ba_cuda.cu:232-412) -- center-pixel homogeneous reprojection,
    left-retraction pose Jacobians, adjSE3 transpose for the i-side
  * validity gate: residual < 128 px, Z > 0.2, projection within
    [-64, 2c+64] (ba_cuda.cu:305-306)
  * assembly + Schur: dense B/E/C/v/u, Q = 1/(C + lmbda),
    S = B - E Q E^T, damping S.diag += 1e-4*diag(S) + 1 (ba_cuda.cu:575)
  * retractions: left SE3 retraction for window poses
    (pose_retr_kernel, ba_cuda.cu:178-206) and the depth clamps
    d>20 -> 1.0, max(d, 1e-4) (patch_retr_kernel, ba_cuda.cu:209-229)

This file deliberately re-derives everything in numpy (float64 linear
algebra like torch's cholesky path; float32 edge math like the kernel)
so a divergence between this and cdvslam_tpu.ba.ba_solve is a real
semantic difference, not shared code.
"""
from __future__ import annotations

import numpy as np


# ---- quaternion / SE3 helpers (transcribed from ba_cuda.cu:36-147) ----

def act_so3(q, X):
    """Rotate vectors X (..., 3) by quaternions q (..., 4) xyzw."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * np.cross(qv, X)
    return X + qw * uv + np.cross(qv, uv)


def rel_se3(ti, qi, tj, qj):
    """(tij, qij) = Gj * Gi^-1 (ba_cuda.cu:75-88)."""
    # qij = qj * conj(qi)
    xi, yi, zi, wi = qi[..., 0], qi[..., 1], qi[..., 2], qi[..., 3]
    xj, yj, zj, wj = qj[..., 0], qj[..., 1], qj[..., 2], qj[..., 3]
    qij = np.stack([
        -wj * xi + xj * wi - yj * zi + zj * yi,
        -wj * yi + yj * wi - zj * xi + xj * zi,
        -wj * zi + zj * wi - xj * yi + yj * xi,
        wj * wi + xj * xi + yj * yi + zj * zi,
    ], axis=-1)
    tij = tj - act_so3(qij, ti)
    return tij, qij


def adj_se3_T(t, q, X):
    """Y = Adj^T(G) X for 6-vectors X (ba_cuda.cu:58-73)."""
    qinv = np.concatenate([-q[..., :3], q[..., 3:]], axis=-1)
    Ya = act_so3(qinv, X[..., :3])
    Yb = act_so3(qinv, X[..., 3:])
    u = np.cross(t, X[..., :3])
    # NOTE ba_cuda.cu computes u = t x X with components
    # (t2 X1 - t1 X2, ...) which is -(t x X) in the usual convention
    u = -u
    Yb = Yb + act_so3(qinv, u)
    return np.concatenate([Ya, Yb], axis=-1)


def exp_so3(phi):
    theta_sq = float(phi @ phi)
    theta = np.sqrt(theta_sq)
    if theta_sq < 1e-8:
        imag = 0.5 - (1.0 / 48.0) * theta_sq + (1.0 / 3840.0) * theta_sq ** 2
        real = 1.0 - (1.0 / 8.0) * theta_sq + (1.0 / 384.0) * theta_sq ** 2
    else:
        imag = np.sin(0.5 * theta) / theta
        real = np.cos(0.5 * theta)
    return np.array([imag * phi[0], imag * phi[1], imag * phi[2], real])


def exp_se3(xi):
    tau, phi = xi[:3].copy(), xi[3:]
    q = exp_so3(phi)
    theta_sq = float(phi @ phi)
    theta = np.sqrt(theta_sq)
    t = tau.copy()
    if theta > 1e-4:
        a = (1 - np.cos(theta)) / theta_sq
        c1 = np.cross(phi, tau)
        t = t + a * c1
        b = (theta - np.sin(theta)) / (theta * theta_sq)
        c2 = np.cross(phi, c1)
        t = t + b * c2
    return t, q


def retr_se3(xi, t, q):
    """Left retraction Exp(xi) * G (ba_cuda.cu:157-175)."""
    dt, dq = exp_se3(xi)
    # q1 = dq * q
    x0, y0, z0, w0 = q
    xd, yd, zd, wd = dq
    q1 = np.array([
        wd * x0 + xd * w0 + yd * z0 - zd * y0,
        wd * y0 + yd * w0 + zd * x0 - xd * z0,
        wd * z0 + zd * w0 + xd * y0 - yd * x0,
        wd * w0 - xd * x0 - yd * y0 - zd * z0,
    ])
    t1 = act_so3(dq[None], t[None])[0] + dt
    return t1, q1


# ---- the solver (cuda_ba, ba_cuda.cu:462-611, dense-E path) ----

def ba_numpy_reference(poses, patches, intrinsics, target, weight,
                       ii, jj, kk, t0, t1, iterations=2, lmbda=1e-4):
    """Literal numpy port of the reference inference BA.

    poses (NP, 7) [tx ty tz qx qy qz qw] world->cam; patches (K, 3, P, P)
    with channel 2 = inverse depth; kk indexes into patches. Poses in
    [t0, t1) are optimized; all edges contribute. Returns (poses,
    patches) copies.
    """
    poses = np.array(poses, np.float32)
    patches = np.array(patches, np.float32)
    target = np.asarray(target, np.float32)
    weight = np.asarray(weight, np.float32)
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    kk = np.asarray(kk)
    fx, fy, cx, cy = [float(x) for x in np.asarray(intrinsics)[:4]]
    P = patches.shape[-1]

    kx, ku = np.unique(kk, return_inverse=True)
    N = t1 - t0
    M = len(kx)

    for _ in range(iterations):
        B = np.zeros((6 * N, 6 * N), np.float64)
        E = np.zeros((6 * N, M), np.float64)
        C = np.zeros(M, np.float64)
        v = np.zeros(6 * N, np.float64)
        u = np.zeros(M, np.float64)

        for n in range(len(ii)):
            k = ku[n]
            ix_g, jx_g, kxn = int(ii[n]), int(jj[n]), int(kk[n])
            ti, qi = poses[ix_g, :3], poses[ix_g, 3:]
            tj, qj = poses[jx_g, :3], poses[jx_g, 3:]
            Xi = np.array([
                (patches[kxn, 0, P // 2, P // 2] - cx) / fx,
                (patches[kxn, 1, P // 2, P // 2] - cy) / fy,
                1.0,
                patches[kxn, 2, P // 2, P // 2],
            ], np.float32)
            tij, qij = rel_se3(ti, qi, tj, qj)
            Xj3 = act_so3(qij[None], Xi[None, :3])[0] + Xi[3] * tij
            X, Y, Z = [float(x) for x in Xj3]
            W = float(Xi[3])

            d = 1.0 / Z if Z >= 0.2 else 0.0
            d2 = d * d
            x1 = fx * (X / Z) + cx
            y1 = fy * (Y / Z) + cy
            rx = float(target[n, 0]) - x1
            ry = float(target[n, 1]) - y1
            in_bounds = (np.sqrt(rx * rx + ry * ry) < 128) and (Z > 0.2) and \
                (x1 > -64) and (y1 > -64) and (x1 < 2 * cx + 64) and (y1 < 2 * cy + 64)
            mask = 1.0 if in_bounds else 0.0

            ix = ix_g - t0
            jx = jx_g - t0

            for row in range(2):
                if row == 0:
                    r = rx
                    w = mask * float(weight[n, 0])
                    Jz = fx * (tij[0] * d - tij[2] * X * d2)
                    Jj = np.array([fx * W * d, 0.0, -fx * X * W * d2,
                                   -fx * X * Y * d2, fx * (1.0 + X * X * d2),
                                   -fx * Y * d])
                else:
                    r = ry
                    w = mask * float(weight[n, 1])
                    Jz = fy * (tij[1] * d - tij[2] * Y * d2)
                    Jj = np.array([0.0, fy * W * d, -fy * Y * W * d2,
                                   -fy * (1.0 + Y * Y * d2), fy * X * Y * d2,
                                   fy * X * d])
                Ji = adj_se3_T(tij[None], qij[None], Jj[None])[0]

                if ix >= 0:
                    B[6 * ix:6 * ix + 6, 6 * ix:6 * ix + 6] += w * np.outer(Ji, Ji)
                if jx >= 0:
                    B[6 * jx:6 * jx + 6, 6 * jx:6 * jx + 6] += w * np.outer(Jj, Jj)
                if ix >= 0 and jx >= 0:
                    cross = -w * np.outer(Ji, Jj)
                    B[6 * ix:6 * ix + 6, 6 * jx:6 * jx + 6] += cross
                    B[6 * jx:6 * jx + 6, 6 * ix:6 * ix + 6] += cross.T
                if ix >= 0:
                    E[6 * ix:6 * ix + 6, k] += -w * Jz * Ji
                    v[6 * ix:6 * ix + 6] += -w * r * Ji
                if jx >= 0:
                    E[6 * jx:6 * jx + 6, k] += w * Jz * Jj
                    v[6 * jx:6 * jx + 6] += w * r * Jj
                C[k] += w * Jz * Jz
                u[k] += w * r * Jz

        Q = 1.0 / (C + lmbda)

        if N == 0:
            dZ = Q * u
        else:
            EQ = E * Q[None, :]
            S = B - EQ @ E.T
            y = v - EQ @ u
            S = S + np.diag(1e-4 * np.diag(S) + 1.0)
            try:
                dX = np.linalg.solve(S, y)
            except np.linalg.LinAlgError:
                dX = np.zeros(6 * N)
            dZ = Q * (u - E.T @ dX)
            for i in range(N):
                t_, q_ = retr_se3(dX[6 * i:6 * i + 6].astype(np.float32),
                                  poses[t0 + i, :3], poses[t0 + i, 3:])
                poses[t0 + i, :3] = t_
                poses[t0 + i, 3:] = q_

        # patch_retr_kernel clamps (ba_cuda.cu:218-221)
        for m, kxn in enumerate(kx):
            dnew = patches[kxn, 2, 0, 0] + dZ[m]
            if dnew > 20:
                dnew = 1.0
            dnew = max(dnew, 1e-4)
            patches[kxn, 2] = dnew

    return poses, patches
