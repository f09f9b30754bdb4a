"""Quaternion primitives (scalar-last layout ``[x, y, z, w]``).

Storage convention matches the reference framework's lietorch layout
(reference: cdvslam/lietorch/groups.py:234-311 -- SE3 data is
``[tx,ty,tz, qx,qy,qz,qw]``) so that checkpoints and trajectories interop.

All functions are pure, broadcast over leading dims, and are safe under
``jax.jit`` / ``jax.grad`` (the small-angle branches use the
"double-where" trick so gradients do not produce NaNs).
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def qmul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1*q2, scalar-last."""
    x1, y1, z1, w1 = jnp.split(q1, 4, axis=-1)
    x2, y2, z2, w2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def qconj(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(min=EPS)


def qrot(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vector(s) p by unit quaternion(s) q.

    Uses the uv = 2 (q_vec x p) expansion (reference:
    cdvslam/lietorch/include/so3.h:55-60) -- cheaper than matrix form.
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, p)
    return p + qw * uv + jnp.cross(qv, uv)


def qmat(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) from unit quaternion(s)."""
    x, y, z, w = jnp.split(q, 4, axis=-1)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.concatenate([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1)
    row1 = jnp.concatenate([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1)
    row2 = jnp.concatenate([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def hat(phi: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew matrix."""
    a, b, c = jnp.split(phi, 3, axis=-1)
    o = jnp.zeros_like(a)
    row0 = jnp.concatenate([o, -c, b], -1)
    row1 = jnp.concatenate([c, o, -a], -1)
    row2 = jnp.concatenate([-b, a, o], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """SO3 exponential map: rotation vector (...,3) -> unit quaternion (...,4).

    Matches reference so3.h:153-170 including the Taylor branch.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta_p4 = theta_sq * theta_sq
    small = theta_sq < EPS * EPS
    # exact branch with a safe theta to avoid 0/0 in grad
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    imag_exact = jnp.sin(0.5 * theta) / theta
    real_exact = jnp.cos(0.5 * theta)
    imag_taylor = 0.5 - (1.0 / 48.0) * theta_sq + (1.0 / 3840.0) * theta_p4
    real_taylor = 1.0 - (1.0 / 8.0) * theta_sq + (1.0 / 384.0) * theta_p4
    imag = jnp.where(small, imag_taylor, imag_exact)
    real = jnp.where(small, real_taylor, real_exact)
    return jnp.concatenate([imag * phi, real], axis=-1)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """SO3 logarithm map: unit quaternion -> rotation vector.

    Atan-based formulation (Hertzberg et al.), matching reference
    so3.h:115-151.
    """
    qv = q[..., :3]
    w = q[..., 3:4]
    squared_n = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = squared_n < EPS * EPS

    n = jnp.sqrt(jnp.where(small, 1.0, squared_n))
    w_safe = jnp.where(jnp.abs(w) < EPS, 1.0, w)
    atan_branch = 2.0 * jnp.arctan(n / w_safe) / n
    pi_branch = jnp.where(w > 0, jnp.pi, -jnp.pi) / n
    exact = jnp.where(jnp.abs(w) < EPS, pi_branch, atan_branch)
    taylor = 2.0 / w_safe - (2.0 / 3.0) * squared_n / (w_safe ** 3)
    two_atan_nbyw_by_n = jnp.where(small, taylor, exact)
    return two_atan_nbyw_by_n * qv


def so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO3 left Jacobian J_l(phi): (...,3) -> (...,3,3). so3.h:172-190."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    small = theta_sq < EPS * EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    coef1 = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta_sq))
    coef2 = jnp.where(
        small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta_sq * theta)
    )
    Phi = hat(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye + coef1 * Phi + coef2 * Phi2


def so3_left_jacobian_inverse(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse SO3 left Jacobian. so3.h:192-208."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    small = theta_sq < EPS * EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    half = 0.5 * theta
    coef2 = jnp.where(
        small,
        1.0 / 12.0,
        (1.0 - theta * jnp.cos(half) / (2.0 * jnp.sin(half))) / jnp.where(small, 1.0, theta_sq),
    )
    Phi = hat(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye - 0.5 * Phi + coef2 * Phi2
