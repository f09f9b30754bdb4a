"""Lie groups SO3 / RxSO3 / SE3 / Sim3 in pure JAX.

Data layouts (trailing dim), identical to the reference lietorch embedding
(reference: cdvslam/lietorch/groups.py:234-311) so poses/checkpoints interop:

  SO3   (...,4)  [qx, qy, qz, qw]
  RxSO3 (...,5)  [qx, qy, qz, qw, s]
  SE3   (...,7)  [tx, ty, tz, qx, qy, qz, qw]
  Sim3  (...,8)  [tx, ty, tz, qx, qy, qz, qw, s]

Tangent layouts: SE3 = [tau(3), phi(3)], Sim3 = [tau(3), phi(3), sigma].

Everything is a pure function of arrays -- safe under jit/vmap/grad. A thin
pytree class wrapper (`SO3`, `SE3`, ...) provides the reference's operator
API (``G1 * G2``, ``G * point``, ``G.retr(xi)``). Unlike the reference
(which needs hand-written CUDA backward kernels,
cdvslam/lietorch/src/lietorch_gpu.cu), gradients here come from JAX autodiff
through the smooth embedding formulas; small-angle Taylor branches use the
double-where trick so grads are NaN-free at the identity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .quaternion import (
    EPS,
    hat,
    qconj,
    qmat,
    qmul,
    qnormalize,
    qrot,
    quat_exp,
    quat_log,
    so3_left_jacobian,
    so3_left_jacobian_inverse,
)

# --------------------------------------------------------------------------
# SO3
# --------------------------------------------------------------------------

so3_exp = quat_exp
so3_log = quat_log
so3_inv = qconj
so3_mul = qmul
so3_act = qrot
so3_matrix3 = qmat


def so3_identity(shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype), tuple(shape) + (4,))


def so3_adj(q, a):
    return qrot(q, a)


def so3_adjT(q, a):
    return qrot(qconj(q), a)


# --------------------------------------------------------------------------
# RxSO3
# --------------------------------------------------------------------------


def rxso3_identity(shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0], dtype), tuple(shape) + (5,))


def rxso3_exp(phi_sigma):
    """(...,4) [phi(3), sigma] -> (...,5). reference rxso3.h:168-188."""
    phi = phi_sigma[..., :3]
    sigma = phi_sigma[..., 3:4]
    q = quat_exp(phi)
    return jnp.concatenate([q, jnp.exp(sigma)], axis=-1)


def rxso3_log(data):
    q = data[..., :4]
    s = data[..., 4:5]
    return jnp.concatenate([quat_log(q), jnp.log(s)], axis=-1)


def rxso3_inv(data):
    q = data[..., :4]
    s = data[..., 4:5]
    return jnp.concatenate([qconj(q), 1.0 / s], axis=-1)


def rxso3_mul(a, b):
    return jnp.concatenate([qmul(a[..., :4], b[..., :4]), a[..., 4:5] * b[..., 4:5]], axis=-1)


def rxso3_act(data, p):
    return data[..., 4:5] * qrot(data[..., :4], p)


def rxso3_matrix3(data):
    return data[..., 4:5, None] * qmat(data[..., :4])


def _calcW_coeffs(theta_sq, sigma, dtype):
    """A, B, C coefficients of calcW (reference rxso3.h:190-233).

    Four-way branch on (|sigma| small) x (theta small), all computed with
    safe denominators then selected with nested where.
    """
    small_t = theta_sq < EPS * EPS
    small_s = jnp.abs(sigma) < EPS
    theta = jnp.sqrt(jnp.where(small_t, 1.0, theta_sq))
    theta_sq_safe = jnp.where(small_t, 1.0, theta_sq)
    sigma_safe = jnp.where(small_s, 1.0, sigma)
    scale = jnp.exp(sigma)

    # sigma small
    C_ss = jnp.ones_like(sigma)
    A_ss_t = 0.5 * jnp.ones_like(sigma)                       # theta small too
    B_ss_t = jnp.full_like(sigma, 1.0 / 6.0)
    A_ss = (1.0 - jnp.cos(theta)) / theta_sq_safe
    B_ss = (theta - jnp.sin(theta)) / (theta_sq_safe * theta)

    # sigma not small
    C_sl = (scale - 1.0) / sigma_safe
    sigma_sq = sigma_safe * sigma_safe
    A_sl_t = ((sigma_safe - 1.0) * scale + 1.0) / sigma_sq
    B_sl_t = (scale * 0.5 * sigma_sq + scale - 1.0 - sigma_safe * scale) / (sigma_sq * sigma_safe)
    a_ = scale * jnp.sin(theta)
    b_ = scale * jnp.cos(theta)
    c_ = theta_sq_safe + sigma * sigma
    A_sl = (a_ * sigma + (1.0 - b_) * theta) / (theta * c_)
    B_sl = (C_sl - ((b_ - 1.0) * sigma + a_ * theta) / c_) / theta_sq_safe

    A = jnp.where(small_s, jnp.where(small_t, A_ss_t, A_ss), jnp.where(small_t, A_sl_t, A_sl))
    B = jnp.where(small_s, jnp.where(small_t, B_ss_t, B_ss), jnp.where(small_t, B_sl_t, B_sl))
    C = jnp.where(small_s, C_ss, C_sl)
    return A, B, C


def rxso3_calcW(phi_sigma):
    """W matrix for Sim3 exp/log (reference rxso3.h:190-233)."""
    phi = phi_sigma[..., :3]
    sigma = phi_sigma[..., 3:4, None]
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    A, B, C = _calcW_coeffs(theta_sq, sigma, phi.dtype)
    Phi = hat(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return A * Phi + B * Phi2 + C * eye


def _calcWinv_coeffs(theta_sq, sigma, dtype):
    """a, b, c coefficients of calcWInv (reference rxso3.h:235-284)."""
    small_t = theta_sq < EPS
    small_s = (sigma * sigma) < EPS
    theta = jnp.sqrt(jnp.where(small_t, 1.0, theta_sq))
    theta_sq_safe = jnp.where(small_t, 1.0, theta_sq)
    scale = jnp.exp(sigma)
    scale_sq = scale * scale
    scale_cu = scale_sq * scale
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    scale_m1 = jnp.where(small_s, 1.0, scale - 1.0)

    # sigma small
    c_ss = 1.0 - 0.5 * sigma
    a_ss = jnp.full_like(sigma, -0.5)
    b_ss_t = jnp.full_like(sigma, 1.0 / 12.0)
    denom_b = 2.0 * theta_sq_safe * jnp.where(small_t, 1.0, cos_t - 1.0)
    b_ss = (theta * sin_t + 2.0 * cos_t - 2.0) / denom_b

    # sigma not small
    c_sl = sigma / scale_m1
    a_sl_t = (-sigma * scale + scale - 1.0) / (scale_m1 * scale_m1)
    denom_bt = jnp.where(small_s, 1.0, 2.0 * scale_cu - 6.0 * scale_sq + 6.0 * scale - 2.0)
    b_sl_t = (scale_sq * sigma - 2.0 * scale_sq + scale * sigma + 2.0 * scale) / denom_bt
    s_sin, s_cos = scale * sin_t, scale * cos_t
    denom_a = theta * jnp.where(small_s & small_t, 1.0, scale_sq - 2.0 * s_cos + 1.0)
    a_sl = (theta * s_cos - theta - sigma * s_sin) / denom_a
    denom_bl = theta_sq_safe * jnp.where(
        small_s & small_t, 1.0, scale_cu - 2.0 * scale * s_cos - scale_sq + 2.0 * s_cos + scale - 1.0
    )
    b_sl = -scale * (theta * s_sin - theta * sin_t + sigma * s_cos - scale * sigma + sigma * cos_t - sigma) / denom_bl

    a = jnp.where(small_s, a_ss, jnp.where(small_t, a_sl_t, a_sl))
    b = jnp.where(small_s, jnp.where(small_t, b_ss_t, b_ss), jnp.where(small_t, b_sl_t, b_sl))
    c = jnp.where(small_s, c_ss, c_sl)
    return a, b, c


def rxso3_calcWinv(phi_sigma):
    phi = phi_sigma[..., :3]
    sigma = phi_sigma[..., 3:4, None]
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    a, b, c = _calcWinv_coeffs(theta_sq, sigma, phi.dtype)
    Phi = hat(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return a * Phi + b * Phi2 + c * eye


def rxso3_adj(data, a):
    """Adj is identity except the rotation block (rxso3.h:70-74)."""
    return jnp.concatenate([qrot(data[..., :4], a[..., :3]), a[..., 3:4]], axis=-1)


def rxso3_adjT(data, a):
    return jnp.concatenate([qrot(qconj(data[..., :4]), a[..., :3]), a[..., 3:4]], axis=-1)


# --------------------------------------------------------------------------
# SE3
# --------------------------------------------------------------------------


def se3_identity(shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype), tuple(shape) + (7,)
    )


def se3_exp(tau_phi):
    """(...,6) -> (...,7). t = J_l(phi) tau (reference se3.h:134-142)."""
    tau = tau_phi[..., :3]
    phi = tau_phi[..., 3:6]
    q = quat_exp(phi)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(phi), tau)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(data):
    t = data[..., :3]
    q = data[..., 3:7]
    phi = quat_log(q)
    tau = jnp.einsum("...ij,...j->...i", so3_left_jacobian_inverse(phi), t)
    return jnp.concatenate([tau, phi], axis=-1)


def se3_inv(data):
    t = data[..., :3]
    q = data[..., 3:7]
    qi = qconj(q)
    return jnp.concatenate([-qrot(qi, t), qi], axis=-1)


def se3_mul(a, b):
    ta, qa = a[..., :3], a[..., 3:7]
    tb, qb = b[..., :3], b[..., 3:7]
    return jnp.concatenate([ta + qrot(qa, tb), qmul(qa, qb)], axis=-1)


def se3_act(data, p):
    return qrot(data[..., 3:7], p) + data[..., :3]


def se3_act4(data, p):
    """Homogeneous action: [R p3 + w t, w] (reference se3.h:53-56)."""
    p3, w = p[..., :3], p[..., 3:4]
    return jnp.concatenate([qrot(data[..., 3:7], p3) + w * data[..., :3], w], axis=-1)


def se3_matrix(data):
    R = qmat(data[..., 3:7])
    t = data[..., :3, None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], data.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_adj(data, a):
    """Adj(G) a with Adj = [[R, [t]x R], [0, R]] (reference se3.h:58-67)."""
    t, q = data[..., :3], data[..., 3:7]
    at, aphi = a[..., :3], a[..., 3:6]
    Raphi = qrot(q, aphi)
    out_t = qrot(q, at) + jnp.cross(t, Raphi)
    return jnp.concatenate([out_t, Raphi], axis=-1)


def se3_adjT(data, a):
    """Adj(G)^T a = [R^T a_t ; R^T (a_phi - t x a_t)].

    Matches the CUDA helper adjSE3 (reference fastba/ba_cuda.cu:57-72).
    """
    t, q = data[..., :3], data[..., 3:7]
    at, aphi = a[..., :3], a[..., 3:6]
    qi = qconj(q)
    return jnp.concatenate([qrot(qi, at), qrot(qi, aphi - jnp.cross(t, at))], axis=-1)


def se3_retr(data, xi):
    """Retraction Exp(xi) * G (reference groups.py:153-156)."""
    return se3_mul(se3_exp(xi), data)


def se3_calcQ(tau_phi):
    """Q matrix for the SE3 left Jacobian (reference se3.h:144-173)."""
    tau = tau_phi[..., :3]
    phi = tau_phi[..., 3:6]
    Tau, Phi = hat(tau), hat(phi)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    small = theta_sq < EPS * EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    theta_p4 = theta_sq * theta_sq
    t2s = jnp.where(small, 1.0, theta_sq)
    t4s = jnp.where(small, 1.0, theta_p4)
    coef1 = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (t2s * theta))
    coef2 = jnp.where(small, 1.0 / 24.0 - theta_sq / 720.0, (theta_sq + 2.0 * jnp.cos(theta) - 2.0) / (2.0 * t4s))
    coef3 = jnp.where(
        small,
        1.0 / 120.0 - theta_sq / 2520.0,
        (2.0 * theta - 3.0 * jnp.sin(theta) + theta * jnp.cos(theta)) / (2.0 * t4s * theta),
    )
    PT, TP = Phi @ Tau, Tau @ Phi
    PTP = PT @ Phi
    return (
        0.5 * Tau
        + coef1 * (PT + TP + PTP)
        + coef2 * (Phi @ PT + TP @ Phi - 3.0 * PTP)
        + coef3 * (PTP @ Phi + Phi @ PTP)
    )


def se3_left_jacobian(tau_phi):
    phi = tau_phi[..., 3:6]
    J = so3_left_jacobian(phi)
    Q = se3_calcQ(tau_phi)
    Z = jnp.zeros_like(J)
    top = jnp.concatenate([J, Q], axis=-1)
    bot = jnp.concatenate([Z, J], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_left_jacobian_inverse(tau_phi):
    phi = tau_phi[..., 3:6]
    Jinv = so3_left_jacobian_inverse(phi)
    Q = se3_calcQ(tau_phi)
    Z = jnp.zeros_like(Jinv)
    top = jnp.concatenate([Jinv, -Jinv @ Q @ Jinv], axis=-1)
    bot = jnp.concatenate([Z, Jinv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_scale(data, s):
    """Scale the translation part (reference groups.py:282-285)."""
    t = data[..., :3] * s[..., None]
    return jnp.concatenate([t, data[..., 3:7]], axis=-1)


# --------------------------------------------------------------------------
# Sim3
# --------------------------------------------------------------------------


def sim3_identity(shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0], dtype), tuple(shape) + (8,)
    )


def sim3_exp(xi):
    """(...,7) [tau, phi, sigma] -> (...,8). reference sim3.h:156-165."""
    tau = xi[..., :3]
    phi_sigma = xi[..., 3:7]
    rx = rxso3_exp(phi_sigma)
    W = rxso3_calcW(phi_sigma)
    t = jnp.einsum("...ij,...j->...i", W, tau)
    return jnp.concatenate([t, rx], axis=-1)


def sim3_log(data):
    t = data[..., :3]
    phi_sigma = rxso3_log(data[..., 3:8])
    Winv = rxso3_calcWinv(phi_sigma)
    tau = jnp.einsum("...ij,...j->...i", Winv, t)
    return jnp.concatenate([tau, phi_sigma], axis=-1)


def sim3_inv(data):
    t = data[..., :3]
    rx = data[..., 3:8]
    rxi = rxso3_inv(rx)
    return jnp.concatenate([-rxso3_act(rxi, t), rxi], axis=-1)


def sim3_mul(a, b):
    ta, rxa = a[..., :3], a[..., 3:8]
    tb, rxb = b[..., :3], b[..., 3:8]
    return jnp.concatenate([ta + rxso3_act(rxa, tb), rxso3_mul(rxa, rxb)], axis=-1)


def sim3_act(data, p):
    return rxso3_act(data[..., 3:8], p) + data[..., :3]


def sim3_act4(data, p):
    p3, w = p[..., :3], p[..., 3:4]
    return jnp.concatenate([rxso3_act(data[..., 3:8], p3) + w * data[..., :3], w], axis=-1)


def sim3_matrix(data):
    sR = rxso3_matrix3(data[..., 3:8])
    t = data[..., :3, None]
    top = jnp.concatenate([sR, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], data.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def sim3_adj(data, a):
    """Adj per reference sim3.h:89-101."""
    t = data[..., :3]
    q = data[..., 3:7]
    s = data[..., 7:8]
    at, aphi, asig = a[..., :3], a[..., 3:6], a[..., 6:7]
    Raphi = qrot(q, aphi)
    out_t = s * qrot(q, at) + jnp.cross(t, Raphi) - t * asig
    return jnp.concatenate([out_t, Raphi, asig], axis=-1)


def sim3_adjT(data, a):
    t = data[..., :3]
    q = data[..., 3:7]
    s = data[..., 7:8]
    at, aphi, asig = a[..., :3], a[..., 3:6], a[..., 6:7]
    qi = qconj(q)
    out_t = s * qrot(qi, at)
    out_phi = qrot(qi, aphi - jnp.cross(t, at))
    out_sig = asig - jnp.sum(t * at, axis=-1, keepdims=True)
    return jnp.concatenate([out_t, out_phi, out_sig], axis=-1)


def sim3_retr(data, xi):
    return sim3_mul(sim3_exp(xi), data)


# --------------------------------------------------------------------------
# Class wrappers (pytrees) with the reference operator API
# --------------------------------------------------------------------------


class _LieGroup:
    """Thin pytree wrapper mirroring the reference lietorch operator API."""

    embedded_dim: int
    manifold_dim: int
    _ops: dict

    def __init__(self, data):
        if isinstance(data, _LieGroup):
            data = data.data
        self.data = jnp.asarray(data)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # -- constructors --------------------------------------------------------
    @classmethod
    def Identity(cls, *batch_shape, dtype=jnp.float32):
        if batch_shape and isinstance(batch_shape[0], (tuple, list)):
            batch_shape = tuple(batch_shape[0])
        return cls(cls._ops["identity"](batch_shape, dtype))

    @classmethod
    def IdentityLike(cls, G):
        return cls.Identity(G.shape, dtype=G.data.dtype)

    @classmethod
    def exp(cls, xi):
        return cls(cls._ops["exp"](jnp.asarray(xi)))

    @classmethod
    def Random(cls, key, *batch_shape, sigma=1.0, dtype=jnp.float32):
        if batch_shape and isinstance(batch_shape[0], (tuple, list)):
            batch_shape = tuple(batch_shape[0])
        xi = sigma * jax.random.normal(key, tuple(batch_shape) + (cls.manifold_dim,), dtype)
        return cls.exp(xi)

    # -- core ops -------------------------------------------------------------
    @property
    def shape(self):
        return self.data.shape[:-1]

    def log(self):
        return self._ops["log"](self.data)

    def inv(self):
        return type(self)(self._ops["inv"](self.data))

    def mul(self, other):
        return type(self)(self._ops["mul"](self.data, other.data))

    def retr(self, xi):
        return type(self)(self._ops["mul"](self._ops["exp"](xi), self.data))

    def adj(self, a):
        return self._ops["adj"](self.data, a)

    def adjT(self, a):
        return self._ops["adjT"](self.data, a)

    def act(self, p):
        if p.shape[-1] == 3:
            return self._ops["act"](self.data, p)
        return self._ops["act4"](self.data, p)

    def matrix(self):
        return self._ops["matrix"](self.data)

    def translation(self):
        return self._ops["act4"](
            self.data, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0], self.data.dtype), self.data.shape[:-1] + (4,))
        )

    def normalize(self):
        """Renormalize the quaternion component (drift control)."""
        t = self.data[..., : self._qstart]
        q = qnormalize(self.data[..., self._qstart : self._qstart + 4])
        rest = self.data[..., self._qstart + 4 :]
        return type(self)(jnp.concatenate([t, q, rest], axis=-1))

    def __mul__(self, other):
        if isinstance(other, _LieGroup):
            return self.mul(other)
        return self.act(other)

    def __getitem__(self, index):
        return type(self)(self.data[index])

    def __repr__(self):
        return f"{type(self).__name__}(shape={self.shape}, dtype={self.data.dtype})"


class SO3(_LieGroup):
    embedded_dim, manifold_dim, _qstart = 4, 3, 0
    _ops = dict(
        identity=so3_identity, exp=so3_exp, log=so3_log, inv=so3_inv, mul=so3_mul,
        adj=so3_adj, adjT=so3_adjT, act=so3_act,
        act4=lambda d, p: jnp.concatenate([so3_act(d, p[..., :3]), p[..., 3:4]], -1),
        matrix=lambda d: qmat(d),
    )


class RxSO3(_LieGroup):
    embedded_dim, manifold_dim, _qstart = 5, 4, 0
    _ops = dict(
        identity=rxso3_identity, exp=rxso3_exp, log=rxso3_log, inv=rxso3_inv, mul=rxso3_mul,
        adj=rxso3_adj, adjT=rxso3_adjT, act=rxso3_act,
        act4=lambda d, p: jnp.concatenate([rxso3_act(d, p[..., :3]), p[..., 3:4]], -1),
        matrix=rxso3_matrix3,
    )


class SE3(_LieGroup):
    embedded_dim, manifold_dim, _qstart = 7, 6, 3
    _ops = dict(
        identity=se3_identity, exp=se3_exp, log=se3_log, inv=se3_inv, mul=se3_mul,
        adj=se3_adj, adjT=se3_adjT, act=se3_act, act4=se3_act4, matrix=se3_matrix,
    )

    def scale(self, s):
        return SE3(se3_scale(self.data, jnp.asarray(s)))


class Sim3(_LieGroup):
    embedded_dim, manifold_dim, _qstart = 8, 7, 3
    _ops = dict(
        identity=sim3_identity, exp=sim3_exp, log=sim3_log, inv=sim3_inv, mul=sim3_mul,
        adj=sim3_adj, adjT=sim3_adjT, act=sim3_act, act4=sim3_act4, matrix=sim3_matrix,
    )

    @classmethod
    def from_se3(cls, data):
        ones = jnp.ones_like(data[..., :1])
        return cls(jnp.concatenate([data, ones], axis=-1))


for _cls in (SO3, RxSO3, SE3, Sim3):
    jax.tree_util.register_pytree_node(_cls, _cls.tree_flatten, _cls.tree_unflatten)


def cat(groups, axis=0):
    return type(groups[0])(jnp.concatenate([g.data for g in groups], axis=axis))


def stack(groups, axis=0):
    return type(groups[0])(jnp.stack([g.data for g in groups], axis=axis))
