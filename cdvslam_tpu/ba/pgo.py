"""Sim3 pose-graph optimization (the classical loop-closure solver).

Replaces the reference's pypose + Eigen-sparse-Cholesky PGO
(reference: cdvslam/loop_closure/optim_utils.py:153-244 and
fastba/ba.cpp:120-180) with a jittable Levenberg-Marquardt solver:

  state      Ginv = Log(Sim3(inv(poses)))          (n, 7) tangent
  residual   r_c  = Log(C_c * Exp(Ginv[i_c]) * Exp(Ginv[j_c])^-1)
  constants  consecutive-frame relatives + Sim3 loop measurements

Jacobians come from vmapped forward-mode autodiff (the reference uses
torch.autograd.functional.jacobian); the sparse normal equations are
assembled with segment_sum into a dense (7n x 7n) SPD system -- n is the
keyframe count, small enough for a dense Cholesky on the MXU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import (
    Sim3, se3_inv, sim3_exp, sim3_inv, sim3_log, sim3_mul,
)


def se3_to_sim3(data):
    return jnp.concatenate([data, jnp.ones_like(data[..., :1])], axis=-1)


def _residual_one(C, gi, gj):
    """Log(C * Exp(gi) * Exp(gj)^-1) for one constraint (optim_utils.py:159-162)."""
    X = sim3_mul(C, sim3_mul(sim3_exp(gi), sim3_inv(sim3_exp(gj))))
    return sim3_log(X)


_res_and_jac = jax.vmap(
    lambda C, gi, gj: (
        _residual_one(C, gi, gj),
        jax.jacfwd(_residual_one, argnums=1)(C, gi, gj),
        jax.jacfwd(_residual_one, argnums=2)(C, gi, gj),
    )
)


@partial(jax.jit, static_argnames=("n",))
def _pgo_step(Ginv, constants, iii, jjj, lmbda, ep, *, n):
    """One LM iteration: returns (delta, residual_sq_mean)."""
    gi = jnp.take(Ginv, iii, axis=0, mode="clip")
    gj = jnp.take(Ginv, jjj, axis=0, mode="clip")
    r, Ji, Jj = _res_and_jac(constants, gi, gj)           # (R,7), (R,7,7)

    # normal equations A = J^T J (block structure over (i, j) pairs)
    bad = n * n

    def bid(a, b):
        return jnp.clip(a, 0, n - 1) * n + jnp.clip(b, 0, n - 1)

    JiTJi = jnp.einsum("rab,rac->rbc", Ji, Ji)
    JjTJj = jnp.einsum("rab,rac->rbc", Jj, Jj)
    JiTJj = jnp.einsum("rab,rac->rbc", Ji, Jj)
    A = jax.ops.segment_sum(
        jnp.concatenate([JiTJi, JjTJj, JiTJj, jnp.swapaxes(JiTJj, 1, 2)], 0),
        jnp.concatenate([bid(iii, iii), bid(jjj, jjj), bid(iii, jjj), bid(jjj, iii)], 0),
        num_segments=bad,
    ).reshape(n, n, 7, 7).transpose(0, 2, 1, 3).reshape(7 * n, 7 * n)

    bi = -jnp.einsum("rab,ra->rb", Ji, r)
    bj = -jnp.einsum("rab,ra->rb", Jj, r)
    b = jax.ops.segment_sum(
        jnp.concatenate([bi, bj], 0),
        jnp.concatenate([jnp.clip(iii, 0, n - 1), jnp.clip(jjj, 0, n - 1)], 0),
        num_segments=n,
    ).reshape(7 * n)

    # damping (reference ba.cpp:166-167): A.diag *= (1+lm); A.diag += ep
    A = A + jnp.diag(lmbda * jnp.diag(A) + ep + 1e-8)
    L, low = jax.scipy.linalg.cho_factor(A, lower=True)
    delta = jax.scipy.linalg.cho_solve((L, low), b)
    delta = jnp.where(jnp.any(jnp.isnan(delta)), 0.0, delta)
    return delta.reshape(n, 7), jnp.mean(r * r)


@partial(jax.jit, static_argnames=("n",))
def _resid_sq(Ginv, constants, iii, jjj, *, n):
    gi = jnp.take(Ginv, iii, axis=0, mode="clip")
    gj = jnp.take(Ginv, jjj, axis=0, mode="clip")
    r = jax.vmap(_residual_one)(constants, gi, gj)
    return jnp.mean(r * r)


def perform_updates(input_poses, dSloop, ii_loop, jj_loop, iters=30,
                    ep=0.0, lmbda=1e-6):
    """LM loop (reference optim_utils.py:212-244). Host-side control flow
    (adaptive lambda); the heavy step is jitted.

    input_poses: (n, 7) SE3 world->cam (the patch-graph convention).
    dSloop: (L, 8) Sim3 loop measurements mapping points in camera
    ii_loop's frame to camera jj_loop's frame (the RANSAC-Umeyama output,
    reference long_term.py:243-249).

    FRAME CONVENTION (reference optim_utils.py:165-180): the optimized
    state Ginv is the log of the WORLD->CAM Sim3 (the reference receives
    cam->world `pred_poses` and immediately inverts). The loop residual
    Log(C Exp(g_i) Exp(g_j)^-1) then vanishes when C = G_j G_i^-1 with
    G = world->cam -- which IS the physical cam_i->cam_j measurement.
    Parameterizing cam->world instead (an earlier bug) demands the
    CONJUGATE G_j^-1 G_i, silently applying the measured correction in
    the wrong frame (rotated by the absolute pose).

    Returns (n, 8) world->cam Sim3 corrected poses.
    """
    n = input_poses.shape[0]
    pred_inv = se3_to_sim3(np.asarray(input_poses))        # world->cam
    Ginv = np.asarray(sim3_log(jnp.asarray(pred_inv)))

    kk = np.arange(1, n)
    ll = kk - 1
    Ti = jnp.asarray(pred_inv[kk])
    Tj = jnp.asarray(pred_inv[ll])
    dSij = np.asarray(sim3_mul(Tj, sim3_inv(Ti)))

    constants = jnp.asarray(np.concatenate([dSij, np.asarray(dSloop)], 0))
    iii = jnp.asarray(np.concatenate([kk, np.asarray(ii_loop)]), jnp.int32)
    jjj = jnp.asarray(np.concatenate([ll, np.asarray(jj_loop)]), jnp.int32)

    Ginv = jnp.asarray(Ginv)
    hist = []
    for itr in range(iters):
        delta, rsq = _pgo_step(Ginv, constants, iii, jjj, lmbda, ep, n=n)
        hist.append(float(rsq))
        G_tmp = Ginv + delta
        new_rsq = float(_resid_sq(G_tmp, constants, iii, jjj, n=n))
        if new_rsq < hist[-1]:
            Ginv = G_tmp
            lmbda /= 2
        else:
            lmbda *= 2
        if hist[-1] < 1e-5 and itr >= 4 and (hist[-5] / max(hist[-1], 1e-30)) < 1.5:
            break

    return np.asarray(sim3_exp(Ginv))


def run_pgo(pred_poses, loop_poses, loop_ii, loop_jj, iters=30):
    """Full PGO call incl. re-anchoring (reference optim_utils.py:203-210).

    pred_poses: (n, 7) SE3 world->cam. Returns (safe_i, corrected
    (safe_i, 8) world->cam Sim3 poses). The anchor keeps pose safe_i at
    its pre-correction value; in the world->cam frame the gauge transform
    acts on the world side, i.e. by RIGHT multiplication (equivalent to
    the reference's left-anchoring of the cam->world estimates).
    """
    final = perform_updates(pred_poses, loop_poses, loop_ii, loop_jj, iters)
    safe_i = int(np.asarray(loop_ii).max()) + 1
    aa = se3_to_sim3(np.asarray(pred_poses))
    ai = min(safe_i, len(aa) - 1)   # anchor row (loop at the last pose)
    anchor = np.asarray(
        sim3_mul(sim3_inv(jnp.asarray(final[ai])), jnp.asarray(aa[ai]))
    )
    out = np.asarray(sim3_mul(jnp.asarray(final), jnp.asarray(anchor)[None]))
    return safe_i, out[:safe_i]
