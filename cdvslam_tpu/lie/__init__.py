"""Pure-JAX Lie groups (L0 of the framework).

Replaces the reference's lietorch CUDA/C++ extension
(reference: cdvslam/lietorch/) with branch-free, autodiff-friendly JAX.
"""
from .groups import (  # noqa: F401
    SO3, RxSO3, SE3, Sim3, cat, stack,
    so3_exp, so3_log, so3_inv, so3_mul, so3_act, so3_identity,
    rxso3_exp, rxso3_log, rxso3_inv, rxso3_mul, rxso3_act, rxso3_identity,
    rxso3_calcW, rxso3_calcWinv,
    se3_exp, se3_log, se3_inv, se3_mul, se3_act, se3_act4, se3_retr,
    se3_adj, se3_adjT, se3_matrix, se3_identity, se3_scale,
    sim3_exp, sim3_log, sim3_inv, sim3_mul, sim3_act, sim3_act4, sim3_retr,
    sim3_adj, sim3_adjT, sim3_matrix, sim3_identity,
)
from .quaternion import qmul, qconj, qrot, qmat, qnormalize, quat_exp, quat_log, hat  # noqa: F401
