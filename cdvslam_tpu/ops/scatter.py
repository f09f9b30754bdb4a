"""Segment (scatter) ops with fixed segment counts.

Replaces torch_scatter's scatter_softmax / scatter_sum (used by the
reference's SoftAgg, reference: cdvslam/blocks.py:31-48) and the
atomicAdd-based Hessian accumulation. On TPU these are deterministic
``jax.ops.segment_sum`` reductions -- a fidelity improvement over the
reference's nondeterministic atomics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(x, ids, num_segments):
    return jax.ops.segment_sum(x, ids, num_segments=num_segments)


def segment_max(x, ids, num_segments):
    return jax.ops.segment_max(x, ids, num_segments=num_segments)


def segment_softmax(x, ids, num_segments, mask=None):
    """Softmax over groups along axis 0. x: (E, ...), ids: (E,)."""
    if mask is not None:
        x = jnp.where(mask[(...,) + (None,) * (x.ndim - 1)], x, -jnp.inf)
    gmax = jax.ops.segment_max(x, ids, num_segments=num_segments)
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    ex = jnp.exp(x - gmax[ids])
    if mask is not None:
        ex = jnp.where(mask[(...,) + (None,) * (x.ndim - 1)], ex, 0.0)
    denom = jax.ops.segment_sum(ex, ids, num_segments=num_segments)
    return ex / jnp.clip(denom[ids], min=1e-12)


def segment_mean(x, ids, num_segments, mask=None):
    w = jnp.ones(x.shape[0], x.dtype) if mask is None else mask.astype(x.dtype)
    num = jax.ops.segment_sum(x * w[(...,) + (None,) * (x.ndim - 1)], ids, num_segments=num_segments)
    den = jax.ops.segment_sum(w, ids, num_segments=num_segments)
    return num / jnp.clip(den, min=1.0)[(...,) + (None,) * (x.ndim - 1)]


def neighbors_np(kk, jj):
    """Temporal predecessor/successor edge indices, host-side numpy.

    Re-implements the reference's C++ ``fastba.neighbors``
    (reference: cdvslam/fastba/ba.cpp:59-97): for every edge, find the edge
    with the same patch kk and the previous / next jj (stable order).
    Returns (ix, jx) int arrays with -1 where absent.
    """
    import numpy as np

    kk = np.asarray(kk)
    jj = np.asarray(jj)
    n = len(kk)
    ix = np.full(n, -1, dtype=np.int64)
    jx = np.full(n, -1, dtype=np.int64)
    order = np.lexsort((np.arange(n), jj, kk))  # group by kk, sort by jj (stable)
    ks = kk[order]
    same = np.zeros(n, dtype=bool)
    if n > 1:
        same[1:] = ks[1:] == ks[:-1]
    prev_edge = np.full(n, -1, dtype=np.int64)
    if n > 1:
        prev_edge[1:] = np.where(same[1:], order[:-1], -1)
    next_edge = np.full(n, -1, dtype=np.int64)
    if n > 1:
        next_edge[:-1] = np.where(same[1:], order[1:], -1)
    ix[order] = prev_edge
    jx[order] = next_edge
    return ix, jx
