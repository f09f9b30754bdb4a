"""NN building blocks (reference: cdvslam/blocks.py).

SoftAgg's torch_scatter softmax/sum becomes deterministic segment ops with
a static segment capacity (TPU-friendly fixed shapes + masking).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.scatter import segment_softmax, segment_sum


class MLP2(nn.Module):
    """Linear -> ReLU -> Linear (the reference's c1/c2 blocks)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim)(x)
        x = nn.relu(x)
        return nn.Dense(self.dim)(x)


class GatedResidual(nn.Module):
    """x + sigmoid(gate(x)) * res(x) (reference blocks.py:15-29)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        gate = nn.sigmoid(nn.Dense(self.dim)(x))
        res = nn.Dense(self.dim)(nn.relu(nn.Dense(self.dim)(x)))
        return x + gate * res


class SoftAgg(nn.Module):
    """Scatter-softmax attention pooling over index groups
    (reference blocks.py:31-48). ``ids`` must be pre-localized to
    [0, num_segments); masked elements get ids == num_segments.
    """
    dim: int
    expand: bool = True

    @nn.compact
    def __call__(self, x, ids, num_segments, mask=None, lattice=None):
        # x: (B, E, D); segment ops run on axis 0 of (E, D)
        B, E, D = x.shape
        f = nn.Dense(self.dim)(x)
        g = nn.Dense(self.dim)(x)

        # Two equivalent aggregation backends:
        #  * one-hot matmul (default): XLA lowers segment scatters to a
        #    serialized per-row scatter on TPU; a 0/1 matrix does the same
        #    sums on the MXU. Costs a materialized (S, E) one-hot -- at
        #    steady-state SLAM shapes (2688, 10240) that is ~330 MB of HBM
        #    traffic per update (round-5 HLO audit).
        #  * lattice (when the caller provides the host-built per-segment
        #    edge lattice, see ba.build_edge_lattice): fixed-shape gathers
        #    + short ordered sums, ~3x less HBM traffic and no (S, E)
        #    iota/eq/convert chains. Same sums, different association
        #    order (both accumulate in f32).
        # Softmax is stabilized by a single GLOBAL max in both (softmax is
        # shift-invariant, so the per-segment result is identical up to
        # float rounding).
        ids_m = ids if mask is None else jnp.where(mask, ids, num_segments)
        if lattice is None:
            io = jax.lax.broadcasted_iota(
                jnp.int32, (num_segments, ids.shape[0]), 0)
            oh = (io == ids_m[None, :]).astype(x.dtype)      # (S, E)

        def z_of(g1):
            # stabilize with the max over VALID rows only: a masked row
            # carrying a large logit would otherwise shift z until every
            # real segment's exp underflows and the aggregation collapses
            if mask is not None:
                gm = jnp.max(jnp.where(mask[:, None], g1, -jnp.inf))
                gm = jnp.where(jnp.isfinite(gm), gm, jnp.zeros((), g1.dtype))
                return jnp.where(mask[:, None],
                                 g1 - jax.lax.stop_gradient(gm), -1e9)
            return g1 - jax.lax.stop_gradient(jnp.max(g1))

        def agg(f1, g1):
            ex = jnp.exp(z_of(g1).astype(jnp.float32)).astype(f1.dtype)
            if mask is not None:
                ex = jnp.where(mask[:, None], ex, 0.0)
            denom = jax.lax.dot_general(
                oh, ex, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (S, D)
            w = ex / jnp.clip(jnp.take(denom, ids_m, axis=0, mode="clip"),
                              1e-12, None).astype(f1.dtype)
            return jax.lax.dot_general(
                oh, f1 * w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(f1.dtype)

        def agg_lat(f1, g1):
            # lattice rows list each segment's edge indices (sentinel = E
            # indexes the appended zero row); masked edges never appear
            ex = jnp.exp(z_of(g1).astype(jnp.float32)).astype(f1.dtype)
            if mask is not None:
                ex = jnp.where(mask[:, None], ex, 0.0)
            zrow = jnp.zeros((1, ex.shape[1]), ex.dtype)
            lat_ex = jnp.take(jnp.concatenate([ex, zrow]), lattice,
                              axis=0, mode="clip")           # (S, L, D)
            denom = jnp.sum(lat_ex.astype(jnp.float32), axis=1)  # (S, D)
            w = ex / jnp.clip(jnp.take(denom, ids_m, axis=0, mode="clip"),
                              1e-12, None).astype(f1.dtype)
            fw = f1 * w
            lat_fw = jnp.take(jnp.concatenate([fw, zrow]), lattice,
                              axis=0, mode="clip")
            return jnp.sum(lat_fw.astype(jnp.float32), axis=1).astype(f1.dtype)

        y = jax.vmap(agg_lat if lattice is not None else agg)(f, g)
        h = nn.Dense(self.dim)(y)
        if self.expand:
            return jnp.take(h, ids, axis=1, mode="clip")
        return h


@jax.custom_vjp
def gradient_clip(x):
    """Identity forward; backward NaN-zeroing + clamp to +-0.01
    (reference blocks.py:74-89). Matters for training stability only.
    """
    return x


def _gc_fwd(x):
    return x, None


def _gc_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.clip(g, -0.01, 0.01),)


gradient_clip.defvjp(_gc_fwd, _gc_bwd)


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps)(x)
