"""Recurrent update operators (the SLAM "brain").

Two variants, matching the reference:
  * ``UpdateDPV`` -- DPVO-style: corr MLP + temporal message passing +
    SoftAgg over patches and over (i,j) groups + gated-residual GRU
    (reference: cdvslam/net_dpv.py:27-92).
  * ``UpdateCDV`` -- CDV 'pa' variant: SoftAgg-ij + GRU replaced by
    per-(i,j)-group gated linear attention with Fourier RoPE
    (reference: cdvslam/net_cdv.py:29-156).

TPU design: all index bookkeeping (temporal neighbors ix/jx, segment ids,
(i,j)-group permutation) is precomputed host-side and passed in as fixed
-size arrays -- this removes the reference's per-iteration CPU roundtrip
through ``fastba.neighbors`` (reference fastba/ba.cpp:59-97, flagged in
SURVEY.md section 3.1 as a host sync) from the device hot loop.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from .blocks import MLP2, GatedResidual, SoftAgg, gradient_clip
from .attention import GatedAttention

DIM = 384


class UpdateAux(NamedTuple):
    """Host-precomputed index arrays for one update call (all fixed size).

    ix, jx:    (E,) temporal predecessor/successor edge index, -1 if none
    kseg:      (E,) patch segment ids in [0, n_kseg); padding -> n_kseg
    gseg:      (E,) (i,j)-group segment ids (DPVO agg_ij); padding -> n_gseg
    perm:      (G, M) edge indices grouping each (i,j) pair contiguously (CDV)
    inv_perm:  (E,) inverse of perm.flatten()
    mask:      (E,) valid-edge mask
    lattice:   optional (n_kseg, L) per-patch edge lattice (sentinel = E);
               when present agg_kk aggregates by lattice gathers instead
               of a materialized (n_kseg, E) one-hot (see blocks.SoftAgg)
    """
    ix: jnp.ndarray
    jx: jnp.ndarray
    kseg: jnp.ndarray
    gseg: Optional[jnp.ndarray]
    perm: Optional[jnp.ndarray]
    inv_perm: Optional[jnp.ndarray]
    mask: jnp.ndarray
    lattice: Optional[jnp.ndarray] = None


class _UpdateCommon(nn.Module):
    """Shared trunk: corr MLP, temporal messages, SoftAgg over patches."""
    p: int = 3

    @nn.compact
    def __call__(self, net, inp, corr, aux: UpdateAux, n_kseg: int):
        # explicitly named so checkpoint conversion maps torch `corr.N.*`
        # (convert.py) onto stable flax names
        corr_feat = nn.Dense(DIM, name="corr_0")(corr)
        corr_feat = nn.relu(corr_feat)
        corr_feat = nn.Dense(DIM, name="corr_2")(corr_feat)
        corr_feat = nn.LayerNorm(epsilon=1e-3, name="corr_3")(corr_feat)
        corr_feat = nn.relu(corr_feat)
        corr_feat = nn.Dense(DIM, name="corr_5")(corr_feat)

        net = net + inp + corr_feat
        net = nn.LayerNorm(epsilon=1e-3, name="norm")(net)

        mask_ix = (aux.ix >= 0).astype(net.dtype)[None, :, None]
        mask_jx = (aux.jx >= 0).astype(net.dtype)[None, :, None]
        gi = jnp.take(net, jnp.clip(aux.ix, 0, None), axis=1, mode="clip")
        net = net + MLP2(DIM, name="c1")(mask_ix * gi)
        # c2 gathers from the net AFTER the c1 message was added
        # (reference net_cdv.py:140-141 reassigns net between the gathers)
        gj = jnp.take(net, jnp.clip(aux.jx, 0, None), axis=1, mode="clip")
        net = net + MLP2(DIM, name="c2")(mask_jx * gj)

        net = net + SoftAgg(DIM, name="agg_kk")(
            net, aux.kseg, n_kseg, mask=aux.mask, lattice=aux.lattice)
        return net


class _Heads(nn.Module):
    @nn.compact
    def __call__(self, net):
        d = nn.Dense(2, name="d")(nn.relu(net))
        d = gradient_clip(d)
        w = nn.Dense(2, name="w")(nn.relu(net))
        w = nn.sigmoid(gradient_clip(w))
        return d, w


class UpdateDPV(nn.Module):
    """DPVO update operator (net_dpv.py:27-92)."""
    p: int = 3

    @nn.compact
    def __call__(self, net, inp, corr, aux: UpdateAux, n_kseg: int, n_gseg: int):
        net = _UpdateCommon(self.p, name="common")(net, inp, corr, aux, n_kseg)
        net = net + SoftAgg(DIM, name="agg_ij")(net, aux.gseg, n_gseg, mask=aux.mask)
        net = nn.LayerNorm(epsilon=1e-3)(net)
        net = GatedResidual(DIM)(net)
        net = nn.LayerNorm(epsilon=1e-3)(net)
        net = GatedResidual(DIM)(net)
        d, w = _Heads(name="heads")(net)
        return net, d, w


class UpdateCDV(nn.Module):
    """CDV 'pa' update operator (net_cdv.py:96-156)."""
    p: int = 3

    @nn.compact
    def __call__(self, net, inp, corr, aux: UpdateAux, n_kseg: int, posenc=None):
        net = _UpdateCommon(self.p, name="common")(net, inp, corr, aux, n_kseg)

        B, E, D = net.shape
        G, M = aux.perm.shape
        tokens = jnp.take(net[0], aux.perm.reshape(-1), axis=0, mode="clip").reshape(G, M, D)
        tokens = nn.LayerNorm(epsilon=1e-3, name="norm2")(tokens)
        enc = None
        if posenc is not None:
            # posenc: (2, 1, 1, E, D/8) per edge -> group layout (2, G, 1, M, D/8)
            enc = jnp.take(posenc[:, 0, 0], aux.perm.reshape(-1), axis=1, mode="clip")
            enc = enc.reshape(2, G, M, -1)[:, :, None]
        tokens = GatedAttention(DIM, name="gatten")(tokens, encoding=enc)
        net = jnp.take(tokens.reshape(G * M, D), aux.inv_perm, axis=0, mode="clip")[None]

        d, w = _Heads(name="heads")(net)
        return net, d, w


def build_update_aux(ii, jj, kk, k0, n_kseg, M=None, n_gseg=None, E_pad=None,
                     as_numpy=False):
    """Host-side construction of UpdateAux from numpy edge arrays.

    ii/jj/kk: active edges (E_valid,). k0: patch-window base. E_pad: pad to
    this many edges (static bucket). For CDV, M = patches per (i,j) group.
    """
    import numpy as np
    from ..ops.scatter import neighbors_np

    ii = np.asarray(ii)
    jj = np.asarray(jj)
    kk = np.asarray(kk)
    E = len(ii)
    E_pad = E_pad or E

    ix, jx = neighbors_np(kk, jj)

    kseg = np.clip(kk - k0, 0, None).astype(np.int32)
    kseg = np.where((kk - k0 >= 0) & (kk - k0 < n_kseg), kseg, n_kseg)

    gid_keys = ii.astype(np.int64) * 12345 + jj.astype(np.int64)
    uniq, gseg = np.unique(gid_keys, return_inverse=True)

    pad = E_pad - E
    def pade(a, fill):
        return np.concatenate([a, np.full(pad, fill, a.dtype)]) if pad else a

    mask = pade(np.ones(E, bool), False)
    ix = pade(ix, -1)
    jx = pade(jx, -1)
    kseg = pade(kseg.astype(np.int64), n_kseg)
    gseg_p = pade(gseg.astype(np.int64), (n_gseg if n_gseg else len(uniq)))

    perm = inv_perm = None
    if M is not None:
        assert E % M == 0, f"edge count {E} not a multiple of group size {M}"
        order = np.argsort(gid_keys, kind="stable")
        perm_v = order.reshape(-1, M)
        perm_v = np.sort(perm_v, axis=-1)
        # pad with dummy groups pointing at edge E (a padding slot)
        Gv = perm_v.shape[0]
        G_pad = E_pad // M
        if G_pad > Gv:
            dummy = np.full((G_pad - Gv, M), E if pad else 0, np.int64)
            perm_p = np.concatenate([perm_v, dummy], 0)
        else:
            perm_p = perm_v
        inv = np.zeros(E_pad, np.int64)
        inv[perm_v.reshape(-1)] = np.arange(E)
        # padding edges map to themselves (slots >= E in token space are
        # garbage but masked downstream)
        if pad:
            inv[E:] = np.arange(E, E_pad)
        perm, inv_perm = perm_p, inv

    if as_numpy:
        return UpdateAux(
            ix=ix.astype(np.int32), jx=jx.astype(np.int32),
            kseg=kseg.astype(np.int32), gseg=gseg_p.astype(np.int32),
            perm=perm.astype(np.int32) if perm is not None else None,
            inv_perm=inv_perm.astype(np.int32) if inv_perm is not None else None,
            mask=mask,
        )
    return UpdateAux(
        ix=jnp.asarray(ix, jnp.int32),
        jx=jnp.asarray(jx, jnp.int32),
        kseg=jnp.asarray(kseg, jnp.int32),
        gseg=jnp.asarray(gseg_p, jnp.int32),
        perm=jnp.asarray(perm, jnp.int32) if perm is not None else None,
        inv_perm=jnp.asarray(inv_perm, jnp.int32) if inv_perm is not None else None,
        mask=jnp.asarray(mask),
    )
