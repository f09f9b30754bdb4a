"""Block-sparse global BA must match the dense local BA exactly."""
import numpy as np
import jax
import jax.numpy as jnp

from cdvslam_tpu.lie import SE3
from cdvslam_tpu.geom import transform
from cdvslam_tpu.ba import ba_solve
from cdvslam_tpu.ba.global_ba import build_global_indices, global_ba_solve


def test_global_matches_dense():
    rng = np.random.RandomState(0)
    NF, M, P = 6, 8, 3
    key = jax.random.PRNGKey(0)
    gt = SE3.exp(0.05 * jax.random.normal(key, (1, NF, 6)))
    patches = np.zeros((NF * M, 3, P, P), np.float32)
    patches[:, 0] = rng.uniform(20, 100, NF * M)[:, None, None]
    patches[:, 1] = rng.uniform(20, 80, NF * M)[:, None, None]
    patches[:, 2] = rng.uniform(0.5, 1.5, NF * M)[:, None, None]
    patches = jnp.asarray(patches)
    intr = jnp.asarray([60.0, 60.0, 60.0, 50.0])

    ii, jj = np.meshgrid(np.arange(NF), np.arange(NF), indexing="ij")
    sel = ii != jj
    # drop some pairs so the graph is non-complete (tests entry indexing)
    pairs = np.stack([ii[sel], jj[sel]], -1)
    pairs = pairs[rng.rand(len(pairs)) > 0.3]
    ii_f = np.repeat(pairs[:, 0], M)
    jj_f = np.repeat(pairs[:, 1], M)
    kk_f = ii_f * M + np.tile(np.arange(M), len(pairs))

    coords = transform(gt, patches[None], jnp.tile(intr, (1, NF, 1)),
                       jnp.asarray(ii_f), jnp.asarray(jj_f), jnp.asarray(kk_f))
    target = coords[0, :, 1, 1, :]

    xi = 0.02 * rng.randn(NF, 6).astype(np.float32)
    xi[0] = 0
    poses0 = SE3.exp(jnp.asarray(xi)).mul(SE3(gt.data[0])).data
    pert = patches.at[:, 2].add(
        jnp.asarray(0.15 * rng.randn(NF * M).astype(np.float32))[:, None, None]
    )
    pert = pert.at[:, 2].set(jnp.clip(pert[:, 2], 0.1, None))
    weight = jnp.ones((len(ii_f), 2))
    mask = jnp.ones(len(ii_f), bool)

    # dense reference
    p_dense, d_dense = ba_solve(
        poses0, pert, intr, target, weight,
        jnp.asarray(ii_f, jnp.int32), jnp.asarray(jj_f, jnp.int32),
        jnp.asarray(kk_f, jnp.int32), mask, 1, N=NF - 1, K=NF * M, iterations=3,
    )

    # block-sparse
    idx = build_global_indices(ii_f, jj_f, kk_f, M)
    E_pad = idx["E_pad"]
    tgt_p = jnp.zeros((E_pad, 2)).at[: len(ii_f)].set(target)
    wgt_p = jnp.zeros((E_pad, 2)).at[: len(ii_f)].set(weight)
    p_glob, d_glob = global_ba_solve(
        poses0, pert, intr, tgt_p, wgt_p,
        jnp.asarray(idx["ii"], jnp.int32), jnp.asarray(idx["jj"], jnp.int32),
        jnp.asarray(idx["kk"], jnp.int32), jnp.asarray(idx["mask"]),
        jnp.asarray(idx["entry_x"], jnp.int32), jnp.asarray(idx["entry_s"], jnp.int32),
        jnp.asarray(idx["slot"], jnp.int32),
        jnp.asarray(idx["g_i"], jnp.int32), jnp.asarray(idx["g_j"], jnp.int32),
        jnp.asarray(idx["g_mask"]),
        jnp.asarray(idx["combo_g1"], jnp.int32), jnp.asarray(idx["combo_g2"], jnp.int32),
        jnp.asarray(idx["combo_mask"]),
        1, N=NF - 1, K=NF * M, M=M, G=idx["G_pad"], C=idx["C_pad"], iterations=3,
    )

    np.testing.assert_allclose(p_glob, p_dense, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(d_glob[:, 2, 1, 1], d_dense[:, 2, 1, 1], atol=2e-5, rtol=1e-4)
