"""Network module tests: shapes, determinism, update-operator mechanics."""
import jax
import jax.numpy as jnp
import numpy as np

from cdvslam_tpu.models import (
    VONet, CDVNet, build_update_aux, extract_patches, pyramidify,
    select_random, select_random_grid, SegHeadFlatten, DepthHeadFlatten,
)
from cdvslam_tpu.models.update import UpdateDPV, UpdateCDV

DIM = 384


def test_vonet_features_shapes():
    net = VONet()
    imgs = jnp.zeros((1, 64, 96, 3))
    params = net.init(jax.random.PRNGKey(0), imgs, method=VONet.features)
    fmap, imap = net.apply(params, imgs, method=VONet.features)
    assert fmap.shape == (1, 128, 16, 24)
    assert imap.shape == (1, 384, 16, 24)


def test_update_dpv_shapes_and_mask():
    E, M = 24, 4
    ii = np.repeat(np.arange(3), 8)
    jj = np.tile(np.arange(2), 12)
    kk = np.arange(E) % 12
    aux = build_update_aux(ii, jj, kk, k0=0, n_kseg=16, n_gseg=8, E_pad=32)
    net = jnp.zeros((1, 32, DIM))
    inp = jnp.ones((1, 32, DIM)) * 0.1
    corr = jnp.ones((1, 32, 2 * 49 * 9)) * 0.01
    mod = UpdateDPV()
    params = mod.init(jax.random.PRNGKey(0), net, inp, corr, aux, 16, 8)
    out, d, w = mod.apply(params, net, inp, corr, aux, 16, 8)
    assert out.shape == (1, 32, DIM)
    assert d.shape == (1, 32, 2) and w.shape == (1, 32, 2)
    assert float(jnp.min(w)) >= 0 and float(jnp.max(w)) <= 1
    assert not np.any(np.isnan(out))


def test_update_cdv_group_attention_permutation():
    """CDV update with (i,j) group attention: output must land back in
    edge order (perm then inverse perm round-trips)."""
    M = 4
    # 2 frames x 3 targets -> 6 groups of M edges
    ii = np.repeat([0, 0, 0, 1, 1, 1], M)
    jj = np.repeat([0, 1, 2, 0, 1, 2], M)
    kk = np.concatenate([np.tile(np.arange(M), 3), np.tile(4 + np.arange(M), 3)])
    E = len(ii)
    # shuffle edge order to stress the permutation
    rng = np.random.RandomState(0)
    sh = rng.permutation(E)
    ii, jj, kk = ii[sh], jj[sh], kk[sh]
    aux = build_update_aux(ii, jj, kk, k0=0, n_kseg=8, M=M, E_pad=E)
    # perm must group edges with identical (ii,jj)
    pii = ii[np.asarray(aux.perm)]
    pjj = jj[np.asarray(aux.perm)]
    assert (pii == pii[:, :1]).all() and (pjj == pjj[:, :1]).all()
    # inverse perm round trip
    flat = np.asarray(aux.perm).reshape(-1)
    inv = np.asarray(aux.inv_perm)
    np.testing.assert_array_equal(flat[inv[:E]], np.arange(E))

    net = jax.random.normal(jax.random.PRNGKey(1), (1, E, DIM)) * 0.1
    inp = jnp.zeros((1, E, DIM))
    corr = jnp.zeros((1, E, 2 * 49 * 9))
    posenc = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 1, E, DIM // 8)) * 0.1
    mod = UpdateCDV()
    params = mod.init(jax.random.PRNGKey(0), net, inp, corr, aux, 8, posenc)
    out, d, w = mod.apply(params, net, inp, corr, aux, 8, posenc=posenc)
    assert out.shape == (1, E, DIM) and not np.any(np.isnan(out))


def test_cdvnet_features():
    net = CDVNet()
    imgs = jnp.zeros((1, 64, 96, 3))  # multiple of 16 (stream crop invariant)
    p1 = net.init(jax.random.PRNGKey(0), imgs, method=CDVNet.features_f)
    f = net.apply(p1, imgs, method=CDVNet.features_f)
    assert f.shape == (1, 24, 16, 24)

    p2 = net.init(jax.random.PRNGKey(0), imgs, method=CDVNet.features_i)
    tmap, tn, tr, cls, score = net.apply(p2, imgs, method=CDVNet.features_i)
    # padded to 70x98 -> 5x7 token grid
    assert tmap.shape == (1, 384, 5, 7)
    assert tn.shape == (1, 35, 384) and cls.shape == (1, 384)


def test_extract_patches_and_pyramid():
    N, M, P = 2, 5, 3
    fmap = jnp.asarray(np.random.randn(N, 8, 16, 24).astype(np.float32))
    imap = jnp.asarray(np.random.randn(N, 384, 16, 24).astype(np.float32))
    images = jnp.zeros((N, 64, 96, 3))
    disps = jnp.ones((N, 16, 24))
    coords = select_random(jax.random.PRNGKey(0), N, M, 16, 24)
    gmap, ictx, clr, patches = extract_patches(fmap, imap, images, disps, coords, P)
    assert gmap.shape == (N, M, 8, P, P)
    assert ictx.shape == (N, M, 384)
    assert patches.shape == (N, M, 3, P, P)
    np.testing.assert_allclose(patches[:, :, 0, 1, 1], coords[..., 0], atol=1e-5)
    np.testing.assert_allclose(patches[:, :, 2], 1.0, atol=1e-6)

    pyr = pyramidify(fmap, (1, 4))
    assert pyr[0].shape == (N, 8, 16, 24) and pyr[1].shape == (N, 8, 4, 6)


def test_heads():
    seg = SegHeadFlatten(num_classes=150)
    x = jnp.zeros((7, 384))
    p = seg.init(jax.random.PRNGKey(0), x)
    out = seg.apply(p, x)
    assert out.shape == (7, 150)

    dep = DepthHeadFlatten()
    x2 = jnp.zeros((7, 768))
    p2 = dep.init(jax.random.PRNGKey(0), x2)
    d = dep.apply(p2, x2)
    assert d.shape == (7, 1)
    assert float(d.min()) >= dep.min_depth - 1e-3


def test_dpt_head():
    from cdvslam_tpu.models.dpt import DPTHead
    head = DPTHead()
    B, h, w = 1, 4, 5
    taps = [(jnp.zeros((B, h, w, 384)), jnp.zeros((B, 384))) for _ in range(4)]
    p = head.init(jax.random.PRNGKey(0), taps)
    out = head.apply(p, taps)
    # reassemble scales: x4 on first tap -> fusion chain doubles each stage
    assert out.shape[0] == B and out.shape[-1] == 1
    assert float(out.min()) >= head.min_depth - 1e-6


def test_dino_advance_matches_full_forward():
    """Incremental advance() (reference dinov2.py:302-331) reproduces the
    tapped full forward pre-norm tokens."""
    from cdvslam_tpu.models.dinov2 import DinoVisionTransformer as DinoViT

    vit = DinoViT(depth=4)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 28, 42, 3), jnp.float32)

    def initfn(m, x):
        outs = m(x, taps=(0, 1, 2, 3))
        m.norm_tokens(outs[-1])
        return outs

    p = vit.init(jax.random.PRNGKey(0), img, method=initfn)
    full = vit.apply(p, img, taps=(0, 1, 2, 3))
    t = img
    for i in range(4):
        t, out, cls = vit.apply(p, t, i, method=DinoViT.advance)
        np.testing.assert_allclose(np.asarray(t), np.asarray(full[i]),
                                   rtol=2e-5, atol=2e-5)
    # past-depth steps pass through
    t2, _, _ = vit.apply(p, t, 7, method=DinoViT.advance)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t))


def test_softagg_masked_row_does_not_collapse_output():
    """Softmax stabilization must ignore masked rows: a padded row with a
    huge logit used to shift the global max until real segments' exp
    underflowed and the aggregation collapsed toward zero."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cdvslam_tpu.models.blocks import SoftAgg

    rng = np.random.RandomState(0)
    E, D, S = 8, 16, 3
    x = jnp.asarray(rng.randn(1, E, D), jnp.float32)
    ids = jnp.asarray(rng.randint(0, S, E), jnp.int32)
    mask = jnp.asarray(np.array([True] * (E - 1) + [False]))

    mod = SoftAgg(D)
    params = mod.init(jax.random.PRNGKey(0), x, ids, S, mask)

    base = mod.apply(params, x, ids, S, mask)
    # poison the masked row with a giant value; output on valid rows must
    # be unchanged (the masked row must not shift the softmax max)
    x_poison = x.at[0, E - 1].set(1e4)
    got = mod.apply(params, x_poison, ids, S, mask)
    np.testing.assert_allclose(np.asarray(got[0, : E - 1]),
                               np.asarray(base[0, : E - 1]), atol=1e-5)
    assert np.abs(np.asarray(got[0, : E - 1])).max() > 1e-4

    # gradients through the poisoned input stay finite
    g = jax.grad(lambda p: jnp.sum(mod.apply(p, x_poison, ids, S, mask) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_softagg_lattice_matches_onehot():
    """The lattice aggregation backend (used by the fused SLAM update,
    which reuses the BA edge lattice) must reproduce the one-hot backend
    exactly up to f32 association order."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cdvslam_tpu.ba.ba import build_edge_lattice
    from cdvslam_tpu.models.blocks import SoftAgg

    rng = np.random.RandomState(4)
    E_real, E_pad, D, S = 37, 48, 16, 9
    x = jnp.asarray(rng.randn(1, E_pad, D), jnp.float32)
    ids_r = rng.randint(0, S, E_real)
    ids = jnp.asarray(np.concatenate(
        [ids_r, np.zeros(E_pad - E_real, np.int64)]), jnp.int32)
    mask = jnp.asarray(np.arange(E_pad) < E_real)

    lat = jnp.asarray(build_edge_lattice(
        ids_r, np.ones(E_real, bool), S, E_pad))

    mod = SoftAgg(D)
    params = mod.init(jax.random.PRNGKey(1), x, ids, S, mask)
    want = mod.apply(params, x, ids, S, mask=mask)
    got = mod.apply(params, x, ids, S, mask=mask, lattice=lat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    # gradient parity too (the training path would use whichever backend
    # the aux provides)
    def loss(p, use_lat):
        return jnp.sum(mod.apply(p, x, ids, S, mask=mask,
                                 lattice=lat if use_lat else None) ** 2)

    g1 = jax.grad(loss)(params, False)
    g2 = jax.grad(loss)(params, True)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
