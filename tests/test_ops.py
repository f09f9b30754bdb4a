"""patchify / corr tests vs. a direct numpy oracle of the CUDA semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from cdvslam_tpu.ops import patchify, corr, neighbors_np


def _np_patchify_raw(net, coords, R):
    """Oracle for the raw gather (correlation_kernel.cu:17-47)."""
    N, C, H, W = net.shape
    M = coords.shape[1]
    D = 2 * R + 2
    out = np.zeros((N, M, C, D, D), net.dtype)
    for n in range(N):
        for m in range(M):
            x, y = coords[n, m]
            for di in range(D):
                for dj in range(D):
                    i = int(np.floor(y)) + di - R
                    j = int(np.floor(x)) + dj - R
                    if 0 <= i < H and 0 <= j < W:
                        out[n, m, :, di, dj] = net[n, :, i, j]
    return out


def test_patchify_raw_and_bilinear():
    rng = np.random.RandomState(0)
    net = rng.randn(2, 5, 16, 20).astype(np.float32)
    coords = np.stack(
        [rng.uniform(-2, 21, size=(2, 7)), rng.uniform(-2, 17, size=(2, 7))], axis=-1
    ).astype(np.float32)
    R = 1
    raw = np.asarray(patchify(jnp.asarray(net), jnp.asarray(coords), R, mode="raw"))
    oracle = _np_patchify_raw(net, coords, R)
    np.testing.assert_allclose(raw, oracle, atol=1e-6)

    # bilinear blend oracle
    d = 2 * R + 1
    dx = (coords[..., 0] - np.floor(coords[..., 0]))[..., None, None, None]
    dy = (coords[..., 1] - np.floor(coords[..., 1]))[..., None, None, None]
    expect = (
        (1 - dy) * (1 - dx) * oracle[..., :d, :d]
        + (1 - dy) * dx * oracle[..., :d, 1:]
        + dy * (1 - dx) * oracle[..., 1:, :d]
        + dy * dx * oracle[..., 1:, 1:]
    )
    got = np.asarray(patchify(jnp.asarray(net), jnp.asarray(coords), R, mode="bilinear"))
    np.testing.assert_allclose(got, expect, atol=1e-5)

    ul = np.asarray(patchify(jnp.asarray(net), jnp.asarray(coords), R, mode="upperleft"))
    np.testing.assert_allclose(ul, oracle[..., R : R + 1, R : R + 1], atol=1e-6)


def test_patchify_grad_is_scatter():
    rng = np.random.RandomState(1)
    net = jnp.asarray(rng.randn(1, 3, 12, 12).astype(np.float32))
    coords = jnp.asarray(rng.uniform(2, 9, size=(1, 4, 2)).astype(np.float32))

    def f(n):
        return jnp.sum(patchify(n, coords, 1, mode="bilinear") ** 2)

    g = jax.grad(f)(net)
    assert g.shape == net.shape and not np.any(np.isnan(g))


def _np_corr(gmap, fmap, coords, ii, jj, R):
    """Oracle for corr (correlation_kernel.cu:83-136 + blend + permute)."""
    B, K, C, P, _ = gmap.shape
    _, NF, _, H, W = fmap.shape
    E = coords.shape[1]
    D = 2 * R + 2
    vol = np.zeros((E, D, D, P, P), np.float32)
    for e in range(E):
        for p in range(P):
            for q in range(P):
                x, y = coords[0, e, 0, p, q], coords[0, e, 1, p, q]
                for di in range(D):
                    for dj in range(D):
                        i1 = int(np.floor(y)) + di - R
                        j1 = int(np.floor(x)) + dj - R
                        if 0 <= i1 < H and 0 <= j1 < W:
                            vol[e, di, dj, p, q] = np.dot(
                                gmap[0, ii[e], :, p, q], fmap[0, jj[e], :, i1, j1]
                            )
    x = coords[0, :, 0]
    y = coords[0, :, 1]
    dx = (x - np.floor(x))[:, None, None]
    dy = (y - np.floor(y))[:, None, None]
    out = (
        (1 - dx) * (1 - dy) * vol[:, : D - 1, : D - 1]
        + dx * (1 - dy) * vol[:, : D - 1, 1:]
        + (1 - dx) * dy * vol[:, 1:, : D - 1]
        + dx * dy * vol[:, 1:, 1:]
    )
    return out.transpose(0, 2, 1, 3, 4)[None]


def test_corr_oracle():
    rng = np.random.RandomState(2)
    K, C, P, NF, H, W, E, R = 6, 8, 3, 4, 14, 18, 10, 2
    gmap = rng.randn(1, K, C, P, P).astype(np.float32)
    fmap = rng.randn(1, NF, C, H, W).astype(np.float32)
    coords = np.stack(
        [rng.uniform(-1, W, size=(1, E, P, P)), rng.uniform(-1, H, size=(1, E, P, P))],
        axis=2,
    ).astype(np.float32)
    ii = rng.randint(0, K, size=E)
    jj = rng.randint(0, NF, size=E)
    got = np.asarray(
        corr(jnp.asarray(gmap), jnp.asarray(fmap), jnp.asarray(coords),
             jnp.asarray(ii), jnp.asarray(jj), radius=R, chunk=4)
    )
    expect = _np_corr(gmap, fmap, coords, ii, jj, R)
    np.testing.assert_allclose(got, expect, atol=2e-4, rtol=1e-4)


def test_neighbors_matches_reference_semantics():
    # example: patches with multiple target frames
    kk = np.array([5, 5, 5, 2, 2, 9])
    jj = np.array([3, 1, 2, 7, 4, 0])
    ix, jx = neighbors_np(kk, jj)
    # patch 5 edges sorted by jj: e1(j=1) -> e2(j=2) -> e0(j=3)
    assert ix[1] == -1 and jx[1] == 2
    assert ix[2] == 1 and jx[2] == 0
    assert ix[0] == 2 and jx[0] == -1
    # patch 2: e4(j=4) -> e3(j=7)
    assert ix[4] == -1 and jx[4] == 3
    assert ix[3] == 4 and jx[3] == -1
    # singleton
    assert ix[5] == -1 and jx[5] == -1


def test_corr_pallas_interpret_matches_xla():
    """Pallas kernel parity vs the XLA op (interpret mode on CPU)."""
    from unittest import mock
    from jax.experimental import pallas as pl
    import cdvslam_tpu.ops.corr_pallas as cp

    rng = np.random.RandomState(5)
    K, C, P, NF, H, W, E, R = 6, 8, 3, 4, 16, 20, 10, 2
    gmap = jnp.asarray(rng.randn(1, K, C, P, P), jnp.float32)
    fmap = jnp.asarray(rng.randn(1, NF, C, H, W), jnp.float32)
    coords = jnp.asarray(np.stack(
        [rng.uniform(-2, W + 2, (1, E, P, P)), rng.uniform(-2, H + 2, (1, E, P, P))],
        axis=2), jnp.float32)
    ii = jnp.asarray(rng.randint(0, K, E), jnp.int32)
    jj = jnp.asarray(rng.randint(0, NF, E), jnp.int32)

    orig_call = pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig_call(*a, **kw)

    with mock.patch.object(cp.pl, "pallas_call", interp_call):
        got = cp.corr_pallas(gmap, fmap, coords, ii, jj, radius=R)
    ref = corr(gmap, fmap, coords, ii, jj, radius=R, chunk=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)

    # host-plan path (the runtime ships the plan in the packed upload)
    E_pad = cp.corr_epad(E, NF)
    order, jj_steps, inv = cp.plan_corr_order(np.asarray(jj), NF, E_pad)
    plan = tuple(map(jnp.asarray, (order, jj_steps, inv)))
    with mock.patch.object(cp.pl, "pallas_call", interp_call):
        got2 = cp.corr_pallas(gmap, fmap, coords, ii, jj, radius=R, plan=plan)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_corr_pallas_fallback_does_not_poison_frame_cache():
    """A slow-path edge re-fetches its own frame into the VMEM cache; the
    next grid step must not skip its fetch based on adjacent jjs entries
    alone (regression: fast path read the fallback edge's frame)."""
    from unittest import mock
    from jax.experimental import pallas as pl
    import cdvslam_tpu.ops.corr_pallas as cp

    rng = np.random.RandomState(7)
    K, C, P, NF, H, W, R = 8, 8, 3, 2, 64, 64, 3
    TE, SUBTE = cp.TE, cp.SUBTE
    # frame 0: one sub-tile containing a fallback edge; frame 1: a run
    # that crosses the grid-step boundary (TE edges per step)
    n0, n1 = SUBTE, TE * 2 - SUBTE
    E = n0 + n1
    jj = np.concatenate([np.zeros(n0, np.int64), np.ones(n1, np.int64)])
    ii = rng.randint(0, K, E)
    # well-behaved coords for all edges ...
    base_x = rng.uniform(10, W - 10, (E, 1, 1)) + rng.uniform(-1, 1, (E, P, P))
    base_y = rng.uniform(10, H - 10, (E, 1, 1)) + rng.uniform(-1, 1, (E, P, P))
    # ... except edge 0 (frame 0): spread its pixel rows beyond the shared
    # band so it takes the slow path
    base_y[0, :, :] = np.linspace(5, H - 5, P * P).reshape(P, P)
    coords = np.stack([base_x, base_y], axis=1)[None].astype(np.float32)

    gmap = jnp.asarray(rng.randn(1, K, C, P, P), jnp.float32)
    fmap = jnp.asarray(rng.randn(1, NF, C, H, W), jnp.float32)
    coords = jnp.asarray(coords)
    ii = jnp.asarray(ii, jnp.int32)
    jj = jnp.asarray(jj, jnp.int32)

    orig_call = pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig_call(*a, **kw)

    ref = corr(gmap, fmap, coords, ii, jj, radius=R, chunk=8)
    with mock.patch.object(cp.pl, "pallas_call", interp_call):
        got = cp.corr_pallas(gmap, fmap, coords, ii, jj, radius=R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)
