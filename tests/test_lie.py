"""Lie group tests.

Ports the reference's test strategy (reference: cdvslam/lietorch/run_tests.py):
algebraic identities (Log(Exp(x)) == x, X*X^-1 == e, adjoint identity,
act-vs-matrix) plus numerical gradient checks of exp/log/act, over all four
groups.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdvslam_tpu.lie import SO3, RxSO3, SE3, Sim3

GROUPS = [SO3, RxSO3, SE3, Sim3]
BATCH = (32,)


def _random_xi(cls, key, scale=1.0):
    return scale * jax.random.normal(key, BATCH + (cls.manifold_dim,), jnp.float64)


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("cls", GROUPS)
def test_exp_log(cls):
    # reference run_tests.py:16-21
    key = jax.random.PRNGKey(0)
    x = _random_xi(cls, key, 0.5)
    y = cls.exp(x).log()
    np.testing.assert_allclose(x, y, atol=1e-8, rtol=1e-6)


@pytest.mark.parametrize("cls", GROUPS)
def test_inv(cls):
    # reference run_tests.py:23-28
    key = jax.random.PRNGKey(1)
    X = cls.exp(_random_xi(cls, key))
    I = X * X.inv()
    eye = cls.Identity(BATCH, dtype=jnp.float64)
    np.testing.assert_allclose(I.data, eye.data, atol=1e-8)


@pytest.mark.parametrize("cls", GROUPS)
def test_adj(cls):
    # adjoint identity X * Exp(a) == Exp(Adj(X) a) * X (run_tests.py:30-41)
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    X = cls.exp(_random_xi(cls, k1))
    a = _random_xi(cls, k2, 0.3)
    b = X.adj(a)
    lhs = X * cls.exp(a)
    rhs = cls.exp(b) * X
    np.testing.assert_allclose(lhs.data, rhs.data, atol=1e-7)


@pytest.mark.parametrize("cls", GROUPS)
def test_adjT(cls):
    # <Adj(X) a, b> == <a, AdjT(X) b>
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    X = cls.exp(_random_xi(cls, k1))
    a = _random_xi(cls, k2)
    b = _random_xi(cls, k3)
    lhs = jnp.sum(X.adj(a) * b, axis=-1)
    rhs = jnp.sum(a * X.adjT(b), axis=-1)
    np.testing.assert_allclose(lhs, rhs, atol=1e-8)


@pytest.mark.parametrize("cls", GROUPS)
def test_act_matrix(cls):
    # act on point == matrix multiply (run_tests.py:44-52)
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    X = cls.exp(_random_xi(cls, k1))
    p = jax.random.normal(k2, BATCH + (3,), jnp.float64)
    y1 = X.act(p)
    M = X.matrix()
    if M.shape[-1] == 4:
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], -1)
        y2 = jnp.einsum("...ij,...j->...i", M, ph)[..., :3]
    else:
        y2 = jnp.einsum("...ij,...j->...i", M, p)
    np.testing.assert_allclose(y1, y2, atol=1e-8)


@pytest.mark.parametrize("cls", GROUPS)
def test_mul_assoc_and_compose(cls):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    A = cls.exp(_random_xi(cls, k1))
    B = cls.exp(_random_xi(cls, k2))
    p = jax.random.normal(k3, BATCH + (3,), jnp.float64)
    np.testing.assert_allclose((A * B).act(p), A.act(B.act(p)), atol=1e-8)


@pytest.mark.parametrize("cls", GROUPS)
def test_grad_exp_act(cls):
    # numerical gradcheck of xi -> Exp(xi).act(p), incl. near zero
    key = jax.random.PRNGKey(6)
    k1, k2 = jax.random.split(key)
    p = jax.random.normal(k1, (3,), jnp.float64)

    def f(xi):
        return jnp.sum(jnp.sin(cls.exp(xi).act(p)))

    for scale in [1.0, 1e-5, 0.0]:
        xi = scale * jax.random.normal(k2, (cls.manifold_dim,), jnp.float64)
        g_auto = jax.grad(f)(xi)
        g_num = np.zeros_like(np.asarray(xi))
        h = 1e-6
        for i in range(xi.shape[0]):
            e = np.zeros(xi.shape[0])
            e[i] = h
            g_num[i] = (f(xi + e) - f(xi - e)) / (2 * h)
        np.testing.assert_allclose(g_auto, g_num, atol=1e-5, rtol=1e-4)
        assert not np.any(np.isnan(g_auto))


@pytest.mark.parametrize("cls", GROUPS)
def test_grad_log(cls):
    key = jax.random.PRNGKey(7)
    xi0 = 0.5 * jax.random.normal(key, (cls.manifold_dim,), jnp.float64)
    X = cls.exp(xi0)

    def f(d):
        return jnp.sum(type(X)(X.data + d).log() ** 2)

    d = jnp.zeros(cls.embedded_dim, jnp.float64)
    g_auto = jax.grad(f)(d)
    h = 1e-6
    g_num = np.zeros(cls.embedded_dim)
    for i in range(cls.embedded_dim):
        e = np.zeros(cls.embedded_dim)
        e[i] = h
        g_num[i] = (f(d + e) - f(d - e)) / (2 * h)
    np.testing.assert_allclose(g_auto, g_num, atol=1e-4, rtol=1e-3)


def test_se3_retr_matches_reference_semantics():
    # retr(xi) = Exp(xi) * X  (reference groups.py:153-156)
    key = jax.random.PRNGKey(8)
    k1, k2 = jax.random.split(key)
    X = SE3.exp(jax.random.normal(k1, (6,), jnp.float64))
    xi = 0.1 * jax.random.normal(k2, (6,), jnp.float64)
    np.testing.assert_allclose(X.retr(xi).data, (SE3.exp(xi) * X).data, atol=1e-12)


def test_sim3_scale_roundtrip():
    key = jax.random.PRNGKey(9)
    xi = jax.random.normal(key, (7,), jnp.float64)
    X = Sim3.exp(xi)
    s = X.data[..., 7]
    np.testing.assert_allclose(jnp.log(s), xi[6], atol=1e-10)
