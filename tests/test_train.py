"""Training rollout + sharded train step tests."""
import numpy as np
import jax
import jax.numpy as jnp

from cdvslam_tpu.models import CDVNet, VONet, build_update_aux
from cdvslam_tpu.parallel import make_mesh, replicate, shard_batch
from cdvslam_tpu.train import (
    RolloutConfig, rollout_loss, make_optimizer, make_train_step,
    init_train_state, build_static_edges, n_visible,
)


def _init_cdv_params(model, F, H, W):
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((F, H, W, 3))
    pf = model.init(key, img, method=CDVNet.features_f)
    pi = model.init(key, img, method=CDVNet.features_i)
    E = 8
    net0 = jnp.zeros((1, E, 384))
    corr0 = jnp.zeros((1, E, 2 * 49 * 9))
    aux0 = build_update_aux(np.zeros(E, np.int64), np.arange(E), np.arange(E), 0, 16, M=E, E_pad=E)
    pu = model.init(key, net0, net0, corr0, aux0, 16, method=CDVNet.update)
    pp = model.init(key, jnp.zeros((1, E, 2)), method=CDVNet.posenc)

    def merge(a, b):
        if not isinstance(a, dict):
            return b
        out = dict(a)
        for k, v in dict(b).items():
            out[k] = merge(out[k], v) if k in out else v
        return out

    params = {}
    for p in (pf, pi, pu, pp):
        params = merge(params, dict(p))
    return params


def test_edge_schedule():
    cfg = RolloutConfig(F=5, M=3, STEPS=4, MIN_FRAME=3)
    ii, jj, kk, ix, jx, perm, inv = build_static_edges(cfg)
    assert len(ii) == 5 * 5 * 3
    assert n_visible(cfg, 0) == 3 and n_visible(cfg, 3) == 4
    # neighbor shift: edge (i, j, m) -> (i, j-1, m)
    e = (2 * 5 + 3) * 3 + 1  # i=2, j=3, m=1
    assert ix[e] == (2 * 5 + 2) * 3 + 1
    assert jx[e] == (2 * 5 + 4) * 3 + 1
    # each perm row covers one (i, j) group: same i/j across the row
    assert (ii[perm[7]] == ii[perm[7]][0]).all()
    assert (jj[perm[7]] == jj[perm[7]][0]).all()


def test_rollout_loss_and_grads():
    F, M, H, W = 4, 4, 48, 64
    cfg = RolloutConfig(F=F, M=M, STEPS=3, MIN_FRAME=3, is_cdv=True)
    model = CDVNet()
    params = _init_cdv_params(model, F, H, W)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(F, H, W, 3) * 255, jnp.float32)
    poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (F, 1))
    disps = jnp.ones((F, H // 4, W // 4))
    intr = jnp.asarray([60.0, 60.0, 32.0, 24.0])

    loss, metrics = rollout_loss(params, model, cfg, images, poses, disps,
                                 intr, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    g = jax.grad(
        lambda p: rollout_loss(p, model, cfg, images, poses, disps, intr,
                               jax.random.PRNGKey(1))[0]
    )(params)
    leaves = jax.tree_util.tree_leaves(g)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
    assert np.isfinite(total) and total > 0


def test_loss_decreases_over_steps():
    """Training on a fixed batch must DECREASE the loss, not just produce
    finite grads (the update operator has to learn to predict the
    identity-motion flow on a static clip). Guards the whole
    train-step -> optimizer -> rollout contract end to end."""
    F, M, H, W = 4, 4, 48, 64
    cfg = RolloutConfig(F=F, M=M, STEPS=2, MIN_FRAME=3, is_cdv=True)
    model = CDVNet()
    params = _init_cdv_params(model, F, H, W)
    optimizer, _ = make_optimizer(lr=3e-4, total_steps=200)
    state = init_train_state(params, optimizer)

    rng = np.random.RandomState(1)
    batch = {
        "images": jnp.asarray(rng.rand(1, F, H, W, 3) * 255, jnp.float32),
        "poses": jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (1, F, 1)),
        "disps": jnp.ones((1, F, H // 4, W // 4)),
        "intrinsics": jnp.tile(jnp.asarray([60.0, 60.0, 32.0, 24.0]), (1, 1)),
    }
    step = make_train_step(model, cfg, optimizer, mesh=None)
    key = jax.random.PRNGKey(3)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, key)  # fixed batch + key
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    first, last = np.mean(losses[:3]), np.mean(losses[-3:])
    assert last < 0.9 * first, \
        f"loss did not decrease: {first:.4f} -> {last:.4f} ({losses})"


def test_sharded_train_step():
    mesh = make_mesh(8)
    F, M, H, W = 4, 4, 48, 64
    B = 8
    cfg = RolloutConfig(F=F, M=M, STEPS=2, MIN_FRAME=3, is_cdv=True)
    model = CDVNet()
    params = _init_cdv_params(model, F, H, W)
    optimizer, _ = make_optimizer(lr=1e-4, total_steps=100)
    state = init_train_state(params, optimizer)

    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(B, F, H, W, 3) * 255, jnp.float32),
        "poses": jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (B, F, 1)),
        "disps": jnp.ones((B, F, H // 4, W // 4)),
        "intrinsics": jnp.tile(jnp.asarray([60.0, 60.0, 32.0, 24.0]), (B, 1)),
    }
    step = make_train_step(model, cfg, optimizer, mesh=mesh)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, batch)
    key = replicate(mesh, jax.random.PRNGKey(2))
    state2, metrics = step(state, batch, key)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    assert float(metrics["nan_skip"]) == 0.0
