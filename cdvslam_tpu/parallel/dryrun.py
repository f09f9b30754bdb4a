"""Multi-chip dry-run: jit the full DP training step over an n-device mesh.

Run as a module in a fresh interpreter so the platform can be forced to a
virtual n-device CPU mesh before any JAX backend initializes::

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N \
        python -m cdvslam_tpu.parallel.dryrun N

This validates the sharded training path (the reference's NCCL DDP,
train_cdvo.py:27-35,251-253, re-done as a jax.sharding Mesh with XLA
gradient psum) compiles and executes on N devices without N real chips.

Note: the axon sitecustomize may call
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start,
so setting the env var alone is not enough -- :func:`_force_cpu_mesh`
also flips the config back after importing jax.
"""
from __future__ import annotations

import os
import sys


def _force_cpu_mesh(n_devices: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")


def run(n_devices: int) -> None:
    """The actual dry run. Requires >= n_devices jax devices available."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cdvslam_tpu.models import CDVNet, build_update_aux
    from cdvslam_tpu.parallel import make_mesh, replicate, shard_batch
    from cdvslam_tpu.train import (
        RolloutConfig, init_train_state, make_optimizer, make_train_step,
    )

    devs = jax.devices()
    if len(devs) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, found {len(devs)} "
            f"({devs[0].platform}); run via `python -m "
            f"cdvslam_tpu.parallel.dryrun {n_devices}` to force a virtual "
            f"CPU mesh"
        )
    mesh = make_mesh(n_devices)

    F, M, H, W = 4, 4, 48, 64
    B = n_devices  # one clip per device
    cfg = RolloutConfig(F=F, M=M, STEPS=2, MIN_FRAME=3, is_cdv=True)

    model = CDVNet()
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((F, H, W, 3))

    pf = model.init(key, img, method=CDVNet.features_f)
    pi = model.init(key, img, method=CDVNet.features_i)
    E = 8
    net0 = jnp.zeros((1, E, 384))
    corr0 = jnp.zeros((1, E, 2 * 49 * 9))
    aux0 = build_update_aux(
        np.zeros(E, np.int64), np.arange(E), np.arange(E), 0, 16, M=E, E_pad=E
    )
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

    optimizer, _ = make_optimizer(lr=1e-4, total_steps=100)
    state = init_train_state(params, optimizer)

    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(B, F, H, W, 3) * 255, jnp.float32),
        "poses": jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (B, F, 1)),
        "disps": jnp.ones((B, F, H // 4, W // 4)),
        "intrinsics": jnp.tile(jnp.asarray([60.0, 60.0, 32.0, 24.0]), (B, 1)),
    }

    train_step = make_train_step(model, cfg, optimizer, mesh=mesh)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, batch)
    kkey = replicate(mesh, jax.random.PRNGKey(1))

    state, metrics = train_step(state, batch, kkey)
    jax.block_until_ready(metrics["loss"])
    loss = float(metrics["loss"])
    if not np.isfinite(loss):
        raise RuntimeError(f"dryrun produced non-finite loss: {loss}")
    print(
        f"dryrun_multichip({n_devices}): devices={len(devs)}x"
        f"{devs[0].platform} loss={loss:.4f} "
        f"nan_skip={float(metrics['nan_skip'])}"
    )


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    n = int(argv[0]) if argv else 8
    _force_cpu_mesh(n)
    run(n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
