"""Run ONE dense-mode training step at real shape on the TPU.

VERDICT r2 Next #6: dense mode (PPI=1530, F=4, 480x640 crops, the
reference's setdense configuration, net_cdv.py:573 / train_cdvo.py
dense_cfg) had only ever executed at toy shapes on CPU. This measures a
real-shape step (synthetic batch; the step is shape-identical to real
data) and reports step time + device memory.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train_dense.py [iters]
"""
import sys
import time

import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    import jax.numpy as jnp

    from cdvslam_tpu.models import CDVNet
    from cdvslam_tpu.parallel import make_mesh, replicate, shard_batch
    from cdvslam_tpu.train import (
        RolloutConfig, init_train_state, make_optimizer, make_train_step,
    )

    mesh = make_mesh()
    n_dev = len(jax.devices())
    B = n_dev
    F, M, H, W = 4, 1530, 480, 640

    model = CDVNet()
    from cdvslam_tpu.slam.runtime import SLAM
    from cdvslam_tpu.config import get_cfg
    tmp = SLAM(get_cfg(), network=model, ht=H, wd=W)
    params = tmp.params
    del tmp

    optimizer, _ = make_optimizer()
    state = init_train_state(params, optimizer)
    import os
    dense_cfg = RolloutConfig(
        F=F, M=M, STEPS=4, MIN_FRAME=4, is_cdv=True,
        compute_dtype=os.environ.get("TRAIN_DTYPE", "float32"))
    step_dense = make_train_step(model, dense_cfg, optimizer, mesh=mesh)

    rng = np.random.RandomState(0)
    batch = {
        "images": (rng.rand(B, F, H, W, 3) * 255).astype(np.float32),
        "poses": np.tile(
            np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (B, F, 1)),
        # gt disps at 1/4 resolution (rollout_loss expects Hf = H/4)
        "disps": rng.uniform(0.2, 2.0, (B, F, H // 4, W // 4)).astype(np.float32),
        "intrinsics": np.tile(
            np.array([320.0, 320.0, 320.0, 240.0], np.float32), (B, 1)),
    }
    # small forward motion so the rollout has parallax
    for f in range(F):
        batch["poses"][:, f, 2] = 0.1 * f

    state = replicate(mesh, state)
    key = jax.random.PRNGKey(0)
    b = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})

    t0 = time.perf_counter()
    state, metrics = step_dense(state, b, replicate(mesh, key))
    jax.block_until_ready(metrics)
    t_compile = time.perf_counter() - t0
    print(f"first step (incl. compile): {t_compile:.1f}s")
    print({k: float(v) for k, v in metrics.items()})

    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        state, metrics = step_dense(state, b, replicate(mesh, sub))
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / iters
    print(f"dense step (F={F}, M={M}, {H}x{W}, B={B}): {dt*1e3:.0f} ms/step")
    try:
        ms = jax.devices()[0].memory_stats()
        print(f"device memory: peak {ms.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
              f"/ limit {ms.get('bytes_limit', 0)/2**30:.2f} GiB")
    except Exception as e:
        print("memory_stats unavailable:", e)


if __name__ == "__main__":
    main()
