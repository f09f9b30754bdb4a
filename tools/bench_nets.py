"""Dependent-chain timing of the frame-phase networks at real shape.

Times XFeat (features_f), DINO (features_i), and both-in-one-program,
each in an isolated dependent chain. The chain's input bump is FOLDED
INTO the jitted program (eager ops cost ~25 ms each over the remote
transport and would dominate the measurement).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_nets.py [iters]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cdvslam_tpu.config import get_cfg
    from cdvslam_tpu.models.cdvnet import CDVNet
    from cdvslam_tpu.slam import SLAM

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ht, wd = 480, 752
    cfg = get_cfg()
    cfg.MOTION_PROBE_THR = -1.0
    slam = SLAM(cfg, network="cdv", ht=ht, wd=wd)
    model, params = slam.model, slam.cparams
    cdtype = slam.fdtype

    rng = np.random.RandomState(0)
    img0 = jnp.asarray((rng.rand(1, ht, wd, 3) * 2 - 0.5).astype(np.float32)
                       ).astype(cdtype)

    def chain(fn, label):
        # fn: x -> (x_next, probe); bump folded inside the program
        x = img0
        x, y = fn(x)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(iters):
            x, y = fn(x)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:26s} {dt*1e3:8.2f} ms/call")

    @jax.jit
    def xfeat(x):
        f = model.apply(params, x, method=CDVNet.features_f)
        return x + (jnp.ravel(f)[0] * 1e-6).astype(x.dtype), f

    @jax.jit
    def dino(x):
        t = model.apply(params, x, method=CDVNet.features_i)[0]
        return x + (jnp.ravel(t)[0] * 1e-6).astype(x.dtype), t

    @jax.jit
    def both(x):
        f = model.apply(params, x, method=CDVNet.features_f)
        t = model.apply(params, x, method=CDVNet.features_i)[0]
        return x + ((jnp.ravel(f)[0] + jnp.ravel(t)[0]) * 1e-6).astype(x.dtype), f

    chain(both, "XFeat+DINO one program")
    chain(xfeat, "XFeat features_f")
    chain(dino, "DINO features_i")
    chain(both, "XFeat+DINO (repeat)")


if __name__ == "__main__":
    main()
