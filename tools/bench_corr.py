"""Microbenchmark: Pallas corr kernel at steady-state shapes (TPU).

Dependent-chain timing (the axon transport dedupes identical repeated
executions, see BASELINE.md methodology): each iteration's coords are
perturbed by a function of the previous output.

Reports two numbers: the realistic in-program cost (device cell plan
computed from the iteration's coords, as the fused update program does)
and the kernel-only cost under a fixed plan.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_corr.py [E] [iters]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 12288
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from cdvslam_tpu.ops.corr_pallas import (
        corr_epad, corr_pallas_padded, make_cell_plan, pad_fmap)

    rng = np.random.RandomState(0)
    # steady-state level-1 shapes: C=24 XFeat features @ 1/4 res of 480x752
    K, C, P, NF, H, W = 4096, 24, 3, 36, 120, 188
    gmap = jnp.asarray(rng.randn(1, K, C, P, P), jnp.bfloat16)
    fmap = jnp.asarray(rng.randn(1, NF, C, H, W), jnp.bfloat16)
    fpad = jax.block_until_ready(pad_fmap(fmap))
    ii = jnp.asarray(rng.randint(0, K, E), jnp.int32)
    jj = jnp.asarray(np.sort(rng.randint(0, NF, E)), jnp.int32)
    base = np.stack([rng.uniform(5, W - 5, (1, E, 1, 1)) + rng.uniform(-1, 1, (1, E, P, P)),
                     rng.uniform(5, H - 5, (1, E, 1, 1)) + rng.uniform(-1, 1, (1, E, P, P))],
                    axis=2).astype(np.float32)
    coords = jnp.asarray(base)
    EP = corr_epad(E, NF)

    def timeit(step, tag):
        c, out = step(coords, 0.0)          # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for it in range(iters):
            c, out = step(c, float(it + 1))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag} E={E} EP={EP}: {dt*1e3:.2f} ms/call  ({dt/E*1e6:.3f} us/edge)")

    @jax.jit
    def step_full(c, k):
        plan = make_cell_plan(c[0], jj, NF, EP, H, W)
        out = corr_pallas_padded(gmap, fpad, c, ii, jj, H, W, plan=plan)
        # data dependency for the next iteration (prevents transport
        # dedup) PLUS an unconditional per-iteration drift: the out-based
        # term alone collapses to identical calls when out is constant
        # (e.g. ablation modes writing zeros), re-triggering dedup
        c = c + 1e-6 * jnp.tanh(jnp.mean(out)) + 1e-4 * jnp.sin(k)
        return c, out

    timeit(step_full, "plan+kernel")

    plan0 = jax.block_until_ready(jax.jit(
        make_cell_plan, static_argnums=(2, 3, 4, 5))(coords[0], jj, NF, EP, H, W))

    @jax.jit
    def step_k(c, k):
        out = corr_pallas_padded(gmap, fpad, c, ii, jj, H, W, plan=plan0)
        c = c + 1e-6 * jnp.tanh(jnp.mean(out)) + 1e-4 * jnp.sin(k)
        return c, out

    timeit(step_k, "kernel-only")


if __name__ == "__main__":
    main()
