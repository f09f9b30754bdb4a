"""Data-parallel trainer (replaces reference train_cdvo.py / train_dpvo.py).

One jitted ``train_step`` over a device mesh: the batch is sharded on the
'data' axis, parameters replicated; XLA inserts the gradient psum over
ICI. The reference's rank-synchronized NaN-step skip
(train_cdvo.py:163-181) becomes a deterministic global mask: NaN losses
zero their sample's gradient and the step is skipped for everyone when
any sample is NaN (exactly lock-step, no collective code needed).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from jax.sharding import NamedSharding, PartitionSpec as P

from .rollout import RolloutConfig, rollout_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr=8e-5, total_steps=240000, clip=10.0, weight_decay=1e-6):
    """AdamW + linear OneCycle (reference train_cdvo.py:88-91)."""
    sched = optax.linear_onecycle_schedule(
        transition_steps=total_steps, peak_value=lr, pct_start=0.01,
        pct_final=1.0, div_factor=25.0, final_div_factor=10000.0,
    )
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(sched, weight_decay=weight_decay),
    ), sched


def make_loss_fn(model, cfg: RolloutConfig):
    """Batched rollout loss with the lock-step NaN guard: NaN samples are
    masked out of the mean and flagged (any_nan skips the whole step for
    everyone, the reference's all_reduce(MAX) DDP contract)."""

    def loss_fn(params, batch, key):
        keys = jax.random.split(key, batch["images"].shape[0])

        def per_sample(img, pose, disp, intr, k):
            return rollout_loss(params, model, cfg, img, pose, disp, intr, k)

        losses, metrics = jax.vmap(per_sample)(
            batch["images"], batch["poses"], batch["disps"],
            batch["intrinsics"], keys,
        )
        # NaN guard: mask NaN samples; if any sample is NaN, skip the step
        isnan = jnp.isnan(losses)
        safe = jnp.where(isnan, 0.0, losses)
        any_nan = jnp.any(isnan)
        loss = jnp.sum(safe) / jnp.maximum(jnp.sum(~isnan), 1)
        return loss, (metrics, any_nan)

    return loss_fn


def batch_shardings(mesh):
    """NamedShardings for a training batch dict ('data'-sharded)."""
    return {
        "images": NamedSharding(mesh, P("data")),
        "poses": NamedSharding(mesh, P("data")),
        "disps": NamedSharding(mesh, P("data")),
        "intrinsics": NamedSharding(mesh, P("data")),
    }


def make_train_step(model, cfg: RolloutConfig, optimizer, mesh=None):
    """Returns a jitted train_step(state, batch, key) -> (state, metrics).

    batch: dict with images (B,F,H,W,3), poses (B,F,7), disps (B,F,Hf,Wf),
    intrinsics (B,4). B is sharded over the mesh 'data' axis.
    """
    loss_fn = make_loss_fn(model, cfg)

    def train_step(state: TrainState, batch, key):
        (loss, (metrics, any_nan)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, key)
        # lock-step NaN skip (reference all_reduce(MAX) equivalent)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(any_nan | jnp.any(jnp.isnan(g)), 0.0, g), grads
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        out_metrics = {
            "loss": loss,
            "nan_skip": any_nan.astype(jnp.float32),
            **{k: jnp.mean(v) for k, v in metrics.items()},
        }
        return new_state, out_metrics

    if mesh is not None:
        batch_sharding = batch_shardings(mesh)
        repl = NamedSharding(mesh, P())
        return jax.jit(
            train_step,
            in_shardings=(repl, batch_sharding, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
    return jax.jit(train_step, donate_argnums=(0,))


def init_train_state(params, optimizer):
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
