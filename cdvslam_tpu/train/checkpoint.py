"""Checkpointing with orbax (replaces torch.save, reference
train_cdvo.py:210-217 -- and improves on it: optimizer + step state are
checkpointed too, which the reference omits)."""
from __future__ import annotations

import os

import jax


def save_checkpoint(path, state, step=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": state.step}
    ckpt.save(path, target, force=True)
    ckpt.wait_until_finished()


def load_checkpoint(path, state):
    import orbax.checkpoint as ocp

    from .trainer import TrainState

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": state.step}
    restored = ckpt.restore(path, target)
    return TrainState(restored["params"], restored["opt_state"], restored["step"])
