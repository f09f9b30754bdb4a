"""Mesh helpers for data-parallel training.

The reference scales via PyTorch DDP over NCCL (reference:
train_cdvo.py:27-35, 251-253); the TPU-native equivalent is a
``jax.sharding.Mesh`` with the batch sharded over the 'data' axis --
gradient reduction is an XLA-inserted psum over ICI, no explicit
collectives needed.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="data"):
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(mesh, tree, axis="data"):
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
