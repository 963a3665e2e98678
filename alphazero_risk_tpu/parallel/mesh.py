"""Device mesh + sharding helpers.

The reference's "distributed backend" is an in-process multi-GPU object tree
with per-device mutexes and checkpoint-file weight broadcast
(``alphazero_gpu_cluster.{h,cpp}``).  The TPU-native equivalent is simply: a
1-D data-parallel ``Mesh``, game batches and replay minibatches sharded over
the ``dp`` axis, parameters replicated, and XLA inserting the gradient
``psum`` over ICI.  There is no TP/PP/SP/EP axis because the model is a tiny
CNN on a 7x6 board — scale dimensions are (games x MCTS sims x hosts); see
SURVEY.md section 2.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Leading-axis sharding for game batches / sample minibatches."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Place a pytree of [B, ...] arrays sharded over the dp axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
