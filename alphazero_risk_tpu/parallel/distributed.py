"""Multi-host runtime: initialization + cross-process data plumbing.

The reference is strictly single-process (SURVEY.md section 5: no
communication backend at all — mutexes and checkpoint files).  The
TPU-native scale-out path is:

  * ``jax.distributed.initialize`` once per host process,
  * one global ``Mesh`` over all devices (dp axis),
  * self-play batches created per-host and assembled into one global array
    (``host_local_batch``) so each host steps only its shard,
  * the learner's gradient psum rides ICI/DCN via XLA — nothing manual,
  * win/sample tallies gathered with ``process_allgather``.

Single-host callers can use everything here unchanged (world size 1).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu_collectives: Optional[str] = None) -> None:
    """Bring up the multi-host runtime (no-op when single-process and no
    coordinator is given).

    ``cpu_collectives`` ('gloo' or 'mpi') selects the cross-process
    collectives implementation for the CPU backend — required when
    validating the multi-host path on CPU processes (tools/
    multihost_smoke.py); on TPU pods the XLA runtime provides ICI/DCN
    collectives and this must stay None.
    """
    if num_processes is None and coordinator_address is None:
        return
    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_mesh(axis: str = "dp") -> Mesh:
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_batch(mesh: Mesh, make_local, global_batch: int,
                     axis: str = "dp"):
    """Build a globally-sharded [B, ...] pytree from per-host local pieces.

    ``make_local(local_batch) -> pytree of [local_batch, ...] numpy/jax``
    is called once per process with its share of the batch; the result is
    assembled with ``jax.make_array_from_process_local_data`` so each host
    holds only its shard.
    """
    nproc = jax.process_count()
    assert global_batch % nproc == 0, (global_batch, nproc)
    local = make_local(global_batch // nproc)
    sharding = NamedSharding(mesh, P(axis))

    def assemble(x):
        x = np.asarray(x)
        global_shape = (global_batch,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree.map(assemble, local)


def local_shards(tree):
    """Host-local rows of globally-sharded arrays, as numpy.

    For each leaf, concatenates this process's addressable shards along the
    sharded axis in global order; replicated leaves return one copy;
    fully-addressable arrays pass through.  This is how the trainer keeps
    replay samples and win tallies host-local in a multi-process run: every
    host extracts only ITS games from the global batch (the counterpart of
    ``host_local_batch``).
    """
    def one(x):
        if not isinstance(x, jax.Array) or x.is_fully_addressable:
            return np.asarray(x)
        shards = sorted(x.addressable_shards,
                        key=lambda s: tuple(sl.start or 0 for sl in s.index))
        if len(shards) == 1:
            return np.asarray(shards[0].data)
        axis = None
        s0 = shards[0].index
        s1 = shards[1].index
        for i, (a, b) in enumerate(zip(s0, s1)):
            if (a.start or 0) != (b.start or 0):
                axis = i
                break
        if axis is None:          # replicated across local devices
            return np.asarray(shards[0].data)
        return np.concatenate([np.asarray(s.data) for s in shards],
                              axis=axis)

    return jax.tree.map(one, tree)


def allgather_min(value) -> int:
    """Minimum of a per-process scalar across the world."""
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils

    return int(multihost_utils.process_allgather(
        np.asarray([value])).min())


def allgather_metrics(values: dict) -> dict:
    """Sum scalar metrics across processes (win tallies, sample counts)."""
    if jax.process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils

    keys = sorted(values)
    arr = np.asarray([float(values[k]) for k in keys])
    total = multihost_utils.process_allgather(arr).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, total)}
