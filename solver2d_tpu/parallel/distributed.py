"""Multi-host launcher — a thin wrapper, not a comms layer.

Worlds are independent (reference: src/world.c:29-45), so multi-host scaling
is pure data parallelism: initialize the JAX distributed runtime, build one
global mesh over all chips, and let each host feed its addressable shard of
the world batch. The step program itself contains zero collectives
(SURVEY.md §5: 'the communication backend is simply XLA collectives created by
pjit sharding; nothing like NCCL must be rebuilt').

Usage (same script on every host):

    from solver2d_tpu.parallel.distributed import initialize, global_batch
    initialize()                      # reads JAX_COORDINATOR etc., or pass args
    mesh = make_mesh()                # all global devices
    batch = global_batch(state, worlds_per_chip=512, mesh=mesh)
    stepf = sharded_step(config, mesh)
"""

from __future__ import annotations

import jax
import numpy as np

from .batch import replicate_state
from .sharding import make_mesh, shard_state, sharded_step  # noqa: F401


def initialize(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """jax.distributed.initialize passthrough; no-ops on single process."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_batch(state, worlds_per_chip: int, mesh=None):
    """Create a globally-sharded batch of identical worlds: each process
    materializes only its addressable shard."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh if mesh is not None else make_mesh()
    n_global = worlds_per_chip * mesh.devices.size
    sharding = NamedSharding(mesh, P("worlds"))

    def make_global(x):
        shape = (n_global,) + x.shape
        return jax.make_array_from_callback(
            shape, sharding,
            lambda idx: np.broadcast_to(np.asarray(x)[None], np.empty(shape)[idx].shape),
        )

    return jax.tree.map(make_global, state)
