"""Multi-chip scaling: shard the world batch across a device mesh.

Worlds are independent (no per-step cross-world communication,
reference: src/world.c:29-45 — 32 isolated world slots), so the natural
multi-chip layout is pure data parallelism over the worlds axis: a 1-D
`jax.sharding.Mesh`, `NamedSharding(P('worlds'))` on every state leaf, and a
jitted vmapped step whose collectives (only metric reductions, if requested)
ride ICI. XLA inserts whatever movement is needed; with this layout there is
none in the hot loop.

Multi-host: call `jax.distributed.initialize()` before building the mesh from
`jax.devices()`; the same code then spans hosts (each host feeds its local
shard of worlds).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..state import State
from ..step import step


def make_mesh(devices=None, axis: str = "worlds") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def shard_state(batch: State, mesh: Mesh, axis: str = "worlds") -> State:
    """Place a batched state with the worlds axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def sharded_step(config: SimConfig, mesh: Mesh, axis: str = "worlds"):
    """Jitted batched step with explicit in/out shardings on the worlds axis,
    so even an *uncommitted* batch is distributed across the mesh rather than
    silently computed on one device. dt is replicated.

    With worlds fully data-parallel the compiled program contains zero
    inter-chip collectives — each chip steps its shard independently.

    With config.lane_solve the per-shard computation is the lane-batched
    step (step.step_batch) via shard_map: each chip runs the shared-structure
    solve over its LOCAL worlds (structure from its local world 0 — exact
    for lockstep batches, where every world 0 is identical), still with zero
    hot-loop collectives."""
    sharding = NamedSharding(mesh, P(axis))      # prefix: shards dim 0 of every leaf
    replicated = NamedSharding(mesh, P())
    if config.lane_solve:
        from jax.experimental.shard_map import shard_map

        from ..step import step_batch

        f = shard_map(
            lambda b, dt: step_batch(b, dt, config),
            mesh=mesh, in_specs=(P(axis), P()), out_specs=P(axis),
        )
        return jax.jit(
            f,
            in_shardings=(sharding, replicated),
            out_shardings=sharding,
            donate_argnums=(0,),
        )
    vstep = jax.vmap(partial(step, config=config), in_axes=(0, None))
    return jax.jit(
        vstep,
        in_shardings=(sharding, replicated),
        out_shardings=sharding,
        donate_argnums=(0,),
    )


def metrics_psum_example(batch: State, mesh: Mesh, axis: str = "worlds"):
    """Cross-chip metric reduction via shard_map + psum (the only collective
    this workload ever needs)."""
    from jax.experimental.shard_map import shard_map

    def local_metrics(bodies_v):
        ke = 0.5 * jnp.sum(bodies_v**2)
        return jax.lax.psum(ke, axis)

    f = shard_map(
        local_metrics, mesh=mesh,
        in_specs=P(axis), out_specs=P(),
    )
    return f(batch.bodies.v)
