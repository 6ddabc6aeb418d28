"""World-batch parallelism: vmap over a leading worlds axis.

The reference caps out at 32 independent worlds stepped serially
(reference: src/world.c:29, constants.h:12); here a batch of worlds is a
single pytree with a leading axis, stepped by one vmapped jitted program —
thousands of simultaneous scenes (RL datagen) on one chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import State
from ..step import step


def replicate_state(state: State, n: int) -> State:
    """Tile one world into an [n, ...] batch."""
    return jax.tree.map(lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), state)


def batch_states(states: list[State]) -> State:
    """Stack same-capacity worlds into a batch."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def batched_step(config: SimConfig):
    """Returns jitted step(batch_state, dt) -> batch_state (dt broadcast)."""
    vstep = jax.vmap(partial(step, config=config), in_axes=(0, None))
    return jax.jit(vstep)


def randomize_velocities(batch: State, key, scale=0.5) -> State:
    """Per-world initial-condition jitter (for RL-style rollout diversity)."""
    import dataclasses

    n, b = batch.bodies.v.shape[:2]
    kv, kw = jax.random.split(key)
    dyn = (batch.bodies.type == 2) & batch.bodies.alive
    dv = scale * jax.random.normal(kv, (n, b, 2), jnp.float32)
    dw = scale * jax.random.normal(kw, (n, b), jnp.float32)
    bodies = dataclasses.replace(
        batch.bodies,
        v=jnp.where(dyn[..., None], batch.bodies.v + dv, batch.bodies.v),
        w=jnp.where(dyn, batch.bodies.w + dw, batch.bodies.w),
    )
    return dataclasses.replace(batch, bodies=bodies)
