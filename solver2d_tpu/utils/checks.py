"""Failure detection and recovery.

TPU analog of the reference's debug validators (reference: src/core.h:69-84,
src/dynamic_tree.c:900-1014, src/broad_phase.c:395-430): batch-level health
checks (NaN / velocity explosion) with per-world reset — important when a few
of thousands of vmapped worlds blow up mid-rollout (RL datagen fleets).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..state import State


def world_health(state: State, max_speed: float = 1e4):
    """Per-world health bool (jittable). For a batched state (leading worlds
    axis) vmap this."""
    b = state.bodies
    finite = (
        jnp.isfinite(b.position).all()
        & jnp.isfinite(b.v).all()
        & jnp.isfinite(b.w).all()
        & jnp.isfinite(b.rot).all()
    )
    speed_ok = jnp.where(b.alive, (b.v**2).sum(-1), 0.0).max() < max_speed**2
    return finite & speed_ok


def reset_unhealthy_worlds(batch: State, initial: State) -> State:
    """Replace blown-up worlds in a batch with their initial state.

    batch: [W, ...] pytree; initial: [W, ...] (e.g. the frozen start batch)."""
    healthy = jax.vmap(world_health)(batch)

    def sel(cur, init):
        mask = healthy.reshape((-1,) + (1,) * (cur.ndim - 1))
        return jnp.where(mask, cur, init)

    return jax.tree.map(sel, batch, initial)


def validate_state(state: State, config) -> list[str]:
    """Host-side structural validation (the analog of s2ValidateBroadphase):
    returns a list of violation strings (empty = valid)."""
    import numpy as np

    problems = []
    s = jax.device_get(state)
    alive_shapes = np.asarray(s.shapes.alive)
    body_of = np.asarray(s.shapes.body)
    alive_bodies = np.asarray(s.bodies.alive)
    if np.any(alive_shapes & ~alive_bodies[body_of]):
        problems.append("shape alive but body dead")
    con = s.contacts
    calive = np.asarray(con.alive)
    keys = np.asarray(con.key)[calive]
    if len(keys) and np.any(np.diff(np.sort(keys)) == 0):
        problems.append("duplicate contact keys")
    expect = np.asarray(con.shape_a) * config.max_shapes + np.asarray(con.shape_b)
    if np.any(calive & (np.asarray(con.key) != expect)):
        problems.append("contact key mismatch")
    pc = np.asarray(con.point_count)
    if np.any(calive & ((pc < 0) | (pc > 2))):
        problems.append("bad point count")
    if np.any(~calive & (pc > 0)):
        problems.append("dead contact with points")
    return problems


def check_color_disjointness(body_a, body_b, color, active, dynamic_mask, n_colors) -> bool:
    """Test-time invariant: within each color, no two active constraints share
    a dynamic body (the property that makes colored GS == sequential GS)."""
    import numpy as np

    body_a, body_b = np.asarray(body_a), np.asarray(body_b)
    color, active = np.asarray(color), np.asarray(active)
    dynamic_mask = np.asarray(dynamic_mask)
    for k in range(n_colors - 1):  # last bucket may overflow by design
        sel = active & (color == k)
        seen = set()
        for a, b in zip(body_a[sel], body_b[sel]):
            for x in (a, b):
                if dynamic_mask[x]:
                    if x in seen:
                        return False
                    seen.add(x)
    return True
