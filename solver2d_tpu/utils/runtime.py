"""Functional runtime mutations of a frozen State.

The fixed-capacity masked-SoA analog of the reference's pool alloc/free
(reference: src/pool.c, src/body.c:65-150 destroy): bodies/shapes/joints are
enabled and disabled by flipping alive masks; teleporting re-initializes the
kinematic fields. All pure functions, usable between jitted steps or inside a
jitted event handler.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..state import State


def destroy_body(state: State, body_idx: int) -> State:
    """Disable a body, its shapes, its joints, and its contacts."""
    bodies = state.bodies
    alive = bodies.alive.at[body_idx].set(False)
    shape_dead = state.shapes.body == body_idx
    shapes = dataclasses.replace(state.shapes, alive=state.shapes.alive & ~shape_dead)
    joint_dead = (state.joints.body_a == body_idx) | (state.joints.body_b == body_idx)
    joints = dataclasses.replace(state.joints, alive=state.joints.alive & ~joint_dead)
    contact_dead = (state.contacts.body_a == body_idx) | (state.contacts.body_b == body_idx)
    contacts = dataclasses.replace(state.contacts, alive=state.contacts.alive & ~contact_dead)
    return dataclasses.replace(
        state,
        bodies=dataclasses.replace(bodies, alive=alive),
        shapes=shapes, joints=joints, contacts=contacts,
    )


def set_bodies_alive(state: State, body_idxs, alive: bool) -> State:
    """Batch enable/disable bodies + their shapes/joints (spawn/despawn)."""
    body_idxs = jnp.asarray(body_idxs)
    mask = jnp.zeros_like(state.bodies.alive).at[body_idxs].set(True)
    bodies = dataclasses.replace(
        state.bodies, alive=jnp.where(mask, alive, state.bodies.alive)
    )
    smask = mask[state.shapes.body]
    shapes = dataclasses.replace(state.shapes, alive=jnp.where(smask, alive, state.shapes.alive))
    jmask = mask[state.joints.body_a] | mask[state.joints.body_b]
    joints = dataclasses.replace(state.joints, alive=jnp.where(jmask, alive, state.joints.alive))
    if not alive:
        cmask = mask[state.contacts.body_a] | mask[state.contacts.body_b]
        contacts = dataclasses.replace(state.contacts, alive=state.contacts.alive & ~cmask)
    else:
        contacts = state.contacts
    return dataclasses.replace(state, bodies=bodies, shapes=shapes, joints=joints, contacts=contacts)


def teleport_bodies(state: State, body_idxs, positions, reset_velocity=True) -> State:
    """Move bodies (keeping orientation), zeroing velocities and deltas."""
    body_idxs = jnp.asarray(body_idxs)
    positions = jnp.asarray(positions, jnp.float32)
    b = state.bodies
    offset = positions - b.origin[body_idxs]
    origin = b.origin.at[body_idxs].set(positions)
    position = b.position.at[body_idxs].add(offset)
    kw = dict(origin=origin, position=position)
    if reset_velocity:
        kw.update(
            v=b.v.at[body_idxs].set(0.0),
            w=b.w.at[body_idxs].set(0.0),
            delta_pos=b.delta_pos.at[body_idxs].set(0.0),
        )
    return dataclasses.replace(state, bodies=dataclasses.replace(b, **kw))
