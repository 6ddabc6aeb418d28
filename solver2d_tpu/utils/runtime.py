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


# --- runtime body manipulation (reference: src/body.c:316-384 setters and
# force/impulse application, solver2d.h:38-42) ---

def set_linear_velocity(state: State, body_idx, v) -> State:
    b = state.bodies
    return dataclasses.replace(
        state, bodies=dataclasses.replace(b, v=b.v.at[body_idx].set(jnp.asarray(v, jnp.float32)))
    )


def set_angular_velocity(state: State, body_idx, w) -> State:
    b = state.bodies
    return dataclasses.replace(
        state, bodies=dataclasses.replace(b, w=b.w.at[body_idx].set(jnp.float32(w)))
    )


def apply_force_to_center(state: State, body_idx, force) -> State:
    """Accumulates into the per-step force, cleared at finalize
    (reference: s2Body_ApplyForceToCenter)."""
    b = state.bodies
    return dataclasses.replace(
        state, bodies=dataclasses.replace(b, force=b.force.at[body_idx].add(jnp.asarray(force, jnp.float32)))
    )


def apply_linear_impulse(state: State, body_idx, impulse, point) -> State:
    """v += impulse/m; w += cross(point - com, impulse)/I
    (reference: s2Body_ApplyLinearImpulse)."""
    b = state.bodies
    impulse = jnp.asarray(impulse, jnp.float32)
    point = jnp.asarray(point, jnp.float32)
    r = point - b.position[body_idx]
    v = b.v.at[body_idx].add(b.inv_mass[body_idx] * impulse)
    w = b.w.at[body_idx].add(b.inv_inertia[body_idx] * (r[0] * impulse[1] - r[1] * impulse[0]))
    return dataclasses.replace(state, bodies=dataclasses.replace(b, v=v, w=w))


def set_transform(state: State, body_idx, position, angle) -> State:
    """s2Body_SetTransform: move the body origin and orientation; the center
    of mass follows."""
    from ..ops import math2d as m

    b = state.bodies
    position = jnp.asarray(position, jnp.float32)
    rot = m.make_rot(jnp.float32(angle))
    com = position + m.rotate(rot, b.local_center[body_idx])
    return dataclasses.replace(
        state,
        bodies=dataclasses.replace(
            b,
            origin=b.origin.at[body_idx].set(position),
            position=b.position.at[body_idx].set(com),
            rot=b.rot.at[body_idx].set(rot),
            rot0=b.rot0.at[body_idx].set(rot),
        ),
    )


def destroy_joint(state: State, joint_idx: int) -> State:
    """Disable a joint (s2DestroyJoint)."""
    j = state.joints
    return dataclasses.replace(
        state, joints=dataclasses.replace(j, alive=j.alive.at[joint_idx].set(False))
    )


def destroy_shape(state: State, shape_idx: int) -> State:
    """Disable a shape and its contacts (the body keeps its other shapes;
    mass properties are NOT recomputed — matching a teleported-away shape
    rather than s2ComputeMass, which host-side rebuilds can do exactly)."""
    s = state.shapes
    shapes = dataclasses.replace(s, alive=s.alive.at[shape_idx].set(False))
    con = state.contacts
    dead = (con.shape_a == shape_idx) | (con.shape_b == shape_idx)
    contacts = dataclasses.replace(con, alive=con.alive & ~dead)
    return dataclasses.replace(state, shapes=shapes, contacts=contacts)
