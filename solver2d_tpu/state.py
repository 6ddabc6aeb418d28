"""Structure-of-arrays world state.

This replaces the reference's pointer-linked pools, intrusive lists, and hash
sets (reference: src/pool.h, src/body.h:16-76, src/contact.h:21-61,
src/joint.h:86-102) with fixed-capacity arrays + validity masks — the idiomatic
shape for XLA: static shapes, gather/scatter instead of pointers, and a pytree
that can be vmapped over thousands of worlds and sharded across a TPU mesh.

Every shape is stored as a *rounded convex polygon* (padded to 8 vertices):
circle = 1 vertex + radius, capsule = 2 vertices + radius, segment = 2 vertices
+ zero radius — the same funneling the reference applies for capsules/segments
(reference: src/manifold.c:224-245, src/geometry.c:100-115), extended to
circles so a single batched narrowphase kernel covers all 9 shape pairs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import MAX_POLYGON_VERTICES, SimConfig

NULL_INDEX = -1


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


def pytree(cls):
    cls = dataclasses.dataclass(cls)
    return _register(cls)


@pytree
class Bodies:
    """SoA mirror of s2Body (reference: src/body.h:16-76), minus intrusive lists.

    `position` is the center of mass; `origin` the body origin. Solvers
    accumulate into `delta_pos` and finalize (reference: src/solve_common.c:70-91).
    The *0 fields are XPBD scratch (reference: src/body.h:32-45)."""

    type: jnp.ndarray          # i32 [B] BodyType
    origin: jnp.ndarray        # f32 [B,2]
    position: jnp.ndarray      # f32 [B,2] center of mass (world)
    delta_pos: jnp.ndarray     # f32 [B,2]
    delta_pos0: jnp.ndarray    # f32 [B,2] (XPBD)
    rot: jnp.ndarray           # f32 [B,2] (sin,cos)
    rot0: jnp.ndarray          # f32 [B,2] (XPBD)
    local_center: jnp.ndarray  # f32 [B,2]
    v: jnp.ndarray             # f32 [B,2] linear velocity
    w: jnp.ndarray             # f32 [B]   angular velocity
    v0: jnp.ndarray            # f32 [B,2] (XPBD)
    w0: jnp.ndarray            # f32 [B]   (XPBD)
    force: jnp.ndarray         # f32 [B,2]
    torque: jnp.ndarray        # f32 [B]
    mass: jnp.ndarray          # f32 [B]
    inv_mass: jnp.ndarray      # f32 [B]
    inertia: jnp.ndarray       # f32 [B] rotational inertia about COM
    inv_inertia: jnp.ndarray   # f32 [B]
    linear_damping: jnp.ndarray   # f32 [B]
    angular_damping: jnp.ndarray  # f32 [B]
    gravity_scale: jnp.ndarray    # f32 [B]
    alive: jnp.ndarray         # bool [B]

    @staticmethod
    def zeros(n: int) -> "Bodies":
        f = lambda *s: jnp.zeros(s, jnp.float32)
        rot = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (n, 1))
        return Bodies(
            type=jnp.zeros((n,), jnp.int32),
            origin=f(n, 2), position=f(n, 2), delta_pos=f(n, 2), delta_pos0=f(n, 2),
            rot=rot, rot0=rot, local_center=f(n, 2),
            v=f(n, 2), w=f(n), v0=f(n, 2), w0=f(n),
            force=f(n, 2), torque=f(n),
            mass=f(n), inv_mass=f(n), inertia=f(n), inv_inertia=f(n),
            linear_damping=f(n), angular_damping=f(n),
            gravity_scale=jnp.ones((n,), jnp.float32),
            alive=jnp.zeros((n,), bool),
        )


@pytree
class Shapes:
    """SoA mirror of s2Shape (reference: src/shape.h:23-48) with unified
    rounded-polygon geometry. `aabb`/`fat_aabb` are [S,4] = (lo.x, lo.y, hi.x,
    hi.y); fat AABBs implement the enlarge-on-escape hysteresis
    (reference: src/shape.c:48-67, src/world.c:286-297)."""

    body: jnp.ndarray        # i32 [S] owning body index
    source_type: jnp.ndarray # i32 [S] ShapeType (for draw/raycast/point tests)
    verts: jnp.ndarray       # f32 [S,8,2] body-origin-local vertices
    normals: jnp.ndarray     # f32 [S,8,2] edge normals (edge i: v[i] -> v[i+1])
    count: jnp.ndarray       # i32 [S] vertex count (1..8)
    radius: jnp.ndarray      # f32 [S]
    friction: jnp.ndarray    # f32 [S]
    restitution: jnp.ndarray # f32 [S]
    density: jnp.ndarray     # f32 [S]
    filter_category: jnp.ndarray  # u32 [S]
    filter_mask: jnp.ndarray      # u32 [S]
    filter_group: jnp.ndarray     # i32 [S]
    aabb: jnp.ndarray        # f32 [S,4] current AABB + speculative margin
    fat_aabb: jnp.ndarray    # f32 [S,4] hysteresis AABB used for pairing
    alive: jnp.ndarray       # bool [S]

    @staticmethod
    def zeros(n: int) -> "Shapes":
        f = lambda *s: jnp.zeros(s, jnp.float32)
        return Shapes(
            body=jnp.full((n,), NULL_INDEX, jnp.int32),
            source_type=jnp.zeros((n,), jnp.int32),
            verts=f(n, MAX_POLYGON_VERTICES, 2),
            normals=f(n, MAX_POLYGON_VERTICES, 2),
            count=jnp.ones((n,), jnp.int32),
            radius=f(n), friction=f(n), restitution=f(n), density=f(n),
            filter_category=jnp.ones((n,), jnp.uint32),
            filter_mask=jnp.full((n,), 0xFFFFFFFF, jnp.uint32),
            filter_group=jnp.zeros((n,), jnp.int32),
            aabb=f(n, 4), fat_aabb=f(n, 4),
            alive=jnp.zeros((n,), bool),
        )


@pytree
class Contacts:
    """Persistent contact table, one slot per active shape pair, sorted by the
    canonical pair key for device-side persistence matching. Replaces the pool +
    pair hash set + intrusive edge lists (reference: src/contact.h:21-61,
    src/broad_phase.h:25-45). The manifold layout mirrors s2ManifoldPoint
    (reference: include/solver2d/manifold.h:19-46); warm-start impulse transfer
    happens by point-id matching like s2UpdateContact (src/contact.c:328-358).
    """

    key: jnp.ndarray          # i32 [C] canonical pair key = shapeA * S + shapeB (A<B); INT32_MAX when dead
    shape_a: jnp.ndarray      # i32 [C]
    shape_b: jnp.ndarray      # i32 [C]
    body_a: jnp.ndarray       # i32 [C]
    body_b: jnp.ndarray       # i32 [C]
    friction: jnp.ndarray     # f32 [C] sqrt mix (reference: src/contact.c:42-45)
    restitution: jnp.ndarray  # f32 [C] max mix (reference: src/contact.c:47-52)
    normal: jnp.ndarray       # f32 [C,2] world normal (A->B)
    anchor_a: jnp.ndarray     # f32 [C,2,2] manifold point local anchors (body A origin frame)
    anchor_b: jnp.ndarray     # f32 [C,2,2]
    separation: jnp.ndarray   # f32 [C,2]
    normal_impulse: jnp.ndarray   # f32 [C,2]
    tangent_impulse: jnp.ndarray  # f32 [C,2]
    point_id: jnp.ndarray     # i32 [C,2] feature id (reference: manifold.c:14 S2_MAKE_ID)
    persisted: jnp.ndarray    # bool [C,2]
    point_count: jnp.ndarray  # i32 [C] 0..2
    # TGS_Sticky friction anchor cache (reference: manifold.h:19-46,
    # solve_tgs_sticky.c:87-135). Only TGS_Sticky reads these, so for every
    # other solver they are ZERO-WIDTH ([0,2,2] / [0]) — they cost ~31% of
    # the contact table's HBM and 16 of the 48 lanes in match_contacts'
    # packed carry gather otherwise. step.py / broadphase.py gate on
    # friction_normal_a.shape[0] (static under jit).
    friction_normal_a: jnp.ndarray  # f32 [C,2,2] per-point local normals ([0,2,2] when not sticky)
    friction_normal_b: jnp.ndarray  # f32 [C,2,2]
    friction_anchor_a: jnp.ndarray  # f32 [C,2,2]
    friction_anchor_b: jnp.ndarray  # f32 [C,2,2]
    friction_persisted: jnp.ndarray # bool [C] ([0] when not sticky)
    # GJK warm-start cache (reference: include/solver2d/distance.h:37-45)
    cache_count: jnp.ndarray   # i32 [C]
    cache_index_a: jnp.ndarray # i32 [C,3]
    cache_index_b: jnp.ndarray # i32 [C,3]
    color: jnp.ndarray         # i32 [C] persistent constraint color (-1 = unassigned)
    alive: jnp.ndarray         # bool [C]

    @staticmethod
    def zeros(n: int, sticky: bool = True) -> "Contacts":
        f = lambda *s: jnp.zeros(s, jnp.float32)
        i = lambda *s: jnp.zeros(s, jnp.int32)
        ns = n if sticky else 0
        return Contacts(
            key=jnp.full((n,), np.iinfo(np.int32).max, jnp.int32),
            shape_a=i(n), shape_b=i(n), body_a=i(n), body_b=i(n),
            friction=f(n), restitution=f(n),
            normal=f(n, 2), anchor_a=f(n, 2, 2), anchor_b=f(n, 2, 2),
            separation=f(n, 2), normal_impulse=f(n, 2), tangent_impulse=f(n, 2),
            point_id=i(n, 2), persisted=jnp.zeros((n, 2), bool), point_count=i(n),
            friction_normal_a=f(ns, 2, 2), friction_normal_b=f(ns, 2, 2),
            friction_anchor_a=f(ns, 2, 2), friction_anchor_b=f(ns, 2, 2),
            friction_persisted=jnp.zeros((ns,), bool),
            cache_count=i(n), cache_index_a=i(n, 3), cache_index_b=i(n, 3),
            color=jnp.full((n,), -1, jnp.int32),
            alive=jnp.zeros((n,), bool),
        )


@pytree
class Joints:
    """SoA union of revolute + mouse joints (reference: src/joint.h:28-102).

    type: 0 = revolute, 1 = mouse. Impulse state persists across steps for
    warm starting."""

    type: jnp.ndarray            # i32 [J]
    body_a: jnp.ndarray          # i32 [J]
    body_b: jnp.ndarray          # i32 [J]
    local_anchor_a: jnp.ndarray  # f32 [J,2] body-origin frame
    local_anchor_b: jnp.ndarray  # f32 [J,2]
    collide_connected: jnp.ndarray  # bool [J]
    # Revolute (reference: src/joint.h:50-82)
    reference_angle: jnp.ndarray # f32 [J]
    lower_angle: jnp.ndarray     # f32 [J]
    upper_angle: jnp.ndarray     # f32 [J]
    enable_limit: jnp.ndarray    # bool [J]
    enable_motor: jnp.ndarray    # bool [J]
    motor_speed: jnp.ndarray     # f32 [J]
    max_motor_torque: jnp.ndarray  # f32 [J]
    # Mouse (reference: src/joint.h:28-48)
    target: jnp.ndarray          # f32 [J,2]
    hertz: jnp.ndarray           # f32 [J]
    damping_ratio: jnp.ndarray   # f32 [J]
    # Warm-start state
    impulse: jnp.ndarray         # f32 [J,2] point-to-point impulse
    motor_impulse: jnp.ndarray   # f32 [J]
    lower_impulse: jnp.ndarray   # f32 [J]
    upper_impulse: jnp.ndarray   # f32 [J]
    color: jnp.ndarray           # i32 [J] persistent constraint color (-1 = unassigned)
    alive: jnp.ndarray           # bool [J]

    @staticmethod
    def zeros(n: int) -> "Joints":
        f = lambda *s: jnp.zeros(s, jnp.float32)
        return Joints(
            type=jnp.zeros((n,), jnp.int32),
            body_a=jnp.zeros((n,), jnp.int32), body_b=jnp.zeros((n,), jnp.int32),
            local_anchor_a=f(n, 2), local_anchor_b=f(n, 2),
            collide_connected=jnp.zeros((n,), bool),
            reference_angle=f(n), lower_angle=f(n), upper_angle=f(n),
            enable_limit=jnp.zeros((n,), bool), enable_motor=jnp.zeros((n,), bool),
            motor_speed=f(n), max_motor_torque=f(n),
            target=f(n, 2), hertz=f(n), damping_ratio=f(n),
            impulse=f(n, 2), motor_impulse=f(n), lower_impulse=f(n), upper_impulse=f(n),
            color=jnp.full((n,), -1, jnp.int32),
            alive=jnp.zeros((n,), bool),
        )


@pytree
class Diagnostics:
    """Per-step health/statistics counters (analog of s2Statistics,
    reference: include/solver2d/timer.h:8-17, plus overflow health flags)."""

    contact_count: jnp.ndarray      # i32 [] active contacts with points
    pair_count: jnp.ndarray         # i32 [] candidate pairs
    pair_overflow: jnp.ndarray      # bool [] SAP window or contact capacity overflow
    color_overflow: jnp.ndarray     # i32 [] contacts in the conflict bucket
    max_penetration: jnp.ndarray    # f32 []
    step_id: jnp.ndarray            # i32 []

    @staticmethod
    def zeros() -> "Diagnostics":
        return Diagnostics(
            contact_count=jnp.zeros((), jnp.int32),
            pair_count=jnp.zeros((), jnp.int32),
            pair_overflow=jnp.zeros((), bool),
            color_overflow=jnp.zeros((), jnp.int32),
            max_penetration=jnp.zeros((), jnp.float32),
            step_id=jnp.zeros((), jnp.int32),
        )


@pytree
class State:
    """The full world state: a pure pytree of arrays. Stepping is a pure
    function State -> State; vmap over a leading world axis batches worlds
    (the analog of s2_worlds[32], reference: src/world.c:29) and sharding that
    axis over a Mesh scales across chips."""

    bodies: Bodies
    shapes: Shapes
    contacts: Contacts
    joints: Joints
    gravity: jnp.ndarray  # f32 [2] (default {0,-10}, reference: src/world.c:97)
    diag: Diagnostics

    @staticmethod
    def zeros(config: SimConfig) -> "State":
        from .config import SolverType

        return State(
            bodies=Bodies.zeros(config.max_bodies),
            shapes=Shapes.zeros(config.max_shapes),
            contacts=Contacts.zeros(
                config.max_contacts, sticky=config.solver == SolverType.TGS_STICKY
            ),
            joints=Joints.zeros(config.max_joints),
            gravity=jnp.array([0.0, -10.0], jnp.float32),
            diag=Diagnostics.zeros(),
        )
