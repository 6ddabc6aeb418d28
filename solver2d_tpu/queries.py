"""World queries and runtime interaction.

The query surface of the public C API (reference: include/solver2d/solver2d.h):
- AABB query over live shapes        (s2World_QueryAABB, src/world.c:605-615)
- point test                          (s2Shape_TestPoint, src/shape.c:110-137)
- world raycast                       (per-shape raycasts, src/geometry.c)
- mouse picking: query + mouse joint  (samples/sample.cpp:69-123)

Queries are brute-force masked scans over the fixed-capacity shape table —
the batch analog of the tree query (a fat-AABB prefilter keeps them cheap).
All functions jittable; mouse attach/detach are functional State updates.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .ops import math2d as m
from .ops.raycast import RayHit, point_in_shape, raycast_shape
from .state import State


def query_aabb(state: State, lo, hi) -> jnp.ndarray:
    """Boolean mask [S] of live shapes whose fat AABB overlaps [lo, hi]."""
    fat = state.shapes.fat_aabb
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    overlap = (
        (fat[:, 0] <= hi[0]) & (lo[0] <= fat[:, 2])
        & (fat[:, 1] <= hi[1]) & (lo[1] <= fat[:, 3])
    )
    return overlap & state.shapes.alive


def test_point(state: State, point) -> jnp.ndarray:
    """Boolean mask [S]: live shapes containing the world point."""
    shapes = state.shapes
    bodies = state.bodies
    point = jnp.asarray(point, jnp.float32)
    b = shapes.body
    local = m.inv_transform_point(bodies.origin[b], bodies.rot[b], point)
    inside = jax.vmap(point_in_shape)(
        local, shapes.verts, shapes.count, shapes.radius,
    )
    return inside & shapes.alive


def _ray_aabb_enter(fat, p1, p2):
    """Slab test of segment p1->p2 vs fat AABBs [S,4]. Returns (hit mask,
    clamped entry fraction) — the same culling the reference's tree raycast
    performs per node (reference: src/dynamic_tree.c:1213-1315, src/aabb.c:19)."""
    d = p2 - p1
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    t1 = (fat[:, 0:2] - p1[None, :]) * inv[None, :]
    t2 = (fat[:, 2:4] - p1[None, :]) * inv[None, :]
    tmin = jnp.minimum(t1, t2).max(-1)
    tmax = jnp.maximum(t1, t2).min(-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin <= 1.0)
    return hit, jnp.maximum(tmin, 0.0)


def raycast_world(state: State, p1, p2, max_candidates: int = 64) -> RayHit:
    """Nearest hit along segment p1->p2.

    Small scenes run the exact brute-force scan. Large scenes (flagship
    scales: Pyramid-100 has ~5k shapes) first slab-cull against fat AABBs and
    run the full per-shape raycast only on the `max_candidates` nearest-entry
    candidates — the vectorized analog of the reference's AABB-tree raycast
    (src/dynamic_tree.c:1213-1315), which also visits only AABB-hit leaves."""
    shapes = state.shapes
    bodies = state.bodies
    p1 = jnp.asarray(p1, jnp.float32)
    p2 = jnp.asarray(p2, jnp.float32)
    S = shapes.verts.shape[0]

    if S <= max_candidates:
        cand = jnp.arange(S, dtype=jnp.int32)
        cand_ok = shapes.alive
    else:
        ab_hit, t_enter = _ray_aabb_enter(shapes.fat_aabb, p1, p2)
        ab_hit = ab_hit & shapes.alive
        key = jnp.where(ab_hit, t_enter, jnp.inf)
        neg_top, cand = jax.lax.top_k(-key, max_candidates)
        cand = cand.astype(jnp.int32)
        cand_ok = neg_top != -jnp.inf

    b = shapes.body[cand]
    l1 = m.inv_transform_point(bodies.origin[b], bodies.rot[b], p1)
    l2 = m.inv_transform_point(bodies.origin[b], bodies.rot[b], p2)

    ok, frac, pt, n = jax.vmap(raycast_shape, in_axes=(0, 0, None, 0, 0, 0))(
        l1, l2, jnp.float32(1.0), shapes.verts[cand], shapes.count[cand], shapes.radius[cand]
    )
    ok = ok & cand_ok
    frac = jnp.where(ok, frac, jnp.inf)
    best = jnp.argmin(frac).astype(jnp.int32)
    hit = ok.any()
    best_shape = cand[best]
    q = bodies.rot[b[best]]
    p0 = bodies.origin[b[best]]
    return RayHit(
        hit=hit,
        fraction=jnp.where(hit, frac[best], 1.0),
        point=jnp.where(hit, m.transform_point(p0, q, pt[best]), 0.0),
        normal=jnp.where(hit, m.rotate(q, n[best]), 0.0),
        shape=jnp.where(hit, best_shape, -1),
    )


# --- mouse picking (reference: samples/sample.cpp:69-123) ---

def pick_body(state: State, point):
    """Returns (found, body_index): topmost dynamic body containing the point."""
    inside = test_point(state, point)
    b = state.shapes.body
    dyn = state.bodies.type[b] == 2
    cand = inside & dyn
    idx = jnp.argmax(cand)
    return cand.any(), jnp.where(cand.any(), b[idx], -1)


def attach_mouse_joint(state: State, slot: int, body: int, target, hertz: float = 7.5, damping_ratio: float = 0.7, ground_body: int = 0) -> State:
    """Enable joint `slot` as a mouse joint dragging `body` toward `target`.

    The testbed uses hertz = 0.5 * frequency with damping 0.7 on a dummy
    ground body (sample.cpp:90-100); any static body works as bodyA here."""
    j = state.joints
    target = jnp.asarray(target, jnp.float32)
    bds = state.bodies
    local_b = m.inv_transform_point(bds.origin[body], bds.rot[body], target)
    upd = lambda arr, val: arr.at[slot].set(val)
    joints = dataclasses.replace(
        j,
        type=upd(j.type, 1),
        body_a=upd(j.body_a, ground_body),
        body_b=upd(j.body_b, body),
        local_anchor_a=upd(j.local_anchor_a, jnp.zeros(2)),
        local_anchor_b=upd(j.local_anchor_b, local_b),
        collide_connected=upd(j.collide_connected, True),
        target=upd(j.target, target),
        hertz=upd(j.hertz, hertz),
        damping_ratio=upd(j.damping_ratio, damping_ratio),
        impulse=j.impulse.at[slot].set(0.0),
        motor_impulse=upd(j.motor_impulse, 0.0),
        color=upd(j.color, -1),
        alive=upd(j.alive, True),
    )
    return dataclasses.replace(state, joints=joints)


def move_mouse_target(state: State, slot: int, target) -> State:
    """s2MouseJoint_SetTarget (reference: src/mouse_joint.c:18-29)."""
    j = state.joints
    joints = dataclasses.replace(j, target=j.target.at[slot].set(jnp.asarray(target, jnp.float32)))
    return dataclasses.replace(state, joints=joints)


def detach_mouse_joint(state: State, slot: int) -> State:
    j = state.joints
    return dataclasses.replace(state, joints=dataclasses.replace(j, alive=j.alive.at[slot].set(False)))
