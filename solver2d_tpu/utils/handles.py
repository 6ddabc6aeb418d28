"""Slot reuse + ABA-safe handles for the fixed-capacity SoA state.

The reference's pools hand out `{index, revision}` ids and bump the revision
on free, so a stale id can never silently address a reused slot
(reference: include/solver2d/id.h:12-45, src/pool.h:38-47). The TPU state is
fixed-capacity arrays with alive masks, so allocation policy is host-side by
nature; this module provides the same safety contract:

- `HandlePool` tracks free slots (lowest-index-first, like s2AllocObject) and
  per-slot revision counters for one entity class;
- `WorldHandles.for_state` builds pools for bodies/shapes/joints of a frozen
  State;
- `create_body` / `destroy_body` (and shape/joint analogs) allocate/release
  slots, validate revisions, and return/consume typed ids. A stale id raises
  `StaleHandleError` instead of mutating another entity's slot.

Device arrays stay pure: the pool only decides indices; all state mutation
goes through the functional `utils.runtime` primitives.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

from ..state import State


class BodyId(NamedTuple):
    index: int
    revision: int


class ShapeId(NamedTuple):
    index: int
    revision: int


class JointId(NamedTuple):
    index: int
    revision: int


class StaleHandleError(RuntimeError):
    """Raised when an id's revision does not match the slot's revision
    (the slot was freed, and possibly reused, since the id was issued)."""


class PoolExhaustedError(RuntimeError):
    pass


class HandlePool:
    """Free-list + revision counters for one entity class (reference:
    src/pool.c s2AllocObject/s2FreeObject)."""

    def __init__(self, capacity: int, used):
        self.capacity = capacity
        self.revision = np.zeros(capacity, np.int64)
        used = set(int(u) for u in used)
        # lowest-index-first like the reference's free list after creation
        self._free = sorted(set(range(capacity)) - used, reverse=True)

    def alloc(self) -> tuple[int, int]:
        if not self._free:
            raise PoolExhaustedError(
                f"no free slots (capacity {self.capacity}); grow the SimConfig capacity"
            )
        idx = self._free.pop()
        return idx, int(self.revision[idx])

    def free(self, index: int, revision: int):
        self.check(index, revision)
        self.revision[index] += 1  # invalidate every outstanding id
        self._free.append(index)
        self._free.sort(reverse=True)

    def check(self, index: int, revision: int):
        if not (0 <= index < self.capacity) or int(self.revision[index]) != revision:
            raise StaleHandleError(
                f"stale handle: slot {index} revision {revision} != {int(self.revision[index])}"
            )

    def is_valid(self, index: int, revision: int) -> bool:
        return 0 <= index < self.capacity and int(self.revision[index]) == revision


@dataclasses.dataclass
class WorldHandles:
    """Handle pools for one world's body/shape/joint tables."""

    bodies: HandlePool
    shapes: HandlePool
    joints: HandlePool

    @classmethod
    def for_state(cls, state: State) -> "WorldHandles":
        balive = np.asarray(state.bodies.alive)
        salive = np.asarray(state.shapes.alive)
        jalive = np.asarray(state.joints.alive)
        return cls(
            bodies=HandlePool(balive.shape[0], np.nonzero(balive)[0]),
            shapes=HandlePool(salive.shape[0], np.nonzero(salive)[0]),
            joints=HandlePool(jalive.shape[0], np.nonzero(jalive)[0]),
        )

    # --- bodies ---

    def create_body(self, state: State, position=(0.0, 0.0), angle: float = 0.0,
                    body_type: int = 2, mass: float = 1.0, inertia: float = 1.0,
                    velocity=(0.0, 0.0), angular_velocity: float = 0.0) -> tuple[State, BodyId]:
        """Reuse a free body slot (reference: src/body.c:17-63). The new body
        has no shapes; attach with create_circle/box_shape."""
        import jax.numpy as jnp

        idx, rev = self.bodies.alloc()
        b = state.bodies
        upd = lambda arr, val: arr.at[idx].set(val)
        pos = jnp.asarray(position, jnp.float32)
        from ..ops import math2d as m

        rot = m.make_rot(jnp.float32(angle))
        bodies = dataclasses.replace(
            b,
            type=upd(b.type, body_type),
            origin=upd(b.origin, pos),
            position=upd(b.position, pos),
            delta_pos=upd(b.delta_pos, 0.0),
            rot=upd(b.rot, rot),
            rot0=upd(b.rot0, rot),
            local_center=upd(b.local_center, 0.0),
            v=upd(b.v, jnp.asarray(velocity, jnp.float32)),
            w=upd(b.w, angular_velocity),
            force=upd(b.force, 0.0),
            torque=upd(b.torque, 0.0),
            mass=upd(b.mass, mass),
            inv_mass=upd(b.inv_mass, 1.0 / mass if (mass > 0 and body_type == 2) else 0.0),
            inertia=upd(b.inertia, inertia),
            inv_inertia=upd(b.inv_inertia, 1.0 / inertia if (inertia > 0 and body_type == 2) else 0.0),
            gravity_scale=upd(b.gravity_scale, 1.0),
            linear_damping=upd(b.linear_damping, 0.0),
            angular_damping=upd(b.angular_damping, 0.0),
            alive=upd(b.alive, True),
        )
        return dataclasses.replace(state, bodies=bodies), BodyId(idx, rev)

    def destroy_body(self, state: State, bid: BodyId) -> State:
        """Validated destroy; frees the slot and invalidates the id. Shapes
        and joints of the body are disabled but their slots are only freed if
        they were created through this handle layer too (scene-built shapes
        keep their indices for rebuilds)."""
        from . import runtime

        self.bodies.free(bid.index, bid.revision)
        return runtime.destroy_body(state, bid.index)

    # --- shapes ---

    def create_circle_shape(self, state: State, bid: BodyId, center, radius: float,
                            friction: float = 0.6, restitution: float = 0.0) -> tuple[State, ShapeId]:
        from ..ops import geometry

        self.bodies.check(bid.index, bid.revision)
        return self._create_shape(state, bid.index, geometry.circle(center, radius), friction, restitution)

    def create_box_shape(self, state: State, bid: BodyId, hx: float, hy: float,
                         friction: float = 0.6, restitution: float = 0.0) -> tuple[State, ShapeId]:
        from ..ops import geometry

        self.bodies.check(bid.index, bid.revision)
        return self._create_shape(state, bid.index, geometry.box(hx, hy), friction, restitution)

    def _create_shape(self, state: State, body_idx: int, geom, friction, restitution) -> tuple[State, ShapeId]:
        import jax.numpy as jnp

        idx, rev = self.shapes.alloc()
        s = state.shapes
        upd = lambda arr, val: arr.at[idx].set(val)
        # conservative initial fat AABB: recomputed properly at the next step's
        # finalize from the body pose
        b = state.bodies
        origin = b.origin[body_idx]
        ext = float(np.abs(np.asarray(geom.verts)).max() + geom.radius + 0.2)
        lo = origin - ext
        hi = origin + ext
        shapes = dataclasses.replace(
            s,
            body=upd(s.body, body_idx),
            source_type=upd(s.source_type, int(geom.source_type)),
            verts=upd(s.verts, jnp.asarray(geom.verts)),
            normals=upd(s.normals, jnp.asarray(geom.normals)),
            count=upd(s.count, int(geom.count)),
            radius=upd(s.radius, float(geom.radius)),
            friction=upd(s.friction, friction),
            restitution=upd(s.restitution, restitution),
            density=upd(s.density, 1.0),
            filter_category=upd(s.filter_category, 1),
            filter_mask=upd(s.filter_mask, 0xFFFFFFFF),
            filter_group=upd(s.filter_group, 0),
            aabb=upd(s.aabb, jnp.concatenate([lo, hi])),
            fat_aabb=upd(s.fat_aabb, jnp.concatenate([lo, hi])),
            alive=upd(s.alive, True),
        )
        return dataclasses.replace(state, shapes=shapes), ShapeId(idx, rev)

    def destroy_shape(self, state: State, sid: ShapeId) -> State:
        from . import runtime

        self.shapes.free(sid.index, sid.revision)
        return runtime.destroy_shape(state, sid.index)

    # --- joints ---

    def destroy_joint(self, state: State, jid: JointId) -> State:
        from . import runtime

        self.joints.free(jid.index, jid.revision)
        return runtime.destroy_joint(state, jid.index)

    def alloc_joint_slot(self) -> JointId:
        """Reserve a joint slot (e.g. for queries.attach_mouse_joint)."""
        idx, rev = self.joints.alloc()
        return JointId(idx, rev)
