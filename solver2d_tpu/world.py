"""Host-side scene construction API.

Mirrors the public C API surface (reference: include/solver2d/solver2d.h:22-70):
world/body/shape/joint creation with the same defs and defaults
(reference: include/solver2d/types.h:90-156). Construction happens eagerly in
numpy; `freeze()` packs everything into the fixed-capacity SoA `State` pytree
and a hashable `SimConfig`, after which stepping is a pure jitted function.

Mass properties are accumulated per body exactly like s2ComputeMass
(reference: src/body.c:152-218): sum shape masses, parallel-axis shift of
inertia to the center of mass, and center-of-mass velocity fixup.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .config import (
    AABB_MARGIN,
    SPECULATIVE_DISTANCE,
    BodyType,
    SimConfig,
    SolverType,
)
from .ops import geometry
from .state import Bodies, Contacts, Diagnostics, Joints, Shapes, State


@dataclasses.dataclass
class BodyDef:
    """reference: include/solver2d/types.h:107-130"""

    type: BodyType = BodyType.STATIC
    position: tuple = (0.0, 0.0)
    angle: float = 0.0
    linear_velocity: tuple = (0.0, 0.0)
    angular_velocity: float = 0.0
    linear_damping: float = 0.0
    angular_damping: float = 0.0
    gravity_scale: float = 1.0


@dataclasses.dataclass
class ShapeDef:
    """reference: include/solver2d/types.h:141-156"""

    friction: float = 0.6
    restitution: float = 0.0
    density: float = 1.0
    filter_category: int = 0x1
    filter_mask: int = 0xFFFFFFFF
    filter_group: int = 0


@dataclasses.dataclass
class _Body:
    def_: BodyDef
    shapes: list = dataclasses.field(default_factory=list)  # indices into world.shapes
    # mass properties (computed incrementally)
    mass: float = 0.0
    inertia: float = 0.0
    local_center: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(2))
    linear_velocity: np.ndarray = None  # updated by COM shifts
    alive: bool = True

    def __post_init__(self):
        self.linear_velocity = np.asarray(self.def_.linear_velocity, np.float64).copy()


@dataclasses.dataclass
class _Shape:
    body: int
    geom: geometry.ShapeGeom
    def_: ShapeDef
    alive: bool = True


@dataclasses.dataclass
class _Joint:
    type: int  # 0 revolute, 1 mouse
    body_a: int
    body_b: int
    local_anchor_a: np.ndarray
    local_anchor_b: np.ndarray
    collide_connected: bool = False
    reference_angle: float = 0.0
    lower_angle: float = 0.0
    upper_angle: float = 0.0
    enable_limit: bool = False
    enable_motor: bool = False
    motor_speed: float = 0.0
    max_motor_torque: float = 0.0
    target: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(2))
    hertz: float = 0.0
    damping_ratio: float = 0.0
    alive: bool = True


def _rot_of(angle):
    return np.array([np.sin(angle), np.cos(angle)], np.float64)


def _rotate(rot, v):
    s, c = rot
    return np.array([c * v[0] - s * v[1], s * v[0] + c * v[1]])


class World:
    """Scene builder. One instance per scene; freeze() to simulate."""

    def __init__(self, solver: SolverType = SolverType.PGS_NGS_BLOCK, gravity=(0.0, -10.0), defer_mass: bool = True):
        """defer_mass: batch mass computation at freeze() (via the native C++
        scene compiler when available) instead of incrementally per
        create_shape — much faster for large scenes. Mass-dependent build-time
        ops (apply_linear_impulse) force on-demand computation either way."""
        self.solver = solver
        self.gravity = np.asarray(gravity, np.float64)
        self.defer_mass = defer_mass
        self.bodies: list[_Body] = []
        self.shapes: list[_Shape] = []
        self.joints: list[_Joint] = []

    # --- bodies (reference: src/body.c:17-150) ---

    def create_body(self, def_: Optional[BodyDef] = None, **kw) -> int:
        if def_ is None:
            def_ = BodyDef(**kw)
        elif kw:
            def_ = dataclasses.replace(def_, **kw)
        self.bodies.append(_Body(def_))
        return len(self.bodies) - 1

    # --- shapes (reference: src/body.c:220-314) ---

    def create_shape(self, body: int, geom: geometry.ShapeGeom, def_: Optional[ShapeDef] = None, **kw) -> int:
        if def_ is None:
            def_ = ShapeDef(**kw)
        elif kw:
            def_ = dataclasses.replace(def_, **kw)
        self.shapes.append(_Shape(body, geom, def_))
        idx = len(self.shapes) - 1
        b = self.bodies[body]
        b.shapes.append(idx)
        if def_.density > 0.0 and not self.defer_mass:
            self._compute_mass(body)
        return idx

    def create_circle_shape(self, body: int, center, radius: float, **kw) -> int:
        return self.create_shape(body, geometry.circle(center, radius), **kw)

    def create_capsule_shape(self, body: int, p1, p2, radius: float, **kw) -> int:
        return self.create_shape(body, geometry.capsule(p1, p2, radius), **kw)

    def create_polygon_shape(self, body: int, geom_or_points, **kw) -> int:
        geom = geom_or_points
        if not isinstance(geom, geometry.ShapeGeom):
            geom = geometry.polygon(geom_or_points)
        return self.create_shape(body, geom, **kw)

    def create_segment_shape(self, body: int, p1, p2, **kw) -> int:
        return self.create_shape(body, geometry.segment(p1, p2), **kw)

    def _compute_mass(self, body_idx: int):
        """reference: src/body.c:152-218"""
        b = self.bodies[body_idx]
        b.mass = 0.0
        b.inertia = 0.0
        old_center_offset = b.local_center.copy()
        b.local_center = np.zeros(2)
        if b.def_.type != BodyType.DYNAMIC:
            return
        local_center = np.zeros(2)
        for si in b.shapes:
            s = self.shapes[si]
            if not s.alive or s.def_.density == 0.0:
                continue
            md = geometry.compute_mass(s.geom, s.def_.density)
            b.mass += md.mass
            local_center += md.mass * md.center
            b.inertia += md.inertia
        if b.mass > 0.0:
            local_center /= b.mass
        if b.inertia > 0.0:
            b.inertia -= b.mass * (local_center @ local_center)
        else:
            b.inertia = 0.0
        b.local_center = local_center
        # COM velocity fixup (body.c:215-217)
        rot = _rot_of(b.def_.angle)
        delta_center = _rotate(rot, local_center - old_center_offset)
        w = b.def_.angular_velocity
        b.linear_velocity = b.linear_velocity + w * np.array([-delta_center[1], delta_center[0]])

    # --- body helpers ---

    def apply_linear_impulse(self, body: int, impulse, point):
        """Build-time impulse application (reference: src/body.c:316-384)."""
        b = self.bodies[body]
        if self.defer_mass and b.mass == 0.0 and b.def_.type == BodyType.DYNAMIC:
            self._compute_mass(body)
        if b.mass <= 0.0:
            return
        impulse = np.asarray(impulse, np.float64)
        point = np.asarray(point, np.float64)
        rot = _rot_of(b.def_.angle)
        com = np.asarray(b.def_.position, np.float64) + _rotate(rot, b.local_center)
        b.linear_velocity = b.linear_velocity + impulse / b.mass
        r = point - com
        b.def_.angular_velocity += (r[0] * impulse[1] - r[1] * impulse[0]) / b.inertia

    def get_local_point(self, body: int, world_point):
        """World point -> body origin frame (s2Body_GetLocalPoint)."""
        return _inv_transform(self.bodies[body], world_point)

    def body_position(self, body: int):
        return np.asarray(self.bodies[body].def_.position, np.float64)

    # --- joints (reference: src/joint.c:154-223) ---

    def create_revolute_joint(
        self,
        body_a: int,
        body_b: int,
        local_anchor_a=(0.0, 0.0),
        local_anchor_b=(0.0, 0.0),
        reference_angle: float = 0.0,
        lower_angle: float = 0.0,
        upper_angle: float = 0.0,
        enable_limit: bool = False,
        enable_motor: bool = False,
        motor_speed: float = 0.0,
        max_motor_torque: float = 0.0,
        collide_connected: bool = False,
    ) -> int:
        self.joints.append(
            _Joint(
                0, body_a, body_b,
                np.asarray(local_anchor_a, np.float64), np.asarray(local_anchor_b, np.float64),
                collide_connected, reference_angle, lower_angle, upper_angle,
                enable_limit, enable_motor, motor_speed, max_motor_torque,
            )
        )
        return len(self.joints) - 1

    def create_mouse_joint(self, body_a: int, body_b: int, target, hertz: float, damping_ratio: float) -> int:
        """bodyB is dragged toward target (reference: src/joint.c:154-179)."""
        target = np.asarray(target, np.float64)
        bA, bB = self.bodies[body_a], self.bodies[body_b]
        la = _inv_transform(bA, target)
        lb = _inv_transform(bB, target)
        j = _Joint(1, body_a, body_b, la, lb, collide_connected=True)
        j.target = target
        j.hertz = hertz
        j.damping_ratio = damping_ratio
        self.joints.append(j)
        return len(self.joints) - 1

    def _batch_compute_mass(self):
        """Deferred mass computation for all dynamic bodies at freeze time —
        via the native C++ scene compiler (csrc/s2native.cpp) when available,
        else the per-body Python path. Applies the same COM-velocity fixup as
        the incremental path (reference: src/body.c:215-217)."""
        from . import native

        pending = [
            i for i, b in enumerate(self.bodies)
            if b.def_.type == BodyType.DYNAMIC and b.mass == 0.0 and b.shapes
        ]
        if not pending:
            return
        if not native.available():
            for i in pending:
                self._compute_mass(i)
            return

        ns = len(self.shapes)
        nb = len(self.bodies)
        verts = np.stack([s.geom.verts for s in self.shapes]) if ns else np.zeros((0, 8, 2), np.float32)
        normals = np.stack([s.geom.normals for s in self.shapes]) if ns else np.zeros((0, 8, 2), np.float32)
        counts = np.array([s.geom.count for s in self.shapes], np.int32)
        radii = np.array([s.geom.radius for s in self.shapes], np.float32)
        densities = np.array([s.def_.density if s.alive else 0.0 for s in self.shapes], np.float32)
        shape_body = np.array([s.body for s in self.shapes], np.int32)
        body_origin = np.array([b.def_.position for b in self.bodies], np.float32).reshape(nb, 2)
        body_angle = np.array([b.def_.angle for b in self.bodies], np.float32)
        body_type = np.array([int(b.def_.type) for b in self.bodies], np.int32)

        from .config import AABB_MARGIN, SPECULATIVE_DISTANCE

        out = native.compile_scene(
            verts, normals, counts, radii, densities, shape_body,
            body_origin, body_angle, body_type, SPECULATIVE_DISTANCE, AABB_MARGIN,
        )
        for i in pending:
            b = self.bodies[i]
            b.mass = float(out["mass"][i])
            b.inertia = float(out["inertia"][i])
            old_center = b.local_center.copy()
            b.local_center = out["local_center"][i].astype(np.float64)
            rot = _rot_of(b.def_.angle)
            delta_center = _rotate(rot, b.local_center - old_center)
            w = b.def_.angular_velocity
            b.linear_velocity = b.linear_velocity + w * np.array([-delta_center[1], delta_center[0]])

    # --- freeze ---

    def _color_defaults(self) -> tuple[int, int]:
        """Scene-aware (max_colors, joint_max_colors): greedy first-fit needs
        ~(max constraint degree + 1) colors, so derive the degree bound from
        the built scene instead of trusting callers — under-coloring silently
        skips constraints (diag.color_overflow) and sinks stacks.

        Joint degree is exact (the joint graph is static). Contact degree is
        estimated from initial fat-AABB overlaps — scenes are typically built
        at rest (stacks/pyramids), so the initial overlap graph tracks the
        runtime contact graph; a floor of 8 covers convex shapes in scenes
        that start separated and pile up (a disc packs ~6 neighbours)."""
        nb = len(self.bodies)
        jdeg = np.zeros(max(nb, 1), np.int64)
        for j in self.joints:
            if not j.alive:
                continue
            for b in (j.body_a, j.body_b):
                if self.bodies[b].def_.type == BodyType.DYNAMIC:
                    jdeg[b] += 1
        joint_colors = int(min(30, max(8, int(jdeg.max()) + 2)))

        live = [s for s in self.shapes if s.alive]
        if not live:
            return 8, joint_colors
        n = len(live)
        lo = np.zeros((n, 2)); hi = np.zeros((n, 2))
        sbody = np.zeros(n, np.int64)
        dyn_body = np.array([b.def_.type == BodyType.DYNAMIC for b in self.bodies], bool)
        for i, s in enumerate(live):
            b = self.bodies[s.body]
            rot = _rot_of(b.def_.angle)
            origin = np.asarray(b.def_.position, np.float64)
            world = origin + np.stack([_rotate(rot, v) for v in s.geom.verts[: s.geom.count]])
            margin = SPECULATIVE_DISTANCE if b.def_.type == BodyType.STATIC else AABB_MARGIN + SPECULATIVE_DISTANCE
            lo[i] = world.min(0) - s.geom.radius - SPECULATIVE_DISTANCE - margin
            hi[i] = world.max(0) + s.geom.radius + SPECULATIVE_DISTANCE + margin
            sbody[i] = s.body
        deg = np.zeros(max(nb, 1), np.int64)
        sdyn = dyn_body[sbody]
        for c0 in range(0, n, 512):   # chunked O(S^2) broadcast, ~MBs per chunk
            c1 = min(c0 + 512, n)
            ov = (
                (lo[c0:c1, None, 0] <= hi[None, :, 0]) & (lo[None, :, 0] <= hi[c0:c1, None, 0])
                & (lo[c0:c1, None, 1] <= hi[None, :, 1]) & (lo[None, :, 1] <= hi[c0:c1, None, 1])
                & (sbody[c0:c1, None] != sbody[None, :])
                & (sdyn[c0:c1, None] | sdyn[None, :])
            )
            np.add.at(deg, sbody[c0:c1], ov.sum(axis=1))
        cdeg = int(deg[dyn_body].max()) if dyn_body.any() else 0
        return int(min(30, max(8, cdeg + 2))), joint_colors

    def default_config(self, **overrides) -> SimConfig:
        def _round(n, m):
            return max(m, ((n + m - 1) // m) * m)

        nb = _round(len(self.bodies) + 1, 8)
        ns = _round(len(self.shapes) + 1, 8)
        nj = _round(len(self.joints) + 1, 8)
        # generous contact budget: ~8 per dynamic shape is far above observed
        # max contact density for convex shapes
        ndyn = sum(1 for s in self.shapes if self.bodies[s.body].def_.type == BodyType.DYNAMIC)
        nc = _round(max(64, 8 * max(ndyn, 1)), 64)

        # auto-size the broadphase grid: cell fits the typical dynamic shape's
        # fat AABB (extent + speculative/margin padding); larger shapes go to
        # the big list
        extents = []
        for s in self.shapes:
            if not s.alive:
                continue
            g = s.geom
            v = g.verts[: g.count]
            ext = float(max(v[:, 0].max() - v[:, 0].min(), v[:, 1].max() - v[:, 1].min()) + 2 * g.radius)
            pad = 2 * (AABB_MARGIN + 2 * SPECULATIVE_DISTANCE)
            extents.append((ext + pad, self.bodies[s.body].def_.type == BodyType.DYNAMIC))
        dyn_ext = sorted(e for e, d in extents if d) or [1.0]
        cell = max(0.3, 1.05 * dyn_ext[int(0.9 * (len(dyn_ext) - 1))])
        n_big = sum(1 for e, _ in extents if e > cell)
        max_colors, joint_max_colors = self._color_defaults()
        cfg = SimConfig(
            solver=self.solver, max_bodies=nb, max_shapes=ns, max_contacts=nc, max_joints=nj,
            grid_cell=cell, max_big_shapes=_round(n_big + 4, 4),
            max_colors=max_colors, joint_max_colors=joint_max_colors,
        )
        return cfg.replace(**overrides) if overrides else cfg

    def freeze(self, config: Optional[SimConfig] = None, **overrides) -> tuple[State, SimConfig]:
        import jax.numpy as jnp

        if config is None:
            config = self.default_config(**overrides)
        assert config.max_bodies >= len(self.bodies)
        assert config.max_shapes >= len(self.shapes)
        assert config.max_joints >= len(self.joints)

        if self.defer_mass:
            self._batch_compute_mass()
        if config.use_pallas_solver:
            # scoped-VMEM gate: the compiler's scoped allocation includes
            # Mosaic matmul transpose buffers and loop temporaries, ~6x our
            # persistent [C,B]/[J,B] matrices (bench scene 216x896 = 193K
            # needs 23.57 MiB scoped — exp/pallas_vmem_probe.py).
            # pallas_solver.py raises vmem_limit_bytes to 100 MiB (v5e has
            # 128 MiB physical), which admits B*(C+J) up to ~2^18 with
            # headroom for the rest.
            assert config.max_bodies * (config.max_contacts + config.max_joints) <= (1 << 18), (
                "use_pallas_solver: incidence matrices exceed VMEM; reduce capacities"
            )
            from .config import SolverType as _ST

            assert config.solver in (_ST.TGS_SOFT, _ST.SOFT_STEP, _ST.PGS_SOFT), (
                "use_pallas_solver covers TGS_SOFT / SOFT_STEP / PGS_SOFT"
            )
        # pair keys pack as shape_a * max_shapes + shape_b in int32
        assert config.max_shapes * config.max_shapes < (1 << 31), (
            "max_shapes too large for int32 pair keys"
        )
        assert config.solve_joints or not any(j.alive for j in self.joints), (
            "solve_joints=False is a joint-free-scene optimization; this "
            "scene has live joints (they would be silently ignored)"
        )
        if config.lane_solve:
            assert config.solve_contacts, "lane_solve IS the contact solve"
            # lane matching transports pair keys as exact f32 (chip-safe)
            assert config.max_shapes * config.max_shapes < (1 << 24), (
                "lane_solve: pair keys must fit f32 exactly (max_shapes < 4096)"
            )
            from .config import LANE_SOLVERS

            assert config.solver in LANE_SOLVERS, (
                f"lane_solve supports {sorted(s.name for s in LANE_SOLVERS)}; "
                f"got {config.solver.name}"
            )
            assert config.incremental_coloring and not config.use_pallas_solver
            assert not config.solve_joints, (
                "lane_solve covers contacts only; freeze(solve_joints=False)"
            )
            assert config.contact_bucket_cap != 0, (
                "lane_solve requires the bucketed layout (contact_bucket_cap=-1 auto)"
            )
        if config.contact_bucket_cap < 0:
            # auto-size the bucketed solve's per-color capacity: 2x uniform
            # share of the contact table (rounded up to a multiple of 8)
            # gives the capacity-aware coloring room to balance colors
            cap = -(-2 * config.max_contacts // config.max_colors)
            config = config.replace(contact_bucket_cap=(cap + 7) // 8 * 8)
        if config.joint_bucket_cap < 0:
            jcap = -(-2 * config.max_joints // config.joint_max_colors)
            config = config.replace(joint_bucket_cap=(jcap + 7) // 8 * 8)
        if config.incremental_coloring and (config.max_colors > 30 or config.joint_max_colors > 30):
            # assign_colors packs used colors into an i32 bitmask; fall back
            # to per-step MIS coloring rather than failing at trace time
            import warnings

            warnings.warn(
                f"max_colors={config.max_colors}/joint_max_colors={config.joint_max_colors} "
                "> 30: incremental coloring needs an i32 bitmask; falling back to "
                "per-step MIS coloring (incremental_coloring=False)",
                stacklevel=2,
            )
            config = config.replace(incremental_coloring=False)

        state = State.zeros(config)
        nb, ns, nj = len(self.bodies), len(self.shapes), len(self.joints)

        # Bodies
        B = {k: np.array(v) for k, v in _soa_zeros_bodies(config.max_bodies).items()}
        for i, b in enumerate(self.bodies):
            d = b.def_
            rot = _rot_of(d.angle)
            origin = np.asarray(d.position, np.float64)
            com = origin + _rotate(rot, b.local_center)
            B["type"][i] = int(d.type)
            B["origin"][i] = origin
            B["position"][i] = com
            B["rot"][i] = rot
            B["rot0"][i] = rot
            B["local_center"][i] = b.local_center
            B["v"][i] = b.linear_velocity
            B["w"][i] = d.angular_velocity
            B["mass"][i] = b.mass
            B["inv_mass"][i] = 1.0 / b.mass if b.mass > 0 else 0.0
            B["inertia"][i] = b.inertia
            B["inv_inertia"][i] = 1.0 / b.inertia if b.inertia > 0 else 0.0
            B["linear_damping"][i] = d.linear_damping
            B["angular_damping"][i] = d.angular_damping
            B["gravity_scale"][i] = d.gravity_scale
            B["alive"][i] = b.alive

        bodies = Bodies(**{k: jnp.asarray(v) for k, v in B.items()})

        # Shapes
        S = _soa_zeros_shapes(config.max_shapes)
        for i, s in enumerate(self.shapes):
            g = s.geom
            S["body"][i] = s.body
            S["source_type"][i] = int(g.source_type)
            S["verts"][i] = g.verts
            S["normals"][i] = g.normals
            S["count"][i] = g.count
            S["radius"][i] = g.radius
            S["friction"][i] = s.def_.friction
            S["restitution"][i] = s.def_.restitution
            S["density"][i] = s.def_.density
            S["filter_category"][i] = s.def_.filter_category
            S["filter_mask"][i] = s.def_.filter_mask
            S["filter_group"][i] = s.def_.filter_group
            S["alive"][i] = s.alive
            # initial AABB + fat AABB (reference: src/shape.c:48-67)
            b = self.bodies[s.body]
            rot = _rot_of(b.def_.angle)
            origin = np.asarray(b.def_.position, np.float64)
            world = origin + np.stack([_rotate(rot, v) for v in g.verts[: g.count]])
            lo = world.min(0) - g.radius - SPECULATIVE_DISTANCE
            hi = world.max(0) + g.radius + SPECULATIVE_DISTANCE
            S["aabb"][i] = np.concatenate([lo, hi])
            margin = SPECULATIVE_DISTANCE if b.def_.type == BodyType.STATIC else AABB_MARGIN + SPECULATIVE_DISTANCE
            S["fat_aabb"][i] = np.concatenate([lo - margin, hi + margin])

        shapes = Shapes(**{k: jnp.asarray(v) for k, v in S.items()})

        # Joints
        J = _soa_zeros_joints(config.max_joints)
        for i, j in enumerate(self.joints):
            J["type"][i] = j.type
            J["body_a"][i] = j.body_a
            J["body_b"][i] = j.body_b
            J["local_anchor_a"][i] = j.local_anchor_a
            J["local_anchor_b"][i] = j.local_anchor_b
            J["collide_connected"][i] = j.collide_connected
            J["reference_angle"][i] = j.reference_angle
            J["lower_angle"][i] = j.lower_angle
            J["upper_angle"][i] = j.upper_angle
            J["enable_limit"][i] = j.enable_limit
            J["enable_motor"][i] = j.enable_motor
            J["motor_speed"][i] = j.motor_speed
            J["max_motor_torque"][i] = j.max_motor_torque
            J["target"][i] = j.target
            J["hertz"][i] = j.hertz
            J["damping_ratio"][i] = j.damping_ratio
            J["alive"][i] = j.alive

        joints = Joints(**{k: jnp.asarray(v) for k, v in J.items()})

        state = State(
            bodies=bodies,
            shapes=shapes,
            contacts=Contacts.zeros(
                config.max_contacts, sticky=config.solver == SolverType.TGS_STICKY
            ),
            joints=joints,
            gravity=jnp.asarray(self.gravity, jnp.float32),
            diag=Diagnostics.zeros(),
        )
        return state, config


def _inv_transform(b: _Body, p):
    rot = _rot_of(b.def_.angle)
    v = np.asarray(p, np.float64) - np.asarray(b.def_.position, np.float64)
    s, c = rot
    return np.array([c * v[0] + s * v[1], -s * v[0] + c * v[1]])


def _soa_zeros_bodies(n):
    return {
        "type": np.zeros((n,), np.int32),
        "origin": np.zeros((n, 2), np.float32),
        "position": np.zeros((n, 2), np.float32),
        "delta_pos": np.zeros((n, 2), np.float32),
        "delta_pos0": np.zeros((n, 2), np.float32),
        "rot": np.tile(np.array([0.0, 1.0], np.float32), (n, 1)),
        "rot0": np.tile(np.array([0.0, 1.0], np.float32), (n, 1)),
        "local_center": np.zeros((n, 2), np.float32),
        "v": np.zeros((n, 2), np.float32),
        "w": np.zeros((n,), np.float32),
        "v0": np.zeros((n, 2), np.float32),
        "w0": np.zeros((n,), np.float32),
        "force": np.zeros((n, 2), np.float32),
        "torque": np.zeros((n,), np.float32),
        "mass": np.zeros((n,), np.float32),
        "inv_mass": np.zeros((n,), np.float32),
        "inertia": np.zeros((n,), np.float32),
        "inv_inertia": np.zeros((n,), np.float32),
        "linear_damping": np.zeros((n,), np.float32),
        "angular_damping": np.zeros((n,), np.float32),
        "gravity_scale": np.ones((n,), np.float32),
        "alive": np.zeros((n,), bool),
    }


def _soa_zeros_shapes(n):
    from .config import MAX_POLYGON_VERTICES as MPV

    return {
        "body": np.full((n,), -1, np.int32),
        "source_type": np.zeros((n,), np.int32),
        "verts": np.zeros((n, MPV, 2), np.float32),
        "normals": np.zeros((n, MPV, 2), np.float32),
        "count": np.ones((n,), np.int32),
        "radius": np.zeros((n,), np.float32),
        "friction": np.zeros((n,), np.float32),
        "restitution": np.zeros((n,), np.float32),
        "density": np.zeros((n,), np.float32),
        "filter_category": np.ones((n,), np.uint32),
        "filter_mask": np.full((n,), 0xFFFFFFFF, np.uint32),
        "filter_group": np.zeros((n,), np.int32),
        "aabb": np.zeros((n, 4), np.float32),
        "fat_aabb": np.zeros((n, 4), np.float32),
        "alive": np.zeros((n,), bool),
    }


def _soa_zeros_joints(n):
    return {
        "type": np.zeros((n,), np.int32),
        "body_a": np.zeros((n,), np.int32),
        "body_b": np.zeros((n,), np.int32),
        "local_anchor_a": np.zeros((n, 2), np.float32),
        "local_anchor_b": np.zeros((n, 2), np.float32),
        "collide_connected": np.zeros((n,), bool),
        "reference_angle": np.zeros((n,), np.float32),
        "lower_angle": np.zeros((n,), np.float32),
        "upper_angle": np.zeros((n,), np.float32),
        "enable_limit": np.zeros((n,), bool),
        "enable_motor": np.zeros((n,), bool),
        "motor_speed": np.zeros((n,), np.float32),
        "max_motor_torque": np.zeros((n,), np.float32),
        "target": np.zeros((n, 2), np.float32),
        "hertz": np.zeros((n,), np.float32),
        "damping_ratio": np.zeros((n,), np.float32),
        "impulse": np.zeros((n, 2), np.float32),
        "motor_impulse": np.zeros((n,), np.float32),
        "lower_impulse": np.zeros((n,), np.float32),
        "upper_impulse": np.zeros((n,), np.float32),
        "color": np.full((n,), -1, np.int32),
        "alive": np.zeros((n,), bool),
    }
