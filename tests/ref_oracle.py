"""ctypes bindings to the C reference library, used ONLY as a test oracle.

The reference sources (read-only at /root/reference) are compiled out-of-tree
into /tmp; no reference code is copied into this repo. Tests that need the
oracle are skipped when a C compiler or the sources are unavailable.
"""

from __future__ import annotations

import ctypes as ct
import glob
import os
import subprocess

import numpy as np

REF = "/root/reference"
BUILD = "/tmp/refbuild"
LIB = os.path.join(BUILD, "libsolver2d_ref.so")


def _build():
    os.makedirs(BUILD, exist_ok=True)
    srcs = sorted(glob.glob(os.path.join(REF, "src", "*.c")))
    cmd = ["gcc", "-O2", "-fPIC", "-shared", f"-I{REF}/include", f"-I{REF}/src", *srcs, "-o", LIB, "-lm"]
    subprocess.run(cmd, check=True, capture_output=True)


def available() -> bool:
    if os.path.exists(LIB):
        return True
    try:
        _build()
        return True
    except Exception:
        return False


class Vec2(ct.Structure):
    _fields_ = [("x", ct.c_float), ("y", ct.c_float)]


class Rot(ct.Structure):
    _fields_ = [("s", ct.c_float), ("c", ct.c_float)]


class Transform(ct.Structure):
    _fields_ = [("p", Vec2), ("q", Rot)]


class Polygon(ct.Structure):
    _fields_ = [("vertices", Vec2 * 8), ("normals", Vec2 * 8), ("radius", ct.c_float), ("count", ct.c_int32)]


class Circle(ct.Structure):
    _fields_ = [("point", Vec2), ("radius", ct.c_float)]


class ManifoldPoint(ct.Structure):
    _fields_ = [
        ("localAnchorA", Vec2),
        ("localAnchorB", Vec2),
        ("frictionAnchorA", Vec2),
        ("frictionAnchorB", Vec2),
        ("frictionNormalA", Vec2),
        ("frictionNormalB", Vec2),
        ("separation", ct.c_float),
        ("normalImpulse", ct.c_float),
        ("tangentImpulse", ct.c_float),
        ("id", ct.c_uint16),
        ("persisted", ct.c_bool),
    ]


class Manifold(ct.Structure):
    _fields_ = [
        ("points", ManifoldPoint * 2),
        ("normal", Vec2),
        ("pointCount", ct.c_int32),
        ("constraintIndex", ct.c_int32),
        ("frictionPersisted", ct.c_bool),
    ]


class DistanceCache(ct.Structure):
    _fields_ = [
        ("metric", ct.c_float),
        ("count", ct.c_uint16),
        ("indexA", ct.c_uint8 * 3),
        ("indexB", ct.c_uint8 * 3),
    ]


_lib = None


def lib():
    global _lib
    if _lib is None:
        assert available()
        _lib = ct.CDLL(LIB)
        _lib.s2CollidePolygons.restype = Manifold
        _lib.s2CollidePolygons.argtypes = [
            ct.POINTER(Polygon), Transform, ct.POINTER(Polygon), Transform, ct.POINTER(DistanceCache),
        ]
        _lib.s2CollideCircles.restype = Manifold
        _lib.s2CollideCircles.argtypes = [ct.POINTER(Circle), Transform, ct.POINTER(Circle), Transform]
        _lib.s2CollidePolygonAndCircle.restype = Manifold
        _lib.s2CollidePolygonAndCircle.argtypes = [
            ct.POINTER(Polygon), Transform, ct.POINTER(Circle), Transform,
        ]
    return _lib


def make_polygon(points, radius=0.0) -> Polygon:
    from solver2d_tpu.ops import geometry

    if len(points) == 2:
        g = geometry.capsule(points[0], points[1], radius)
    else:
        g = geometry.polygon(points, radius)
    p = Polygon()
    p.count = g.count
    p.radius = g.radius
    for i in range(8):
        p.vertices[i] = Vec2(*g.verts[i])
        p.normals[i] = Vec2(*g.normals[i])
    return p


def xf(pos, angle) -> Transform:
    return Transform(Vec2(*pos), Rot(np.sin(angle), np.cos(angle)))


def collide_polygons(points_a, ra, xfa, points_b, rb, xfb, cache=None):
    pa = make_polygon(points_a, ra)
    pb = make_polygon(points_b, rb)
    c = cache or DistanceCache()
    man = lib().s2CollidePolygons(ct.byref(pa), xfa, ct.byref(pb), xfb, ct.byref(c))
    return man, c


def collide_circles(ca, rca, xfa, cb, rcb, xfb):
    a = Circle(Vec2(*ca), rca)
    b = Circle(Vec2(*cb), rcb)
    return lib().s2CollideCircles(ct.byref(a), xfa, ct.byref(b), xfb)


def collide_polygon_circle(points_a, ra, xfa, cb, rcb, xfb):
    pa = make_polygon(points_a, ra)
    b = Circle(Vec2(*cb), rcb)
    return lib().s2CollidePolygonAndCircle(ct.byref(pa), xfa, ct.byref(b), xfb)


def manifold_to_dict(man: Manifold):
    pts = []
    for i in range(man.pointCount):
        mp = man.points[i]
        pts.append(
            dict(
                anchor_a=(mp.localAnchorA.x, mp.localAnchorA.y),
                anchor_b=(mp.localAnchorB.x, mp.localAnchorB.y),
                separation=mp.separation,
                id=mp.id,
            )
        )
    return dict(normal=(man.normal.x, man.normal.y), points=pts, count=man.pointCount)


# ---------------------------------------------------------------- world API

class WorldId(ct.Structure):
    _fields_ = [("index", ct.c_int16), ("revision", ct.c_uint16)]


class BodyId(ct.Structure):
    _fields_ = [("index", ct.c_int32), ("world", ct.c_int16), ("revision", ct.c_uint16)]


class JointId(ct.Structure):
    _fields_ = [("index", ct.c_int32), ("world", ct.c_int16), ("revision", ct.c_uint16)]


ShapeId = BodyId


class WorldDef(ct.Structure):
    _fields_ = [("solverType", ct.c_int)]


class BodyDefC(ct.Structure):
    _fields_ = [
        ("type", ct.c_int), ("position", Vec2), ("angle", ct.c_float),
        ("linearVelocity", Vec2), ("angularVelocity", ct.c_float),
        ("linearDamping", ct.c_float), ("angularDamping", ct.c_float),
        ("gravityScale", ct.c_float), ("userData", ct.c_void_p),
    ]


class Filter(ct.Structure):
    _fields_ = [("categoryBits", ct.c_uint32), ("maskBits", ct.c_uint32), ("groupIndex", ct.c_int32)]


class ShapeDefC(ct.Structure):
    _fields_ = [
        ("userData", ct.c_void_p), ("friction", ct.c_float), ("restitution", ct.c_float),
        ("density", ct.c_float), ("filter", Filter),
    ]


class Capsule(ct.Structure):
    _fields_ = [("point1", Vec2), ("point2", Vec2), ("radius", ct.c_float)]


class Segment(ct.Structure):
    _fields_ = [("point1", Vec2), ("point2", Vec2)]


class RevoluteJointDefC(ct.Structure):
    _fields_ = [
        ("bodyIdA", BodyId), ("bodyIdB", BodyId),
        ("localAnchorA", Vec2), ("localAnchorB", Vec2),
        ("referenceAngle", ct.c_float),
        ("enableLimit", ct.c_bool), ("lowerAngle", ct.c_float), ("upperAngle", ct.c_float),
        ("enableMotor", ct.c_bool), ("motorSpeed", ct.c_float), ("maxMotorTorque", ct.c_float),
        ("drawSize", ct.c_float), ("collideConnected", ct.c_bool),
    ]


def _bind_world(L):
    L.s2CreateWorld.restype = WorldId
    L.s2CreateWorld.argtypes = [ct.POINTER(WorldDef)]
    L.s2DestroyWorld.argtypes = [WorldId]
    L.s2World_Step.argtypes = [WorldId, ct.c_float, ct.c_int32, ct.c_int32, ct.c_bool]
    L.s2CreateBody.restype = BodyId
    L.s2CreateBody.argtypes = [WorldId, ct.POINTER(BodyDefC)]
    L.s2Body_GetPosition.restype = Vec2
    L.s2Body_GetPosition.argtypes = [BodyId]
    L.s2Body_GetAngle.restype = ct.c_float
    L.s2Body_GetAngle.argtypes = [BodyId]
    L.s2Body_ApplyLinearImpulse.argtypes = [BodyId, Vec2, Vec2]
    for name in ("s2CreateCircleShape", "s2CreateSegmentShape", "s2CreateCapsuleShape", "s2CreatePolygonShape"):
        fn = getattr(L, name)
        fn.restype = ShapeId
    L.s2CreateCircleShape.argtypes = [BodyId, ct.POINTER(ShapeDefC), ct.POINTER(Circle)]
    L.s2CreateSegmentShape.argtypes = [BodyId, ct.POINTER(ShapeDefC), ct.POINTER(Segment)]
    L.s2CreateCapsuleShape.argtypes = [BodyId, ct.POINTER(ShapeDefC), ct.POINTER(Capsule)]
    L.s2CreatePolygonShape.argtypes = [BodyId, ct.POINTER(ShapeDefC), ct.POINTER(Polygon)]
    L.s2CreateRevoluteJoint.restype = JointId
    L.s2CreateRevoluteJoint.argtypes = [WorldId, ct.POINTER(RevoluteJointDefC)]
    return L


class RefWorld:
    """Minimal mirror of the host World builder driving the C reference."""

    def __init__(self, solver_type: int):
        self.L = _bind_world(lib())
        self.id = self.L.s2CreateWorld(ct.byref(WorldDef(int(solver_type))))
        assert self.id.index >= 0
        self.bodies: list[BodyId] = []

    def create_body(self, type=0, position=(0, 0), angle=0.0, linear_velocity=(0, 0),
                    angular_velocity=0.0, linear_damping=0.0, angular_damping=0.0, gravity_scale=1.0):
        d = BodyDefC(int(type), Vec2(*position), angle, Vec2(*linear_velocity),
                     angular_velocity, linear_damping, angular_damping, gravity_scale, None)
        bid = self.L.s2CreateBody(self.id, ct.byref(d))
        self.bodies.append(bid)
        return len(self.bodies) - 1

    def _shape_def(self, friction=0.6, restitution=0.0, density=1.0,
                   filter_category=1, filter_mask=0xFFFFFFFF, filter_group=0):
        return ShapeDefC(None, friction, restitution, density,
                         Filter(filter_category, filter_mask, filter_group))

    def create_polygon_shape(self, body, geom_or_points, radius=0.0, **kw):
        import numpy as _np
        from solver2d_tpu.ops import geometry as _g

        if isinstance(geom_or_points, _g.ShapeGeom):
            g = geom_or_points
            p = Polygon()
            p.count = g.count
            p.radius = g.radius
            for i in range(8):
                p.vertices[i] = Vec2(*g.verts[i])
                p.normals[i] = Vec2(*g.normals[i])
        else:
            p = make_polygon(geom_or_points, radius)
        sd = self._shape_def(**kw)
        self.L.s2CreatePolygonShape(self.bodies[body], ct.byref(sd), ct.byref(p))

    def create_circle_shape(self, body, center, radius, **kw):
        sd = self._shape_def(**kw)
        c = Circle(Vec2(*center), radius)
        self.L.s2CreateCircleShape(self.bodies[body], ct.byref(sd), ct.byref(c))

    def create_capsule_shape(self, body, p1, p2, radius, **kw):
        sd = self._shape_def(**kw)
        c = Capsule(Vec2(*p1), Vec2(*p2), radius)
        self.L.s2CreateCapsuleShape(self.bodies[body], ct.byref(sd), ct.byref(c))

    def create_segment_shape(self, body, p1, p2, **kw):
        sd = self._shape_def(**kw)
        s = Segment(Vec2(*p1), Vec2(*p2))
        self.L.s2CreateSegmentShape(self.bodies[body], ct.byref(sd), ct.byref(s))

    def create_revolute_joint(self, body_a, body_b, local_anchor_a=(0, 0), local_anchor_b=(0, 0),
                              reference_angle=0.0, lower_angle=0.0, upper_angle=0.0,
                              enable_limit=False, enable_motor=False, motor_speed=0.0,
                              max_motor_torque=0.0, collide_connected=False):
        d = RevoluteJointDefC(
            self.bodies[body_a], self.bodies[body_b],
            Vec2(*local_anchor_a), Vec2(*local_anchor_b), reference_angle,
            enable_limit, lower_angle, upper_angle,
            enable_motor, motor_speed, max_motor_torque, 1.0, collide_connected,
        )
        self.L.s2CreateRevoluteJoint(self.id, ct.byref(d))

    def apply_linear_impulse(self, body, impulse, point):
        self.L.s2Body_ApplyLinearImpulse(self.bodies[body], Vec2(*impulse), Vec2(*point))

    def step(self, dt=1.0 / 60.0, iters=4, extra_iters=2, warm_start=True):
        self.L.s2World_Step(self.id, dt, iters, extra_iters, warm_start)

    def positions(self):
        return np.array([[self.L.s2Body_GetPosition(b).x, self.L.s2Body_GetPosition(b).y] for b in self.bodies])

    def angles(self):
        return np.array([self.L.s2Body_GetAngle(b) for b in self.bodies])

    def close(self):
        self.L.s2DestroyWorld(self.id)
