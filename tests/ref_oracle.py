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
