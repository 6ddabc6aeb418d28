"""Shape construction (host-side, numpy) and geometric properties.

Constructors mirror reference: src/geometry.c:22-115 but emit the unified
padded rounded-polygon representation (verts[8], normals[8], count, radius).
Mass properties mirror reference: src/geometry.c:117-286 exactly, including
the radius push-out for rounded polygons.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import MAX_POLYGON_VERTICES


@dataclasses.dataclass
class ShapeGeom:
    """Host-side unified shape geometry (numpy)."""

    verts: np.ndarray    # [8,2]
    normals: np.ndarray  # [8,2]
    count: int
    radius: float
    source_type: int     # ShapeType


def _pad(a: np.ndarray) -> np.ndarray:
    out = np.zeros((MAX_POLYGON_VERTICES, 2), np.float32)
    out[: len(a)] = a
    # Pad with the last vertex so batched support functions over the full 8
    # lanes never pick garbage (duplicates don't change the support result).
    if len(a) > 0:
        out[len(a):] = a[-1]
    return out


def circle(point, radius: float) -> ShapeGeom:
    from ..config import ShapeType

    p = np.asarray(point, np.float32).reshape(1, 2)
    return ShapeGeom(_pad(p), _pad(np.array([[0.0, 1.0]])), 1, float(radius), ShapeType.CIRCLE)


def capsule(p1, p2, radius: float, source_type=None) -> ShapeGeom:
    """2-vertex rounded polygon (reference: src/geometry.c:100-115)."""
    from ..config import ShapeType

    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)
    axis = p2 - p1
    n = np.linalg.norm(axis)
    if n < 1e-12:
        raise ValueError("degenerate capsule")
    axis = axis / n
    normal = np.array([axis[1], -axis[0]])  # right perp
    verts = _pad(np.stack([p1, p2]).astype(np.float32))
    normals = _pad(np.stack([normal, -normal]).astype(np.float32))
    st = ShapeType.CAPSULE if source_type is None else source_type
    return ShapeGeom(verts, normals, 2, float(radius), st)


def segment(p1, p2) -> ShapeGeom:
    """Segment = zero-radius capsule (reference: src/manifold.c:232-238)."""
    from ..config import ShapeType

    return capsule(p1, p2, 0.0, source_type=ShapeType.SEGMENT)


def polygon(points, radius: float = 0.0) -> ShapeGeom:
    """Convex polygon from CCW points (reference: src/geometry.c:22-47)."""
    from ..config import ShapeType

    pts = np.asarray(points, np.float64)
    count = len(pts)
    assert 3 <= count <= MAX_POLYGON_VERTICES
    normals = np.zeros_like(pts)
    for i in range(count):
        edge = pts[(i + 1) % count] - pts[i]
        n = np.linalg.norm(edge)
        assert n > 1e-9, "zero-length polygon edge"
        e = edge / n
        normals[i] = [e[1], -e[0]]  # cross(edge, 1) = right perp
    return ShapeGeom(
        _pad(pts.astype(np.float32)), _pad(normals.astype(np.float32)), count, float(radius), ShapeType.POLYGON
    )


def box(hx: float, hy: float, radius: float = 0.0) -> ShapeGeom:
    """(reference: src/geometry.c:54-78)"""
    return polygon([(-hx, -hy), (hx, -hy), (hx, hy), (-hx, hy)], radius)


def square(h: float) -> ShapeGeom:
    return box(h, h)


def offset_box(hx: float, hy: float, center, angle: float) -> ShapeGeom:
    """(reference: src/geometry.c:80-98)"""
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s], [s, c]])
    pts = np.array([(-hx, -hy), (hx, -hy), (hx, hy), (-hx, hy)], np.float64)
    pts = pts @ R.T + np.asarray(center, np.float64)
    return polygon(pts)


@dataclasses.dataclass
class MassData:
    mass: float
    center: np.ndarray  # [2]
    inertia: float      # about shape local origin


def compute_mass(geom: ShapeGeom, density: float) -> MassData:
    """Mass properties of the unified shape (reference: src/geometry.c:117-286)."""
    count = geom.count
    radius = geom.radius
    verts = geom.verts[:count].astype(np.float64)

    if count == 1:
        # circle (reference: src/geometry.c:117-128)
        rr = radius * radius
        mass = density * np.pi * rr
        center = verts[0]
        inertia = mass * (0.5 * rr + center @ center)
        return MassData(mass, center.copy(), inertia)

    if count == 2:
        # capsule (reference: src/geometry.c:130-152)
        rr = radius * radius
        p1, p2 = verts
        length = np.linalg.norm(p2 - p1)
        ll = length * length
        mass = density * (np.pi * radius + 2.0 * length) * radius
        center = 0.5 * (p1 + p2)
        circle_inertia = 0.5 * (rr + ll)
        box_inertia = (4.0 * rr + ll) / 12.0
        inertia = mass * (circle_inertia + box_inertia)
        return MassData(mass, center, inertia)

    # polygon via triangle decomposition (reference: src/geometry.c:154-286)
    pts = verts.copy()
    if radius > 0.0:
        # push out vertices along corner bisectors (geometry.c:203-225)
        normals = geom.normals[:count].astype(np.float64)
        out = np.zeros_like(pts)
        for i in range(count):
            j = count - 1 if i == 0 else i - 1
            n1, n2 = normals[j], normals[i]
            mid = n1 + n2
            mid = mid / max(np.linalg.norm(mid), 1e-12)
            t1 = np.array([-n1[1], n1[0]])
            sin_half = mid[0] * t1[1] - mid[1] * t1[0]
            offset = radius / sin_half if sin_half > 1e-7 else radius
            out[i] = pts[i] + offset * mid
        pts = out

    center = np.zeros(2)
    area = 0.0
    inertia = 0.0
    r = pts[0]
    inv3 = 1.0 / 3.0
    for i in range(1, count - 1):
        e1 = pts[i] - r
        e2 = pts[i + 1] - r
        D = e1[0] * e2[1] - e1[1] * e2[0]
        tri_area = 0.5 * D
        area += tri_area
        center += tri_area * inv3 * (e1 + e2)
        intx2 = e1[0] ** 2 + e2[0] * e1[0] + e2[0] ** 2
        inty2 = e1[1] ** 2 + e2[1] * e1[1] + e2[1] ** 2
        inertia += (0.25 * inv3 * D) * (intx2 + inty2)

    mass = density * area
    assert area > 1e-12
    center /= area
    world_center = r + center
    inertia = density * inertia
    inertia += mass * (world_center @ world_center - center @ center)
    return MassData(mass, world_center, inertia)


# --- Batched AABB of unified shapes (JAX) ---

def compute_aabbs(verts, normals, count, radius, origin, rot):
    """World AABBs for all shapes, [S,4] = (lo.x, lo.y, hi.x, hi.y).

    Works for every unified shape: max/min over the padded vertices (padding
    repeats a real vertex) then inflate by radius
    (reference: src/geometry.c:288-341)."""
    import jax.numpy as jnp

    from . import math2d as m

    del normals, count
    world = origin[:, None, :] + m.rotate(rot[:, None, :], verts)  # [S,8,2]
    lo = world.min(axis=1) - radius[:, None]
    hi = world.max(axis=1) + radius[:, None]
    return jnp.concatenate([lo, hi], axis=-1)
