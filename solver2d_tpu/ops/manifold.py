"""Batched contact-manifold generation for unified rounded polygons.

Functional re-derivation of the reference narrowphase (reference:
src/manifold.c): one kernel covers all 9 shape pairs. Sub-paths are computed
with masks and selected (no data-dependent branches):

- circle-circle          (reference: s2CollideCircles, manifold.c:16-48)
- polygon/capsule-circle (reference: s2CollidePolygonAndCircle, manifold.c:113-222;
                          the barycentric vertex-region cases reproduce
                          s2CollideCapsuleAndCircle for 2-gons)
- polygon-polygon        (reference: s2CollidePolygons, manifold.c:509-650):
  GJK first; distance < 0.1*slop -> SAT fallback (manifold.c:441-493);
  cache count 1 -> vertex-vertex; else reference/incident edge pick from the
  GJK feature cache and clipping (manifold.c:248-399).

Everything is evaluated in shape A's frame (B transformed in, reducing
round-off far from the origin exactly like manifold.c:515-525); the normal is
rotated to world at the end. Manifold points carry the same u16-style feature
ids (S2_MAKE_ID, manifold.c:14) used for warm-start impulse matching.

All functions are written for one pair and vmapped over the contact batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import LINEAR_SLOP, MAX_POLYGON_VERTICES, SPECULATIVE_DISTANCE
from . import distance as gjk_mod
from . import math2d as m
from .gather import tgather

_EPS = 1.1920929e-07
_BIG = 1e30


class ManifoldOut(NamedTuple):
    normal: jnp.ndarray      # [2] world
    anchor_a: jnp.ndarray    # [2,2] local to body A origin frame
    anchor_b: jnp.ndarray    # [2,2] local to body B origin frame
    separation: jnp.ndarray  # [2]
    point_id: jnp.ndarray    # [2] i32
    point_count: jnp.ndarray # [] i32
    cache_count: jnp.ndarray # [] i32 (updated GJK cache)
    cache_ia: jnp.ndarray    # [3]
    cache_ib: jnp.ndarray    # [3]


def _make_id(a, b):
    """reference: manifold.c:14"""
    return (a.astype(jnp.int32) << 8) | b.astype(jnp.int32)


def _clip_polygons(va, na, ca, ra, vb, nb, cb, rb, edge_a, edge_b, flip):
    """Reference/incident edge clipping (reference: manifold.c:248-399).

    All inputs in A's frame. Returns (normal, anchors_a[2,2], separations[2],
    ids[2]) with 2 points."""
    i11 = jnp.where(flip, edge_b, edge_a)
    cnt1 = jnp.where(flip, cb, ca)
    i12 = jnp.where(i11 + 1 < cnt1, i11 + 1, 0)
    i21 = jnp.where(flip, edge_a, edge_b)
    cnt2 = jnp.where(flip, ca, cb)
    i22 = jnp.where(i21 + 1 < cnt2, i21 + 1, 0)

    def sel(flip, xb, xa, idx):
        return jnp.where(flip, tgather(xb, idx), tgather(xa, idx))

    normal = jnp.where(flip, tgather(nb, i11), tgather(na, i11))
    v11 = jnp.where(flip, tgather(vb, i11), tgather(va, i11))
    v12 = jnp.where(flip, tgather(vb, i12), tgather(va, i12))
    v21 = jnp.where(flip, tgather(va, i21), tgather(vb, i21))
    v22 = jnp.where(flip, tgather(va, i22), tgather(vb, i22))
    r1 = jnp.where(flip, rb, ra)
    r2 = jnp.where(flip, ra, rb)

    tangent = m.cross_sv(1.0, normal)
    lower1 = 0.0
    upper1 = m.dot(v12 - v11, tangent)
    # incident edge points opposite the tangent (CCW winding)
    upper2 = m.dot(v21 - v11, tangent)
    lower2 = m.dot(v22 - v11, tangent)
    d21 = upper2 - lower2

    frac_l = (lower1 - lower2) / jnp.where(d21 != 0.0, d21, 1.0)
    v_lower = jnp.where((lower2 < lower1) & (d21 > _EPS), v22 + frac_l * (v21 - v22), v22)
    frac_u = (upper1 - lower2) / jnp.where(d21 != 0.0, d21, 1.0)
    v_upper = jnp.where((upper2 > upper1) & (d21 > _EPS), v22 + frac_u * (v21 - v22), v21)

    sep_lower = m.dot(v_lower - v11, normal)
    sep_upper = m.dot(v_upper - v11, normal)

    # contact points at midpoint accounting for radii (manifold.c:335-337)
    v_lower = v_lower + 0.5 * (r1 - r2 - sep_lower) * normal
    v_upper = v_upper + 0.5 * (r1 - r2 - sep_upper) * normal
    radius = r1 + r2

    # point order and ids depend on flip (manifold.c:341-396)
    p0 = jnp.where(flip, v_upper, v_lower)
    p1 = jnp.where(flip, v_lower, v_upper)
    s0 = jnp.where(flip, sep_upper, sep_lower) - radius
    s1 = jnp.where(flip, sep_lower, sep_upper) - radius
    id0 = jnp.where(flip, _make_id(i21, i12), _make_id(i11, i22))
    id1 = jnp.where(flip, _make_id(i22, i11), _make_id(i12, i21))
    out_normal = jnp.where(flip, -normal, normal)

    anchors = jnp.stack([p0, p1])
    seps = jnp.stack([s0, s1])
    ids = jnp.stack([id0, id1])
    return out_normal, anchors, seps, ids


def _find_max_separation(v1, n1, c1, v2, c2):
    """Max separation of poly2 from poly1's edges (reference: manifold.c:402-438)."""
    lanes = jnp.arange(MAX_POLYGON_VERTICES)
    # s_ij = dot(n1_i, v2_j - v1_i) = n1 @ v2^T - rowdot(n1, v1); the matmul
    # form batches onto the MXU and avoids materializing an [8,8,2] diff
    # tensor per contact (58 MB at 128 worlds x 896 contacts)
    sij = n1 @ v2.T - (n1 * v1).sum(-1)[:, None]    # [8,8]
    sij = jnp.where(lanes[None, :] < c2, sij, _BIG)  # min over real j
    si = sij.min(axis=1)
    si = jnp.where(lanes < c1, si, -_BIG)           # max over real i
    best = jnp.argmax(si).astype(jnp.int32)
    return tgather(si, best), best


def _incident_edge(search_dir, normals, count):
    """Most anti-parallel edge (reference: manifold.c:456-489)."""
    lanes = jnp.arange(MAX_POLYGON_VERTICES)
    dots = (normals * search_dir[None, :]).sum(-1)
    dots = jnp.where(lanes < count, dots, _BIG)
    return jnp.argmin(dots).astype(jnp.int32)


def collide(
    va, na, ca, ra,        # shape A: verts[8,2], normals[8,2], count, radius (A body-origin frame)
    vb, nb, cb, rb,        # shape B in its own frame
    pa, qa, pb, qb,        # body origin transforms
    cache_count, cache_ia, cache_ib,
    gjk_iters: int = 20,
) -> ManifoldOut:
    """Unified narrowphase for one shape pair (vmap over contacts)."""
    # Put B into A's frame (reference: manifold.c:515-525)
    xp, xq = m.inv_mul_transforms(pa, qa, pb, qb)
    vb_l = xp[None, :] + m.rotate(xq[None, :], vb)
    nb_l = m.rotate(xq[None, :], nb)

    radius = ra + rb
    is_circle_a = ca == 1
    is_circle_b = cb == 1

    # --- GJK (always; provides distance, witness, cache) ---
    out = gjk_mod.gjk(va, ca, vb_l, cb, cache_count, cache_ia, cache_ib, max_iters=gjk_iters)
    dist = out.distance

    # ---------- circle-circle path (manifold.c:16-48) ----------
    pA_cc = va[0]
    pB_cc = vb_l[0]
    d_cc, n_cc = m.get_length_and_normalize(pB_cc - pA_cc)
    sep_cc = d_cc - radius
    cA_cc = pA_cc + ra * n_cc
    cB_cc = pB_cc - rb * n_cc
    mid_cc = 0.5 * (cA_cc + cB_cc)

    # ---------- polygon-circle path (manifold.c:113-222) ----------
    # Roles: P = the polygon (>=2 verts), C = the circle. flip_pc means A is
    # the circle (so output normal must be negated).
    flip_pc = is_circle_a
    vp = jnp.where(flip_pc, vb_l, va)
    np_ = jnp.where(flip_pc, nb_l, na)
    cp = jnp.where(flip_pc, cb, ca)
    rp = jnp.where(flip_pc, rb, ra)
    rc = jnp.where(flip_pc, ra, rb)
    c_center = jnp.where(flip_pc, va[0], vb_l[0])

    lanes = jnp.arange(MAX_POLYGON_VERTICES)
    seps = ((c_center[None, :] - vp) * np_).sum(-1)
    seps = jnp.where(lanes < cp, seps, -_BIG)
    norm_idx = jnp.argmax(seps).astype(jnp.int32)
    sep_pc0 = tgather(seps, norm_idx)

    i1 = norm_idx
    i2 = jnp.where(i1 + 1 < cp, i1 + 1, 0)
    v1, v2 = tgather(vp, i1), tgather(vp, i2)
    u1 = m.dot(c_center - v1, v2 - v1)
    u2 = m.dot(c_center - v2, v1 - v2)

    # vertex regions
    n_v1 = m.normalize(c_center - v1)
    n_v2 = m.normalize(c_center - v2)
    sep_v1 = m.dot(c_center - v1, n_v1)
    sep_v2 = m.dot(c_center - v2, n_v2)

    case_v1 = (u1 < 0.0) & (sep_pc0 > _EPS)
    case_v2 = (u2 < 0.0) & (sep_pc0 > _EPS) & ~case_v1

    n_face = tgather(np_, norm_idx)
    n_pc = jnp.where(case_v1, n_v1, jnp.where(case_v2, n_v2, n_face))
    sep_pc = jnp.where(case_v1, sep_v1, jnp.where(case_v2, sep_v2, sep_pc0))
    v_near = jnp.where(case_v1, v1, jnp.where(case_v2, v2, v1))

    cA_face = c_center + (rp - m.dot(c_center - v1, n_face)) * n_face
    cA_vert = v_near + rp * n_pc
    cA_pc = jnp.where(case_v1 | case_v2, cA_vert, cA_face)
    cB_pc = c_center - rc * n_pc
    mid_pc = 0.5 * (cA_pc + cB_pc)
    sep_out_pc = jnp.where(case_v1 | case_v2, m.dot(cB_pc - cA_pc, n_pc), sep_pc - radius)
    # in A's frame: if flipped, the P->C normal points from B(poly) to A(circle)
    n_pc_a = jnp.where(flip_pc, -n_pc, n_pc)

    # ---------- polygon-polygon paths ----------
    # SAT fallback (deep overlap), manifold.c:441-493
    sepA, edgeA_s = _find_max_separation(va, na, ca, vb_l, cb)
    sepB, edgeB_s = _find_max_separation(vb_l, nb_l, cb, va, ca)
    flip_sat = sepB > sepA
    edgeA_sat = jnp.where(flip_sat, _incident_edge(nb_l[edgeB_s], na, ca), edgeA_s)
    edgeB_sat = jnp.where(flip_sat, edgeB_s, _incident_edge(na[edgeA_s], nb_l, cb))
    n_sat, a_sat, s_sat, id_sat = _clip_polygons(
        va, na, ca, ra, vb_l, nb_l, cb, rb, edgeA_sat, edgeB_sat, flip_sat
    )

    # Vertex-vertex (cache count 1), manifold.c:559-577
    n_vv = m.normalize(out.point_b - out.point_a)
    mid_vv = out.point_b + 0.5 * (ra - rb - dist) * n_vv
    sep_vv = dist - radius
    id_vv = _make_id(out.cache_index_a[0], out.cache_index_b[0])

    # Edge-vertex via GJK features (cache count 2), manifold.c:580-637
    a1, a2 = out.cache_index_a[0], out.cache_index_a[1]
    b1, b2 = out.cache_index_b[0], out.cache_index_b[1]
    one_on_a = a1 == a2

    # one point on A -> reference edge on B
    axis_b = out.point_a - out.point_b
    edge_b_ref = jnp.where(
        m.dot(axis_b, nb_l[b1]) > m.dot(axis_b, nb_l[b2]), b1, b2
    )
    ref_axis_b = nb_l[edge_b_ref]
    ea1 = a1
    ea2 = jnp.where(ea1 == 0, ca - 1, ea1 - 1)
    edge_a_inc = jnp.where(m.dot(ref_axis_b, na[ea1]) < m.dot(ref_axis_b, na[ea2]), ea1, ea2)

    # one point on B -> reference edge on A
    axis_a = out.point_b - out.point_a
    edge_a_ref = jnp.where(m.dot(axis_a, na[a1]) > m.dot(axis_a, na[a2]), a1, a2)
    ref_axis_a = na[edge_a_ref]
    eb1 = b1
    eb2 = jnp.where(eb1 == 0, cb - 1, eb1 - 1)
    edge_b_inc = jnp.where(m.dot(ref_axis_a, nb_l[eb1]) < m.dot(ref_axis_a, nb_l[eb2]), eb1, eb2)

    edge_a_clip = jnp.where(one_on_a, edge_a_inc, edge_a_ref)
    edge_b_clip = jnp.where(one_on_a, edge_b_ref, edge_b_inc)
    n_clip, a_clip, s_clip, id_clip = _clip_polygons(
        va, na, ca, ra, vb_l, nb_l, cb, rb, edge_a_clip, edge_b_clip, one_on_a
    )

    # ---------- select path ----------
    circle_pair = is_circle_a & is_circle_b
    circle_one = (is_circle_a ^ is_circle_b)
    poly_pair = ~(circle_pair | circle_one)

    use_sat = poly_pair & (dist < 0.1 * LINEAR_SLOP)
    use_vv = poly_pair & ~use_sat & (out.cache_count == 1)
    use_clip = poly_pair & ~use_sat & ~use_vv

    # normal (A frame)
    normal_l = jnp.where(
        circle_pair, n_cc,
        jnp.where(circle_one, n_pc_a,
                  jnp.where(use_sat, n_sat, jnp.where(use_vv, n_vv, n_clip))),
    )

    anchor0 = jnp.where(
        circle_pair, mid_cc,
        jnp.where(circle_one, mid_pc, jnp.where(use_sat, a_sat[0], jnp.where(use_vv, mid_vv, a_clip[0]))),
    )
    anchor1 = jnp.where(use_sat, a_sat[1], a_clip[1])
    sep0 = jnp.where(
        circle_pair, sep_cc,
        jnp.where(circle_one, sep_out_pc, jnp.where(use_sat, s_sat[0], jnp.where(use_vv, sep_vv, s_clip[0]))),
    )
    sep1 = jnp.where(use_sat, s_sat[1], s_clip[1])
    pid0 = jnp.where(use_sat, id_sat[0], jnp.where(use_clip, id_clip[0], jnp.where(use_vv, id_vv, 0)))
    pid1 = jnp.where(use_sat, id_sat[1], id_clip[1])

    two_points = (use_sat | use_clip)
    # speculative culling (manifold.c:32-34, :536-540 and circle paths)
    cull0 = jnp.where(circle_pair | circle_one, sep0 > SPECULATIVE_DISTANCE, dist > radius + SPECULATIVE_DISTANCE)
    count = jnp.where(cull0, 0, jnp.where(two_points, 2, 1))

    anchors_a = jnp.stack([anchor0, anchor1])
    # local anchor B = inv_transform(xf, anchorA) (manifold.c:552, :645)
    anchors_b = m.inv_rotate(xq[None, :], anchors_a - xp[None, :])

    normal_w = m.rotate(qa, normal_l)

    return ManifoldOut(
        normal=normal_w,
        anchor_a=anchors_a,
        anchor_b=anchors_b,
        separation=jnp.stack([sep0, sep1]),
        point_id=jnp.stack([pid0, pid1]),
        point_count=count,
        cache_count=out.cache_count,
        cache_ia=out.cache_index_a,
        cache_ib=out.cache_index_b,
    )
