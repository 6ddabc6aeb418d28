"""Batched GJK closest-distance with warm-start simplex cache.

Functional re-derivation of the reference GJK (reference: src/distance.c:91-636):
Voronoi-region simplex solves with barycentric coordinates, support-duplicate
termination, and a {count, indexA[3], indexB[3]} cache for temporal coherence.
The sequential branchy control flow is recast as fixed-trip-count iteration
with an all-lanes "done" mask and permutation-table simplex updates, so the
whole thing vmaps over the contact batch and compiles to straight-line VPU
code — no data-dependent branches.

Shapes are given directly as padded vertex arrays in a common frame (the
caller puts B into A's frame first, exactly like s2CollidePolygons,
reference: src/manifold.c:515-531), so transforms are identity here.

Also provides segment-segment closest points (reference: src/distance.c:16-89).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import math2d as m
from .gather import tgather

_EPS = 1.1920929e-07  # FLT_EPSILON
MAX_ITERS = 20


class GJKOutput(NamedTuple):
    point_a: jnp.ndarray   # [2]
    point_b: jnp.ndarray   # [2]
    distance: jnp.ndarray  # []
    cache_count: jnp.ndarray    # [] i32 (simplex vertex count)
    cache_index_a: jnp.ndarray  # [3] i32
    cache_index_b: jnp.ndarray  # [3] i32
    iterations: jnp.ndarray     # [] i32


def _support(verts, count, direction):
    """Index of the support vertex (first max, real lanes only).
    (reference: src/distance.c:116-131)"""
    scores = (verts * direction[None, :]).sum(-1)
    lane = jnp.arange(verts.shape[0])
    scores = jnp.where(lane < count, scores, -jnp.inf)
    return jnp.argmax(scores).astype(jnp.int32)


def _solve_simplex2(w):
    """Line-segment Voronoi solve (reference: src/distance.c:333-365).

    Returns (case priority select): perm [3], bary a [3], count."""
    w1, w2 = w[0], w[1]
    e12 = w2 - w1
    d12_2 = -jnp.dot(w1, e12)
    d12_1 = jnp.dot(w2, e12)

    inv = 1.0 / jnp.where(d12_1 + d12_2 != 0.0, d12_1 + d12_2, 1.0)
    a_edge = jnp.array([1.0, 1.0, 0.0]) * jnp.stack([d12_1 * inv, d12_2 * inv, 0.0])

    # priority: w1 region, w2 region, edge
    in_w1 = d12_2 <= 0.0
    in_w2 = jnp.logical_and(~in_w1, d12_1 <= 0.0)

    perm = jnp.where(in_w2, jnp.array([1, 1, 2]), jnp.array([0, 1, 2]))
    a = jnp.where(in_w1 | in_w2, jnp.array([1.0, 0.0, 0.0]), a_edge)
    count = jnp.where(in_w1 | in_w2, 1, 2)
    return perm, a, count


def _solve_simplex3(w):
    """Triangle Voronoi solve (reference: src/distance.c:367-474)."""
    w1, w2, w3 = w[0], w[1], w[2]
    e12 = w2 - w1
    d12_1 = jnp.dot(w2, e12)
    d12_2 = -jnp.dot(w1, e12)
    e13 = w3 - w1
    d13_1 = jnp.dot(w3, e13)
    d13_2 = -jnp.dot(w1, e13)
    e23 = w3 - w2
    d23_1 = jnp.dot(w3, e23)
    d23_2 = -jnp.dot(w2, e23)
    n123 = m.cross(e12, e13)
    d123_1 = n123 * m.cross(w2, w3)
    d123_2 = n123 * m.cross(w3, w1)
    d123_3 = n123 * m.cross(w1, w2)

    # Case conditions in the reference's priority order
    c_w1 = jnp.logical_and(d12_2 <= 0.0, d13_2 <= 0.0)
    c_e12 = (d12_1 > 0.0) & (d12_2 > 0.0) & (d123_3 <= 0.0)
    c_e13 = (d13_1 > 0.0) & (d13_2 > 0.0) & (d123_2 <= 0.0)
    c_w2 = (d12_1 <= 0.0) & (d23_2 <= 0.0)
    c_w3 = (d13_1 <= 0.0) & (d23_1 <= 0.0)
    c_e23 = (d23_1 > 0.0) & (d23_2 > 0.0) & (d123_1 <= 0.0)

    # case index: 0 w1, 1 e12, 2 e13, 3 w2, 4 w3, 5 e23, 6 interior
    conds = jnp.stack([c_w1, c_e12, c_e13, c_w2, c_w3, c_e23, jnp.array(True)])
    case = jnp.argmax(conds).astype(jnp.int32)

    perms = jnp.array(
        [
            [0, 1, 2],  # w1
            [0, 1, 2],  # e12
            [0, 2, 1],  # e13 (v2 = v3)
            [1, 1, 2],  # w2 (v1 = v2)
            [2, 1, 2],  # w3 (v1 = v3)
            [2, 1, 0],  # e23 (v1 = old v3, v2 = old v2)
            [0, 1, 2],  # interior
        ],
        jnp.int32,
    )
    counts = jnp.array([1, 2, 2, 1, 1, 2, 3], jnp.int32)

    def safe_inv(x):
        return 1.0 / jnp.where(x != 0.0, x, 1.0)

    a12 = jnp.stack([d12_1, d12_2, 0.0]) * safe_inv(d12_1 + d12_2)
    a13 = jnp.stack([d13_1, d13_2, 0.0]) * safe_inv(d13_1 + d13_2)
    # e23 after perm [2,1]: new v1 = old v3 (a = d23_2), new v2 = old v2 (a = d23_1)
    a23 = jnp.stack([d23_2, d23_1, 0.0]) * safe_inv(d23_1 + d23_2)
    a123 = jnp.stack([d123_1, d123_2, d123_3]) * safe_inv(d123_1 + d123_2 + d123_3)
    one = jnp.array([1.0, 0.0, 0.0])
    bary = jnp.stack([one, a12, a13, one, one, a23, a123])

    return tgather(perms, case), tgather(bary, case), tgather(counts, case)


def _search_direction(w, count):
    """(reference: src/distance.c:227-254)"""
    d1 = -w[0]
    e12 = w[1] - w[0]
    sgn = m.cross(e12, -w[0])
    d2 = jnp.where(sgn > 0.0, m.cross_sv(1.0, e12), m.cross_vs(e12, 1.0))
    return jnp.where(count == 1, d1, d2)


def gjk(verts_a, count_a, verts_b, count_b, cache_count, cache_ia, cache_ib, max_iters: int = MAX_ITERS) -> GJKOutput:
    """Single-pair GJK in a common frame; vmap over the contact batch.

    verts_a/verts_b: [8,2] padded; cache_*: warm-start simplex features.
    max_iters: support-call budget (the reference uses 20, distance.c:504;
    8-12 suffices for <=8-vertex shapes and is markedly cheaper on TPU)."""

    def vert(verts, idx):
        return tgather(verts, idx)

    # Initialize simplex from cache (reference: src/distance.c:172-213)
    use_cache = cache_count > 0
    ia = jnp.where(use_cache, cache_ia, jnp.zeros((3,), jnp.int32))
    ib = jnp.where(use_cache, cache_ib, jnp.zeros((3,), jnp.int32))
    count = jnp.where(use_cache, cache_count, 1)
    wa = tgather(verts_a, ia)  # [3,2]
    wb = tgather(verts_b, ib)
    w = wb - wa
    bary = jnp.array([1.0, 0.0, 0.0])

    def body(it, carry):
        wa, wb, w, ia, ib, bary, count, done, iters = carry
        save_ia, save_ib, save_count = ia, ib, count

        # Solve simplex
        perm2, a2, cnt2 = _solve_simplex2(w)
        perm3, a3, cnt3 = _solve_simplex3(w)
        id_perm = jnp.arange(3, dtype=jnp.int32)
        perm = jnp.where(count == 1, id_perm, jnp.where(count == 2, perm2, perm3))
        new_a = jnp.where(count == 1, jnp.array([1.0, 0.0, 0.0]), jnp.where(count == 2, a2, a3))
        new_count = jnp.where(count == 1, 1, jnp.where(count == 2, cnt2, cnt3))

        wa_n, wb_n, w_n = tgather(wa, perm), tgather(wb, perm), tgather(w, perm)
        ia_n, ib_n = tgather(ia, perm), tgather(ib, perm)

        # Commit solve (unless done)
        wa = jnp.where(done, wa, wa_n)
        wb = jnp.where(done, wb, wb_n)
        w = jnp.where(done, w, w_n)
        ia = jnp.where(done, ia, ia_n)
        ib = jnp.where(done, ib, ib_n)
        bary = jnp.where(done, bary, new_a)
        count = jnp.where(done, count, new_count)

        # Termination: triangle contains origin
        done = done | (count == 3)

        d = _search_direction(w, count)
        done = done | (jnp.dot(d, d) < _EPS * _EPS)

        # Support points (identity transforms)
        sia = _support(verts_a, count_a, -d)
        sib = _support(verts_b, count_b, d)
        dup = jnp.any((sia == save_ia) & (sib == save_ib) & (jnp.arange(3) < save_count))
        iters = jnp.where(done, iters, iters + 1)
        done = done | dup

        # Append new vertex by lane mask (a dynamic-index .at[].set is a
        # batched scatter under vmap; this is pure elementwise)
        new_wa = tgather(verts_a, sia)
        new_wb = tgather(verts_b, sib)
        app = ~done
        lane_hit = app & (jnp.arange(3) == count)     # [3]
        lh2 = lane_hit[:, None]
        wa = jnp.where(lh2, new_wa[None, :], wa)
        wb = jnp.where(lh2, new_wb[None, :], wb)
        w = jnp.where(lh2, (new_wb - new_wa)[None, :], w)
        ia = jnp.where(lane_hit, sia, ia)
        ib = jnp.where(lane_hit, sib, ib)
        count = jnp.where(app, count + 1, count)
        return (wa, wb, w, ia, ib, bary, count, done, iters)

    iters0 = jnp.zeros((), jnp.int32)
    carry = (wa, wb, w, ia, ib, bary, count, jnp.zeros((), bool), iters0)
    # statically unrolled: a device while loop costs ~1-2 ms per trip on TPU
    for _it in range(max_iters):
        carry = body(_it, carry)
    wa, wb, w, ia, ib, bary, count, done, iters = carry

    # Final simplex solve: the loop body solves at the top of each trip, so if
    # the trip budget ran out right after an append the last vertex has no
    # barycentric weight yet. Re-solving a solved simplex is idempotent.
    perm2, a2, cnt2 = _solve_simplex2(w)
    perm3, a3, cnt3 = _solve_simplex3(w)
    id_perm = jnp.arange(3, dtype=jnp.int32)
    perm = jnp.where(count == 1, id_perm, jnp.where(count == 2, perm2, perm3))
    bary = jnp.where(count == 1, jnp.array([1.0, 0.0, 0.0]), jnp.where(count == 2, a2, a3))
    count = jnp.where(count == 1, 1, jnp.where(count == 2, cnt2, cnt3))
    wa, wb = tgather(wa, perm), tgather(wb, perm)
    ia, ib = tgather(ia, perm), tgather(ib, perm)

    lane = jnp.arange(3)
    mask = (lane < count)[:, None]
    point_a = jnp.where(count == 3, (bary[:, None] * wa).sum(0), (bary[:, None] * wa * mask).sum(0))
    point_b_w = jnp.where(count == 3, point_a, (bary[:, None] * wb * mask).sum(0))
    # reference: src/distance.c:297-302 uses a for both at count 3
    point_b = point_b_w
    distance = m.length(point_b - point_a)

    return GJKOutput(point_a, point_b, distance, count, ia, ib, iters)


def segment_distance(p1, q1, p2, q2):
    """Closest points of two segments (reference: src/distance.c:16-89).
    Returns (closest1, closest2, fraction1, fraction2, distance_squared)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    dd1 = m.dot(d1, d1)
    dd2 = m.dot(d2, d2)
    rd1 = m.dot(r, d1)
    rd2 = m.dot(r, d2)
    eps_sqr = _EPS * _EPS

    def clamp01(x):
        return jnp.clip(x, 0.0, 1.0)

    # degenerate cases
    f1_deg1 = clamp01(-rd1 / jnp.where(dd1 != 0, dd1, 1.0))
    f2_deg2 = clamp01(rd2 / jnp.where(dd2 != 0, dd2, 1.0))

    d12 = m.dot(d1, d2)
    denom = dd1 * dd2 - d12 * d12
    f1 = jnp.where(denom != 0.0, clamp01((d12 * rd2 - rd1 * dd2) / jnp.where(denom != 0.0, denom, 1.0)), 0.0)
    f2 = (d12 * f1 + rd2) / jnp.where(dd2 != 0, dd2, 1.0)
    # clamping f2 requires a redo on f1
    f1 = jnp.where(f2 < 0.0, clamp01(-rd1 / jnp.where(dd1 != 0, dd1, 1.0)), jnp.where(f2 > 1.0, clamp01((d12 - rd1) / jnp.where(dd1 != 0, dd1, 1.0)), f1))
    f2 = jnp.clip(f2, 0.0, 1.0)

    both_deg = (dd1 < eps_sqr) & (dd2 < eps_sqr)
    deg1 = (dd2 < eps_sqr) & ~both_deg  # segment2 degenerate
    deg2 = (dd1 < eps_sqr) & ~both_deg  # segment1 degenerate

    fraction1 = jnp.where(both_deg, 0.0, jnp.where(deg1, f1_deg1, jnp.where(deg2, 0.0, f1)))
    fraction2 = jnp.where(both_deg, 0.0, jnp.where(deg1, 0.0, jnp.where(deg2, f2_deg2, f2)))

    c1 = p1 + fraction1[..., None] * d1
    c2 = p2 + fraction2[..., None] * d2
    dsq = m.dot(c2 - c1, c2 - c1)
    return c1, c2, fraction1, fraction2, dsq
