"""Narrowphase parity vs the C reference oracle (compiled from /root/reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ref_oracle as oracle
from solver2d_tpu.ops import geometry, manifold
from solver2d_tpu.ops import math2d as m

pytestmark = [pytest.mark.fast, pytest.mark.skipif(not oracle.available(), reason="C oracle unavailable")]

_collide = jax.jit(manifold.collide)


def run_collide(geom_a, xf_a, geom_b, xf_b, cache=(0, (0, 0, 0), (0, 0, 0))):
    cc, cia, cib = cache
    out = _collide(
        jnp.asarray(geom_a.verts), jnp.asarray(geom_a.normals), jnp.int32(geom_a.count), jnp.float32(geom_a.radius),
        jnp.asarray(geom_b.verts), jnp.asarray(geom_b.normals), jnp.int32(geom_b.count), jnp.float32(geom_b.radius),
        jnp.asarray(xf_a[0], jnp.float32), m.make_rot(jnp.float32(xf_a[1])),
        jnp.asarray(xf_b[0], jnp.float32), m.make_rot(jnp.float32(xf_b[1])),
        jnp.int32(cc), jnp.asarray(cia, jnp.int32), jnp.asarray(cib, jnp.int32),
    )
    return jax.tree.map(np.asarray, out)


def assert_manifold_close(mine, ref, atol=2e-4, check_ids=True):
    assert int(mine.point_count) == ref["count"], f"point count {mine.point_count} != {ref['count']}"
    if ref["count"] == 0:
        return
    np.testing.assert_allclose(mine.normal, ref["normal"], atol=atol)
    # order by id for comparison
    mine_pts = [
        dict(
            anchor_a=mine.anchor_a[i],
            anchor_b=mine.anchor_b[i],
            separation=float(mine.separation[i]),
            id=int(mine.point_id[i]),
        )
        for i in range(int(mine.point_count))
    ]
    if check_ids:
        mine_pts.sort(key=lambda p: p["id"])
        refs = sorted(ref["points"], key=lambda p: p["id"])
        for a, b in zip(mine_pts, refs):
            assert a["id"] == b["id"]
    else:
        refs = ref["points"]
    for a, b in zip(mine_pts, refs):
        np.testing.assert_allclose(a["anchor_a"], b["anchor_a"], atol=atol)
        np.testing.assert_allclose(a["anchor_b"], b["anchor_b"], atol=atol)
        assert a["separation"] == pytest.approx(b["separation"], abs=atol)


BOX = [(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)]
GROUND = [(-10.0, -1.0), (10.0, -1.0), (10.0, 0.0), (-10.0, 0.0)]


def case_poly_poly(pts_a, ra, xa, pts_b, rb, xb):
    ga = geometry.polygon(pts_a, ra) if len(pts_a) > 2 else geometry.capsule(pts_a[0], pts_a[1], ra)
    gb = geometry.polygon(pts_b, rb) if len(pts_b) > 2 else geometry.capsule(pts_b[0], pts_b[1], rb)
    mine = run_collide(ga, xa, gb, xb)
    ref, _ = oracle.collide_polygons(pts_a, ra, oracle.xf(*xa), pts_b, rb, oracle.xf(*xb))
    return mine, oracle.manifold_to_dict(ref)


def test_box_resting_on_ground():
    mine, ref = case_poly_poly(GROUND, 0.0, ((0, 0), 0.0), BOX, 0.0, ((0.0, 0.503), 0.0))
    assert_manifold_close(mine, ref)
    assert ref["count"] == 2


def test_box_overlapping_ground_sat():
    mine, ref = case_poly_poly(GROUND, 0.0, ((0, 0), 0.0), BOX, 0.0, ((0.3, 0.45), 0.02))
    assert_manifold_close(mine, ref)


def test_box_corner_on_ground():
    mine, ref = case_poly_poly(GROUND, 0.0, ((0, 0), 0.0), BOX, 0.0, ((0.0, 0.72), 0.6))
    assert_manifold_close(mine, ref)


def test_separated_no_contact():
    mine, ref = case_poly_poly(GROUND, 0.0, ((0, 0), 0.0), BOX, 0.0, ((0.0, 2.0), 0.3))
    assert int(mine.point_count) == 0 and ref["count"] == 0


def test_speculative_gap():
    mine, ref = case_poly_poly(GROUND, 0.0, ((0, 0), 0.0), BOX, 0.0, ((0.0, 0.512), 0.0))
    assert_manifold_close(mine, ref)
    assert all(p["separation"] > 0 for p in ref["points"])


def test_capsule_on_ground():
    cap = [(-0.4, 0.0), (0.4, 0.0)]
    mine, ref = case_poly_poly(GROUND, 0.0, ((0, 0), 0.0), cap, 0.25, ((0.0, 0.26), 0.0))
    assert_manifold_close(mine, ref)


def test_capsule_capsule():
    a = [(-0.5, 0.0), (0.5, 0.0)]
    b = [(-0.5, 0.0), (0.5, 0.0)]
    mine, ref = case_poly_poly(a, 0.2, ((0, 0), 0.0), b, 0.2, ((0.3, 0.41), 0.1))
    assert_manifold_close(mine, ref)


def test_circle_circle():
    ga = geometry.circle((0.0, 0.0), 0.5)
    gb = geometry.circle((0.0, 0.0), 0.5)
    mine = run_collide(ga, ((0, 0), 0.0), gb, ((0.95, 0.1), 0.0))
    ref = oracle.manifold_to_dict(
        oracle.collide_circles((0, 0), 0.5, oracle.xf((0, 0), 0.0), (0, 0), 0.5, oracle.xf((0.95, 0.1), 0.0))
    )
    assert_manifold_close(mine, ref)


def test_polygon_circle_face():
    ga = geometry.polygon(BOX)
    gb = geometry.circle((0.0, 0.0), 0.3)
    for pos in [(0.1, 0.79), (0.65, 0.65), (0.0, 0.3)]:  # face, corner, deep
        mine = run_collide(ga, ((0, 0), 0.0), gb, (pos, 0.0))
        ref = oracle.manifold_to_dict(
            oracle.collide_polygon_circle(BOX, 0.0, oracle.xf((0, 0), 0.0), (0, 0), 0.3, oracle.xf(pos, 0.0))
        )
        assert_manifold_close(mine, ref)


def test_circle_as_A_flipped_consistency():
    """Our pair order can put the circle first; normal must flip, anchors swap."""
    ga = geometry.circle((0.0, 0.0), 0.3)
    gb = geometry.polygon(BOX)
    fwd = run_collide(gb, ((0, 0), 0.0), ga, ((0.1, 0.79), 0.0))
    rev = run_collide(ga, ((0.1, 0.79), 0.0), gb, ((0, 0), 0.0))
    assert int(fwd.point_count) == int(rev.point_count) == 1
    np.testing.assert_allclose(rev.normal, -fwd.normal, atol=1e-5)
    np.testing.assert_allclose(rev.separation[0], fwd.separation[0], atol=1e-5)


def test_random_box_pairs_vs_oracle():
    rng = np.random.default_rng(7)
    mismatches = 0
    total = 0
    for _ in range(60):
        hx, hy = rng.uniform(0.2, 1.0, 2)
        pts_b = [(-hx, -hy), (hx, -hy), (hx, hy), (-hx, hy)]
        pos = (rng.uniform(-1, 1), rng.uniform(0.0, 1.6))
        ang = rng.uniform(-1.5, 1.5)
        mine, ref = case_poly_poly(GROUND, 0.0, ((0, 0), 0.0), pts_b, 0.0, (pos, ang))
        total += 1
        if int(mine.point_count) != ref["count"]:
            mismatches += 1
            continue
        if ref["count"]:
            try:
                assert_manifold_close(mine, ref, atol=5e-4)
            except AssertionError:
                mismatches += 1
    # allow rare borderline disagreements (float32 order-of-ops at thresholds)
    assert mismatches <= max(1, total // 30), f"{mismatches}/{total} mismatches"


def test_random_rounded_pairs_vs_oracle():
    rng = np.random.default_rng(3)
    mismatches = 0
    total = 0
    for _ in range(40):
        r1 = float(rng.uniform(0.0, 0.3))
        r2 = float(rng.uniform(0.05, 0.3))
        cap = [(-0.5, 0.0), (0.5, 0.0)]
        pos = (rng.uniform(-0.5, 0.5), rng.uniform(0.1, 1.2))
        ang = rng.uniform(-3, 3)
        mine, ref = case_poly_poly(BOX, r1, ((0, 0), 0.1), cap, r2, (pos, ang))
        total += 1
        if int(mine.point_count) != ref["count"]:
            mismatches += 1
            continue
        if ref["count"]:
            try:
                assert_manifold_close(mine, ref, atol=5e-4)
            except AssertionError:
                mismatches += 1
    assert mismatches <= max(1, total // 20), f"{mismatches}/{total} mismatches"
