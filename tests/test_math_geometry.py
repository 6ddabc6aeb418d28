import jax.numpy as jnp
import numpy as np
import pytest

from solver2d_tpu.ops import geometry, math2d as m

pytestmark = pytest.mark.fast


def test_rot_roundtrip():
    angles = jnp.linspace(-3.0, 3.0, 17)
    q = m.make_rot(angles)
    np.testing.assert_allclose(m.rot_angle(q), angles, atol=1e-6)


def test_rotate_inverse():
    q = m.make_rot(jnp.array([0.3, -1.2, 2.9]))
    v = jnp.array([[1.0, 2.0], [-3.0, 0.5], [0.0, -1.0]])
    np.testing.assert_allclose(m.inv_rotate(q, m.rotate(q, v)), v, atol=1e-5)


def test_integrate_rot_small_step():
    q = m.make_rot(0.5)
    q2 = m.integrate_rot(q, 0.01)
    np.testing.assert_allclose(m.rot_angle(q2), 0.51, atol=1e-4)
    # renormalized
    np.testing.assert_allclose(jnp.linalg.norm(q2), 1.0, atol=1e-6)


def test_angular_velocity_recovery():
    q1 = m.make_rot(0.2)
    q2 = m.make_rot(0.25)
    w = m.compute_angular_velocity(q1, q2, 100.0)
    np.testing.assert_allclose(w, 5.0, rtol=1e-3)


def test_mul_rot():
    a, b = 0.3, 0.9
    np.testing.assert_allclose(
        m.mul_rot(m.make_rot(b), m.make_rot(a)), m.make_rot(a + b), atol=1e-6
    )
    np.testing.assert_allclose(m.relative_angle(m.make_rot(b), m.make_rot(a)), b - a, atol=1e-6)


def test_solve22():
    A = m.mat22(2.0, 1.0, 1.0, 3.0)
    b = jnp.array([5.0, 10.0])
    x = m.solve22(A, b)
    np.testing.assert_allclose(m.mul_mv(A, x), b, atol=1e-5)
    np.testing.assert_allclose(m.mul_mv(m.inverse22(A), b), x, atol=1e-5)


# --- mass properties (reference: src/geometry.c:117-286) ---

def test_box_mass():
    g = geometry.box(0.5, 0.5)
    md = geometry.compute_mass(g, 1.0)
    assert md.mass == pytest.approx(1.0, rel=1e-6)
    np.testing.assert_allclose(md.center, [0.0, 0.0], atol=1e-7)
    # I = m (w^2 + h^2) / 12 = 1 * (1 + 1) / 12
    assert md.inertia == pytest.approx(2.0 / 12.0, rel=1e-5)


def test_circle_mass():
    g = geometry.circle((1.0, 0.0), 0.5)
    md = geometry.compute_mass(g, 2.0)
    assert md.mass == pytest.approx(2.0 * np.pi * 0.25, rel=1e-6)
    np.testing.assert_allclose(md.center, [1.0, 0.0])
    assert md.inertia == pytest.approx(md.mass * (0.5 * 0.25 + 1.0), rel=1e-6)


def test_capsule_mass_matches_reference_formula():
    g = geometry.capsule((-0.5, 0.0), (0.5, 0.0), 0.25)
    md = geometry.compute_mass(g, 1.0)
    r, ln = 0.25, 1.0
    assert md.mass == pytest.approx((np.pi * r + 2.0 * ln) * r, rel=1e-6)
    np.testing.assert_allclose(md.center, [0.0, 0.0], atol=1e-7)
    expected_i = md.mass * (0.5 * (r * r + ln * ln) + (4 * r * r + ln * ln) / 12.0)
    assert md.inertia == pytest.approx(expected_i, rel=1e-6)


def test_offset_box_parallel_axis():
    g = geometry.offset_box(0.5, 0.5, (2.0, 0.0), 0.0)
    md = geometry.compute_mass(g, 1.0)
    assert md.mass == pytest.approx(1.0, rel=1e-5)
    np.testing.assert_allclose(md.center, [2.0, 0.0], atol=1e-6)
    assert md.inertia == pytest.approx(2.0 / 12.0 + 1.0 * 4.0, rel=1e-5)


def test_aabbs():
    g = geometry.box(1.0, 0.5)
    verts = jnp.asarray(g.verts)[None]
    normals = jnp.asarray(g.normals)[None]
    count = jnp.array([g.count])
    radius = jnp.array([g.radius])
    origin = jnp.array([[10.0, 5.0]])
    rot = m.make_rot(jnp.array([np.pi / 2]))
    out = geometry.compute_aabbs(verts, normals, count, radius, origin, rot)
    np.testing.assert_allclose(out[0], [10 - 0.5, 5 - 1.0, 10 + 0.5, 5 + 1.0], atol=1e-5)


def test_hull():
    from solver2d_tpu.ops.hull import compute_hull

    pts = [(0, 0), (1, 0), (1, 1), (0, 1), (0.5, 0.5)]
    h = compute_hull(pts)
    assert h is not None and len(h) == 4
    # CCW: positive signed area
    area = 0.0
    for i in range(len(h)):
        j = (i + 1) % len(h)
        area += h[i][0] * h[j][1] - h[j][0] * h[i][1]
    assert area > 0


def test_atan2_polynomial_matches_libm():
    """m.atan2 is the Mosaic-safe polynomial atan2 used by the joint limit
    solve inside the fused Pallas kernel (Mosaic has no atan2 lowering);
    accuracy vs libm over all quadrants, axes, and extreme ratios."""
    rng = np.random.default_rng(7)
    y = np.concatenate([
        rng.standard_normal(4096) * np.exp(rng.standard_normal(4096) * 6),
        np.array([0.0, -0.0, 1.0, -1.0, 0.0, 0.0, 1e-30, -1e-30, 3e5]),
    ]).astype(np.float32)
    x = np.concatenate([
        rng.standard_normal(4096) * np.exp(rng.standard_normal(4096) * 6),
        np.array([1.0, 1.0, 0.0, 0.0, -1.0, 0.0, -1.0, -1.0, -2e-3]),
    ]).astype(np.float32)
    got = np.asarray(m.atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=5e-7)
