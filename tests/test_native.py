"""Native C++ scene compiler parity vs the Python path."""

import numpy as np
import pytest

from solver2d_tpu import BodyType, SolverType, World, native
from solver2d_tpu.ops import geometry

pytestmark = [pytest.mark.fast, pytest.mark.skipif(not native.available(), reason="no C++ toolchain")]


def _build(defer):
    w = World(solver=SolverType.TGS_SOFT, defer_mass=defer)
    g = w.create_body(type=BodyType.STATIC, position=(0, -1))
    w.create_polygon_shape(g, geometry.box(10, 1))
    b1 = w.create_body(type=BodyType.DYNAMIC, position=(0.3, 2.0), angle=0.4, angular_velocity=1.5)
    w.create_polygon_shape(b1, geometry.box(0.5, 0.25), density=2.0)
    w.create_circle_shape(b1, (0.4, 0.1), 0.2, density=3.0)
    b2 = w.create_body(type=BodyType.DYNAMIC, position=(-2.0, 1.0))
    w.create_capsule_shape(b2, (-0.4, 0.0), (0.4, 0.0), 0.15, density=1.5)
    b3 = w.create_body(type=BodyType.DYNAMIC, position=(2.0, 1.0))
    w.create_polygon_shape(b3, geometry.box(0.3, 0.3, radius=0.1), density=1.0)
    return w.freeze()


def test_deferred_native_mass_matches_python():
    s_native, _ = _build(defer=True)
    s_python, _ = _build(defer=False)
    bn, bp = s_native.bodies, s_python.bodies
    np.testing.assert_allclose(np.asarray(bn.mass), np.asarray(bp.mass), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bn.inertia), np.asarray(bp.inertia), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(bn.local_center), np.asarray(bp.local_center), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bn.position), np.asarray(bp.position), atol=1e-5)
    # COM-velocity fixup parity for the spinning body
    np.testing.assert_allclose(np.asarray(bn.v), np.asarray(bp.v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bn.inv_mass), np.asarray(bp.inv_mass), rtol=1e-5)


def test_shape_mass_kernels_match():
    rng = np.random.default_rng(1)
    for _ in range(20):
        kind = rng.integers(0, 3)
        if kind == 0:
            g = geometry.circle(rng.normal(size=2), float(rng.uniform(0.1, 1.0)))
        elif kind == 1:
            g = geometry.capsule(rng.normal(size=2), rng.normal(size=2) + 3.0, float(rng.uniform(0.1, 0.5)))
        else:
            g = geometry.box(*rng.uniform(0.2, 1.0, 2), radius=float(rng.uniform(0, 0.2)))
        d = float(rng.uniform(0.5, 3.0))
        m, c, inertia = native.shape_mass(g.verts, g.normals, g.count, g.radius, d)
        ref = geometry.compute_mass(g, d)
        assert m == pytest.approx(ref.mass, rel=1e-5)
        np.testing.assert_allclose(c, ref.center, atol=1e-5)
        assert inertia == pytest.approx(ref.inertia, rel=1e-4, abs=1e-7)
