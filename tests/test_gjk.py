import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solver2d_tpu.ops import distance, geometry

pytestmark = pytest.mark.fast


def pad8(pts):
    g = np.zeros((8, 2), np.float32)
    pts = np.asarray(pts, np.float32)
    g[: len(pts)] = pts
    g[len(pts):] = pts[-1]
    return jnp.asarray(g)


_gjk = jax.jit(distance.gjk)


def run_gjk(pts_a, pts_b):
    out = _gjk(
        pad8(pts_a), jnp.int32(len(pts_a)),
        pad8(pts_b), jnp.int32(len(pts_b)),
        jnp.int32(0), jnp.zeros(3, jnp.int32), jnp.zeros(3, jnp.int32),
    )
    return jax.tree.map(np.asarray, out)


def overlaps(p, q):
    def sep_ax(p, q):
        for i in range(len(p)):
            e = p[(i + 1) % len(p)] - p[i]
            n = np.array([e[1], -e[0]])
            if all(((v - p[i]) @ n) > 0 for v in q):
                return True
        return False

    return not sep_ax(p, q) and not sep_ax(q, p)


def poly_points(pts, n=200):
    pts = np.asarray(pts, float)
    if len(pts) == 1:
        return pts
    out = []
    for i in range(len(pts)):
        a, b = pts[i], pts[(i + 1) % len(pts)]
        for t in np.linspace(0, 1, n // len(pts), endpoint=False):
            out.append(a + t * (b - a))
    return np.array(out)


def sampled_distance(pts_a, pts_b):
    A = poly_points(pts_a)
    B = poly_points(pts_b)
    d = np.linalg.norm(A[:, None, :] - B[None, :, :], axis=-1)
    return d.min()


def test_point_point():
    out = run_gjk([(0.0, 0.0)], [(3.0, 4.0)])
    assert out.distance == pytest.approx(5.0, rel=1e-6)
    np.testing.assert_allclose(out.point_a, [0, 0], atol=1e-6)
    np.testing.assert_allclose(out.point_b, [3, 4], atol=1e-6)
    assert out.cache_count == 1


def test_separated_boxes():
    a = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
    b = [(2, -1), (4, -1), (4, 1), (2, 1)]
    out = run_gjk(a, b)
    assert out.distance == pytest.approx(1.0, rel=1e-5)
    # Symmetric face-face: the reference GJK also collapses to a single vertex
    # pair here (support-duplicate termination right after the w2-region
    # reduction) — verified by hand-tracing s2ShapeDistance on this input.
    assert out.cache_count == 1


def test_vertex_vertex_case():
    a = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
    b = [(2, 2), (4, 2), (4, 4), (2, 4)]
    out = run_gjk(a, b)
    assert out.distance == pytest.approx(np.sqrt(2.0), rel=1e-5)
    assert out.cache_count == 1
    np.testing.assert_allclose(out.point_a, [1, 1], atol=1e-5)
    np.testing.assert_allclose(out.point_b, [2, 2], atol=1e-5)


def test_overlapping_boxes_zero_distance():
    a = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
    b = [(0, 0), (2, 0), (2, 2), (0, 2)]
    out = run_gjk(a, b)
    assert out.distance == pytest.approx(0.0, abs=1e-6)


def test_random_pairs_vs_sampling():
    rng = np.random.default_rng(0)
    for trial in range(25):
        na, nb = rng.integers(3, 7), rng.integers(3, 7)
        pa = rng.normal(size=(na + 4, 2))
        pb = rng.normal(size=(nb + 4, 2)) + rng.normal(scale=3.0, size=2)
        from solver2d_tpu.ops.hull import compute_hull

        ha, hb = compute_hull(pa[:8]), compute_hull(pb[:8])
        if ha is None or hb is None:
            continue
        out = run_gjk(ha, hb)
        ref = sampled_distance(ha, hb)
        if ref < 1e-3 or overlaps(ha, hb):
            # boundary sampling can't see containment; true distance is 0
            assert out.distance <= 0.05
        else:
            assert out.distance == pytest.approx(ref, rel=0.05, abs=0.02)


def test_warm_start_cache_consistency():
    a = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
    b = [(2.0, -0.5), (3.0, -0.5), (3.0, 0.5), (2.0, 0.5)]
    cold = run_gjk(a, b)
    warm = distance.gjk(
        pad8(a), jnp.int32(4), pad8(b), jnp.int32(4),
        jnp.int32(cold.cache_count), jnp.asarray(cold.cache_index_a), jnp.asarray(cold.cache_index_b),
    )
    assert float(warm.distance) == pytest.approx(float(cold.distance), rel=1e-6)
    assert int(warm.iterations) <= int(cold.iterations)


def test_segment_distance():
    c1, c2, f1, f2, dsq = distance.segment_distance(
        jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]),
        jnp.array([0.5, 1.0]), jnp.array([0.5, 2.0]),
    )
    np.testing.assert_allclose(np.asarray(c1), [0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), [0.5, 1.0], atol=1e-6)
    assert float(dsq) == pytest.approx(1.0, rel=1e-6)
