import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solver2d_tpu import BodyType, SolverType, World
from solver2d_tpu import queries
from solver2d_tpu.ops import geometry
from solver2d_tpu.step import make_step

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def scene():
    # PGS: queries are solver-independent and the PGS step program (used
    # only by the mouse-drag test) compiles far faster than TGS_SOFT on
    # this 1-core box (test_queries took 29 min in round 4)
    w = World(solver=SolverType.PGS)
    g = w.create_body(type=BodyType.STATIC, position=(0, -1))
    w.create_polygon_shape(g, geometry.box(10, 1))
    box = w.create_body(type=BodyType.DYNAMIC, position=(0.0, 0.5))
    w.create_polygon_shape(box, geometry.box(0.5, 0.5))
    circ = w.create_body(type=BodyType.DYNAMIC, position=(3.0, 0.5))
    w.create_circle_shape(circ, (0.0, 0.0), 0.5)
    cap = w.create_body(type=BodyType.DYNAMIC, position=(-3.0, 0.3))
    w.create_capsule_shape(cap, (-0.5, 0.0), (0.5, 0.0), 0.25)
    state, cfg = w.freeze()
    return state, cfg, dict(ground=g, box=box, circ=circ, cap=cap)


def test_query_aabb(scene):
    state, cfg, ids = scene
    mask = np.asarray(queries.query_aabb(state, (-0.6, 0.0), (0.6, 1.0)))
    assert mask[1]  # box shape (index 1: ground=0, box=1)
    assert not mask[2]  # circle at x=3


def test_point_test(scene):
    state, cfg, ids = scene
    assert bool(np.asarray(queries.test_point(state, (0.0, 0.5)))[1])
    assert not np.asarray(queries.test_point(state, (1.5, 0.5))).any()
    assert bool(np.asarray(queries.test_point(state, (3.0, 0.6)))[2])
    assert bool(np.asarray(queries.test_point(state, (-3.4, 0.3)))[3])  # capsule end cap


def test_raycast_hits_box(scene):
    state, cfg, ids = scene
    # ray along the capsule's axis height (y=0.3): first hit is the end cap
    hit = queries.raycast_world(state, (-5.0, 0.3), (5.0, 0.3))
    assert bool(hit.hit)
    assert int(hit.shape) == 3
    np.testing.assert_allclose(float(hit.point[0]), -3.75, atol=2e-2)
    np.testing.assert_allclose(np.asarray(hit.normal), [-1.0, 0.0], atol=5e-2)


def test_raycast_circle(scene):
    state, cfg, ids = scene
    hit = queries.raycast_world(state, (3.0, 3.0), (3.0, -1.0))
    assert bool(hit.hit)
    assert int(hit.shape) == 2
    np.testing.assert_allclose(float(hit.point[1]), 1.0, atol=1e-3)


def test_raycast_miss(scene):
    state, cfg, ids = scene
    hit = queries.raycast_world(state, (-5.0, 5.0), (5.0, 5.0))
    assert not bool(hit.hit)


def test_mouse_joint_drag(scene):
    state, cfg, ids = scene
    # pick the box and drag it up-right, like the testbed mouse workflow
    found, body = queries.pick_body(state, (0.0, 0.5))
    assert bool(found) and int(body) == ids["box"]
    slot = int(state.joints.alive.sum())  # first free slot
    state = queries.attach_mouse_joint(state, slot, int(body), (0.0, 0.5), hertz=7.5, ground_body=ids["ground"])
    stepf = make_step(cfg)
    for i in range(60):
        state = queries.move_mouse_target(state, slot, (1.0 + 0.02 * i, 2.0))
        state = stepf(state, 1.0 / 60.0)
    pos = np.asarray(state.bodies.position[ids["box"]])
    assert pos[1] > 1.0, f"box not lifted: {pos}"
    state = queries.detach_mouse_joint(state, slot)
    assert not bool(state.joints.alive[slot])


def test_raycast_accelerated_matches_bruteforce():
    """The slab-cull + top-k candidate raycast must agree exactly with the
    exhaustive scan on a scene large enough to trigger the accelerated path
    (the analog of tree raycast, reference: src/dynamic_tree.c:1213-1315)."""
    from solver2d_tpu.models.contact_scenes import pyramid_world

    w, _ = pyramid_world(SolverType.PGS, base_count=12)  # 79 shapes (never stepped)
    state, cfg = w.freeze(max_colors=8)
    S = int(state.shapes.verts.shape[0])
    assert S > 64  # accelerated path active at the default max_candidates

    rng = np.random.RandomState(5)
    for _ in range(20):
        p1 = rng.uniform(-8, 8, 2).astype(np.float32)
        p2 = rng.uniform(-8, 8, 2).astype(np.float32)
        acc = queries.raycast_world(state, p1, p2)                      # culled
        ref = queries.raycast_world(state, p1, p2, max_candidates=S)    # brute
        assert bool(acc.hit) == bool(ref.hit)
        if bool(ref.hit):
            np.testing.assert_allclose(float(acc.fraction), float(ref.fraction), atol=1e-7)
            np.testing.assert_allclose(np.asarray(acc.normal), np.asarray(ref.normal), atol=1e-6)
            assert int(acc.shape) == int(ref.shape)
