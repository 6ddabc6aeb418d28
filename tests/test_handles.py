"""Slot reuse + ABA-safe handles (utils/handles.py) — the analog of the
reference's pooled {index, revision} ids (include/solver2d/id.h:12-45,
src/pool.h:38-47)."""

import numpy as np
import pytest

from solver2d_tpu import BodyType, SolverType, World
from solver2d_tpu.ops import geometry
from solver2d_tpu.utils.handles import (
    BodyId,
    PoolExhaustedError,
    StaleHandleError,
    WorldHandles,
)

pytestmark = pytest.mark.fast


def small_world():
    w = World(solver=SolverType.PGS)
    g = w.create_body(type=BodyType.STATIC, position=(0, -1))
    w.create_polygon_shape(g, geometry.box(10, 1))
    b = w.create_body(type=BodyType.DYNAMIC, position=(0, 1.0))
    w.create_polygon_shape(b, geometry.box(0.5, 0.5))
    return w.freeze(max_bodies=8, max_shapes=8, max_colors=4)


def test_create_reuses_lowest_free_slot():
    state, cfg = small_world()
    h = WorldHandles.for_state(state)
    state, bid = h.create_body(state, position=(3.0, 2.0))
    assert bid.index == 2  # slots 0,1 in use by the scene
    assert bool(state.bodies.alive[2])
    state, bid2 = h.create_body(state, position=(4.0, 2.0))
    assert bid2.index == 3
    # free the first, the slot is reused with a bumped revision
    state = h.destroy_body(state, bid)
    assert not bool(state.bodies.alive[2])
    state, bid3 = h.create_body(state, position=(5.0, 2.0))
    assert bid3.index == 2
    assert bid3.revision == bid.revision + 1


def test_stale_handle_rejected():
    state, cfg = small_world()
    h = WorldHandles.for_state(state)
    state, bid = h.create_body(state)
    state = h.destroy_body(state, bid)
    state, bid2 = h.create_body(state)          # reuses the slot
    assert bid2.index == bid.index
    with pytest.raises(StaleHandleError):
        h.destroy_body(state, bid)              # old id must NOT kill bid2
    with pytest.raises(StaleHandleError):
        h.create_box_shape(state, bid, 0.5, 0.5)
    assert bool(state.bodies.alive[bid2.index])  # new body untouched


def test_pool_exhaustion_raises():
    state, cfg = small_world()
    h = WorldHandles.for_state(state)
    ids = []
    for _ in range(6):  # capacity 8, 2 used
        state, bid = h.create_body(state)
        ids.append(bid)
    with pytest.raises(PoolExhaustedError):
        h.create_body(state)
    state = h.destroy_body(state, ids[0])
    state, _ = h.create_body(state)  # OK again


def test_created_body_simulates():
    """A runtime-created body with a shape falls under gravity and lands."""
    import jax
    from functools import partial
    from solver2d_tpu.step import step

    state, cfg = small_world()
    h = WorldHandles.for_state(state)
    state, bid = h.create_body(state, position=(2.0, 2.0), mass=1.0, inertia=0.1)
    state, sid = h.create_box_shape(state, bid, 0.4, 0.4)
    f = jax.jit(partial(step, config=cfg))
    for _ in range(150):
        state = f(state, 1 / 60)
    pos = np.asarray(state.bodies.position[bid.index])
    assert np.isfinite(pos).all()
    assert abs(pos[1] - 0.4) < 0.1  # resting on the ground (top at y=0)
