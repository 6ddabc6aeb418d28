"""Auxiliary subsystem tests: settings persistence, runtime manipulation,
checkpointing, health checks, soft-constraint study."""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "extras"))

from solver2d_tpu import BodyType, SolverType, World
from solver2d_tpu.ops import geometry
from solver2d_tpu.step import make_step
from solver2d_tpu.utils import runtime
from solver2d_tpu.utils.checkpoint import load_npz, save_npz
from solver2d_tpu.utils.checks import reset_unhealthy_worlds, validate_state, world_health
from solver2d_tpu.utils.settings import Settings
import pytest

pytestmark = pytest.mark.fast


def _simple_world():
    # PGS, not TGS_SOFT: these are aux-subsystem tests (checkpoint, draw,
    # stats) — any solver produces the persisted contacts they assert on,
    # and the PGS step program traces/compiles in a fraction of the time
    # (test_aux took 47 min in round 4, mostly step compiles)
    w = World(solver=SolverType.PGS)
    g = w.create_body(type=BodyType.STATIC, position=(0, -1))
    w.create_polygon_shape(g, geometry.box(10, 1))
    b = w.create_body(type=BodyType.DYNAMIC, position=(0, 1.0))
    w.create_polygon_shape(b, geometry.box(0.5, 0.5))
    return w.freeze(max_colors=4), b


def test_settings_roundtrip(tmp_path):
    s = Settings(hertz=120.0, velocity_iterations=8, warm_start=False)
    path = str(tmp_path / "settings.json")
    s.save(path)
    s2 = Settings.load(path)
    assert s2.hertz == 120.0 and s2.velocity_iterations == 8 and not s2.warm_start
    assert Settings.load(str(tmp_path / "missing.json")).hertz == 60.0


def test_runtime_manipulation():
    (state, cfg), b = _simple_world()
    state = runtime.set_linear_velocity(state, b, (3.0, 0.0))
    state = runtime.set_angular_velocity(state, b, 1.5)
    np.testing.assert_allclose(np.asarray(state.bodies.v[b]), [3.0, 0.0])
    assert float(state.bodies.w[b]) == 1.5
    state = runtime.apply_linear_impulse(state, b, (0.0, 2.0), (0.5, 1.0))
    assert float(state.bodies.v[b][1]) > 0  # mass 1 -> +2 m/s
    state = runtime.set_transform(state, b, (5.0, 2.0), 0.3)
    np.testing.assert_allclose(np.asarray(state.bodies.origin[b]), [5.0, 2.0], atol=1e-6)
    state = runtime.apply_force_to_center(state, b, (10.0, 0.0))
    np.testing.assert_allclose(np.asarray(state.bodies.force[b]), [10.0, 0.0])


def test_checkpoint_roundtrip(tmp_path):
    (state, cfg), b = _simple_world()
    stepf = make_step(cfg)
    for _ in range(10):
        state = stepf(state, 1 / 60)
    path = str(tmp_path / "ckpt.npz")
    save_npz(path, state)
    restored = load_npz(path)
    # deterministic resume: one more step from both must agree bitwise
    a = stepf(state, 1 / 60)
    c = stepf(restored, 1 / 60)
    np.testing.assert_array_equal(np.asarray(a.bodies.position), np.asarray(c.bodies.position))


def test_health_and_reset():
    import dataclasses

    import jax.numpy as jnp

    from solver2d_tpu.parallel import replicate_state

    (state, cfg), b = _simple_world()
    batch = replicate_state(state, 4)
    assert bool(jax.vmap(world_health)(batch).all())
    # corrupt world 2
    bad = dataclasses.replace(
        batch,
        bodies=dataclasses.replace(batch.bodies, v=batch.bodies.v.at[2, b].set(jnp.nan)),
    )
    health = np.asarray(jax.vmap(world_health)(bad))
    assert list(health) == [True, True, False, True]
    fixed = reset_unhealthy_worlds(bad, batch)
    assert bool(jax.vmap(world_health)(fixed).all())
    assert validate_state(state, cfg) == []


def test_debug_draw_layers(tmp_path):
    """All debug-draw layers render (reference: debug_draw.h:45-54 toggles,
    lifecycle colors world.c:486-534): shapes, joints, AABBs, mass, contact
    points with normals / impulses / friction impulses."""
    from solver2d_tpu.utils.draw import DrawOptions, render_states

    (state, cfg), b = _simple_world()
    stepf = make_step(cfg)
    for _ in range(30):
        state = stepf(state, 1 / 60)
    # resting box: live persisted contact with nonzero normal impulse
    assert int(np.asarray(state.contacts.alive).sum()) >= 1
    opts = DrawOptions(
        draw_aabbs=True, draw_mass=True, draw_contact_points=True,
        draw_contact_normals=False, draw_contact_impulses=True,
        draw_friction_impulses=True,
    )
    path = str(tmp_path / "layers.png")
    render_states({"TGS_SOFT": state}, path=path, options=opts, title="layers")
    assert os.path.getsize(path) > 10000


def test_gjk_stats():
    """S2_GJK_DEBUG counter analog (reference: distance.c:480-482,597-599)."""
    from solver2d_tpu.utils.metrics import gjk_stats

    (state, cfg), b = _simple_world()
    stepf = make_step(cfg)
    for _ in range(30):
        state = stepf(state, 1 / 60)
    st = gjk_stats(state, gjk_iters=cfg.gjk_iters)
    assert st.calls >= 1                      # resting box-on-ground pair
    assert st.cache_hits >= 1                 # warm simplex cache persisted
    # a settled warm-started pair may converge in 0 extra support trips
    # (matches the reference counters' semantics, distance.c:572-599)
    assert 0 <= st.max_iters <= cfg.gjk_iters
    assert st.iters >= st.max_iters
    cold = gjk_stats(state, gjk_iters=cfg.gjk_iters, cold=True)
    assert cold.cache_hits == 0
    assert 1 <= cold.max_iters <= cfg.gjk_iters   # from-scratch convergence
    assert cold.iters >= st.iters                 # warm start never hurts


def test_soft_constraint_study():
    from soft_constraint import stable

    assert stable(10.0, relax=False)
    assert not stable(25.0, relax=False)
    assert stable(18.0, relax=True)


def test_interactive_testbed(tmp_path):
    """The interactive testbed's event handlers and frame loop, driven
    headlessly (reference behaviors: samples/main.cpp:151-289 key bindings,
    samples/sample.cpp:69-123 mouse drag)."""
    import types

    import matplotlib

    matplotlib.use("Agg")
    from solver2d_tpu.interactive import InteractiveTestbed

    tb = InteractiveTestbed(
        [SolverType.TGS_SOFT], scene="Contact/Single Box",
        iterations=2, extra_iterations=1,
    )
    key = lambda k: types.SimpleNamespace(key=k)

    # free-running frame advances the step counter
    tb.frame(draw=False)
    assert tb.step_count == 1

    # P pauses (no advance), O single-steps exactly once and stays paused
    tb.on_key(key("p"))
    tb.frame(draw=False)
    assert tb.paused and tb.step_count == 1
    tb.on_key(key("o"))
    tb.frame(draw=False)
    assert tb.step_count == 2 and tb.paused
    tb.frame(draw=False)
    assert tb.step_count == 2

    # mouse drag: pick the box (starts at (0,4)), drag target, release
    run = tb.runs[SolverType.TGS_SOFT]
    box = run.scene.meta["box"]
    box_y = float(np.asarray(run.state.bodies.position)[box, 1])
    down = types.SimpleNamespace(xdata=0.0, ydata=box_y, button=1)
    tb.on_mouse_down(down)
    assert tb.dragging and run.mouse_slot >= 0
    assert bool(np.asarray(run.state.joints.alive)[run.mouse_slot])
    tb.on_mouse_move(types.SimpleNamespace(xdata=3.0, ydata=box_y))
    tgt = np.asarray(run.state.joints.target)[run.mouse_slot]
    assert np.allclose(tgt, [3.0, box_y])
    # stepping with the live mouse joint is the same compiled program
    tb.on_key(key("o"))
    tb.frame(draw=False)
    tb.on_mouse_up(types.SimpleNamespace(button=1))
    assert not tb.dragging and run.mouse_slot == -1
    assert not bool(np.asarray(tb.runs[SolverType.TGS_SOFT].state.joints.alive).any())

    # R restarts the sample
    tb.on_key(key("r"))
    assert tb.step_count == 0

    # 9/0 adjust primary iterations live with a floor of 1 (main.cpp:218-224);
    # ends back at the original count so no new program is compiled below
    it0 = tb.iterations
    tb.on_key(key("0"))
    assert tb.iterations == it0 + 1
    for _ in range(it0 + 1):
        tb.on_key(key("9"))
    assert tb.iterations == 1
    for _ in range(it0 - 1):
        tb.on_key(key("0"))
    assert tb.iterations == it0

    # sample & solver cycling rebuild without stepping (no new compile here)
    idx0 = tb.sample_idx
    tb.on_key(key("]"))
    assert tb.sample_idx == (idx0 + 1) % len(tb.catalog)
    tb.on_key(key("["))
    assert tb.sample_idx == idx0
    tb.on_key(key("."))
    assert tb.solvers[0] != SolverType.TGS_SOFT
    tb.on_key(key(","))
    assert tb.solvers[0] == SolverType.TGS_SOFT

    # headless demo recording produces an animated GIF
    out = tb.record_gif(str(tmp_path / "demo.gif"), frames=2, every=1)
    assert os.path.exists(out)
