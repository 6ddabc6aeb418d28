"""Per-solver behavior parity vs the C reference oracle.

Scenes with one or two constraints are ordering-free, so graph-colored
Gauss-Seidel is numerically equivalent to the reference's sequential sweeps —
these trajectories must track tightly. Larger scenes are checked with
behavioral invariants (stacks stand, penetration bounded), matching the
parity definition in SURVEY.md §7 "Hard parts".
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ref_oracle as oracle
from solver2d_tpu import BodyType, SolverType, World
from solver2d_tpu.ops import geometry
from solver2d_tpu.step import step as step_fn

pytestmark = pytest.mark.skipif(not oracle.available(), reason="C oracle unavailable")

ALL_SOLVERS = list(SolverType)


def rollout(state, cfg, n, dt=1.0 / 60.0):
    def body(s, _):
        s2 = step_fn(s, dt, cfg)
        return s2, (s2.bodies.position, s2.bodies.rot)

    return jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=n), static_argnums=()
    )(state)


def ref_rollout(w: oracle.RefWorld, n, iters=4, extra=2):
    traj = []
    for _ in range(n):
        w.step(1.0 / 60.0, iters, extra, True)
        traj.append(w.positions().copy())
    return np.array(traj)


def small_cfg(w, solver):
    return w.freeze(max_colors=4, joint_max_colors=4, sap_window=8)


@pytest.mark.parametrize("solver", ALL_SOLVERS, ids=[s.name for s in ALL_SOLVERS])
def test_single_box_trajectory_parity(solver):
    """Box dropped on the ground: trajectory must match the C reference
    closely (single contact -> no ordering ambiguity)."""
    w = World(solver=solver)
    g = w.create_body(type=BodyType.STATIC, position=(0, -1))
    w.create_polygon_shape(g, geometry.box(10, 1), friction=0.5)
    b = w.create_body(type=BodyType.DYNAMIC, position=(0.0, 2.0))
    w.create_polygon_shape(b, geometry.box(0.5, 0.5), friction=0.5)
    state, cfg = small_cfg(w, solver)

    rw = oracle.RefWorld(int(solver))
    rg = rw.create_body(type=0, position=(0, -1))
    rw.create_polygon_shape(rg, geometry.box(10, 1), friction=0.5)
    rb = rw.create_body(type=2, position=(0.0, 2.0))
    rw.create_polygon_shape(rb, geometry.box(0.5, 0.5), friction=0.5)

    n = 120
    _, (pos, _) = rollout(state, cfg, n)
    ref = ref_rollout(rw, n)
    rw.close()

    mine = np.asarray(pos[:, b])
    theirs = ref[:, rb]
    err = np.abs(mine - theirs).max()
    assert np.isfinite(mine).all()
    assert err < 5e-3, f"max trajectory error {err}"
    # resting height within a slop of the reference
    assert abs(mine[-1, 1] - theirs[-1, 1]) < 2e-3


@pytest.mark.parametrize("solver", ALL_SOLVERS, ids=[s.name for s in ALL_SOLVERS])
def test_pendulum_trajectory_parity(solver):
    """Single revolute pendulum: joint solver trajectory vs reference — all
    ten solvers, covering every joint-solve mode incl. Jacobi's averaged
    pass, SoftStep's relax phase, and TGS_Sticky's Baumgarte joints
    (reference: src/joint.c dispatch, revolute_joint.c:660-790)."""
    w = World(solver=solver)
    g = w.create_body(type=BodyType.STATIC, position=(0, 0))
    b = w.create_body(type=BodyType.DYNAMIC, position=(1.0, 0.0))
    w.create_capsule_shape(b, (-0.5, 0.0), (0.5, 0.0), 0.125, density=20.0)
    w.create_revolute_joint(g, b, local_anchor_a=(0.0, 0.0), local_anchor_b=(-0.5, 0.0))
    state, cfg = small_cfg(w, solver)

    rw = oracle.RefWorld(int(solver))
    rg = rw.create_body(type=0, position=(0, 0))
    rb = rw.create_body(type=2, position=(1.0, 0.0))
    rw.create_capsule_shape(rb, (-0.5, 0.0), (0.5, 0.0), 0.125, density=20.0)
    rw.create_revolute_joint(rg, rb, local_anchor_a=(0.0, 0.0), local_anchor_b=(-0.5, 0.0))

    n = 90
    _, (pos, _) = rollout(state, cfg, n)
    ref = ref_rollout(rw, n)
    rw.close()

    mine = np.asarray(pos[:, b])
    theirs = ref[:, rb]
    err = np.abs(mine - theirs).max()
    assert np.isfinite(mine).all()
    assert err < 1e-2, f"max pendulum error {err}"


@pytest.mark.parametrize(
    "solver", [SolverType.PGS_NGS_BLOCK, SolverType.TGS_SOFT], ids=lambda s: s.name
)
def test_stack_stays_up(solver):
    """5-box vertical stack must remain standing with bounded penetration."""
    w = World(solver=solver)
    g = w.create_body(type=BodyType.STATIC, position=(0, -1))
    w.create_polygon_shape(g, geometry.box(10, 1))
    ids = []
    for i in range(5):
        b = w.create_body(type=BodyType.DYNAMIC, position=(0, 0.5 + 1.05 * i))
        w.create_polygon_shape(b, geometry.box(0.5, 0.5), friction=0.6)
        ids.append(b)
    state, cfg = w.freeze(max_colors=8)
    out, (pos, _) = rollout(state, cfg, 150)
    ys = np.asarray(pos[-1, np.array(ids), 1])
    assert np.all(np.isfinite(ys))
    np.testing.assert_allclose(ys, [0.5, 1.5, 2.5, 3.5, 4.5], atol=0.2)
    assert float(out.diag.max_penetration) < 0.02


def test_warm_start_improves_stack():
    """Warm starting must measurably help, not merely not-hurt: at 1 velocity
    iteration a cold-started PGS stack visibly sinks while impulse carry-over
    holds it (the point of the warm-start machinery, reference:
    src/contact.c:328-358)."""
    def run(warm):
        w = World(solver=SolverType.PGS)
        g = w.create_body(type=BodyType.STATIC, position=(0, -1))
        w.create_polygon_shape(g, geometry.box(10, 1))
        for i in range(3):
            b = w.create_body(type=BodyType.DYNAMIC, position=(0, 0.5 + 1.02 * i))
            w.create_polygon_shape(b, geometry.box(0.5, 0.5))
        state, cfg = w.freeze(max_colors=4)
        cfg = cfg.replace(warm_start=warm, iterations=1, extra_iterations=0)
        out, _ = rollout(state, cfg, 120)
        return out

    warm_out = run(True)
    cold_out = run(False)
    # impulses actually persist across steps under warm start
    ni = np.asarray(warm_out.contacts.normal_impulse)
    touching = np.asarray(warm_out.contacts.alive) & (np.asarray(warm_out.contacts.point_count) > 0)
    assert np.asarray(warm_out.contacts.persisted)[touching].any()
    assert np.abs(ni[touching]).max() > 0.0
    # and measurably reduce penetration (strict, with margin)
    pen_warm = float(warm_out.diag.max_penetration)
    pen_cold = float(cold_out.diag.max_penetration)
    assert pen_warm < 0.75 * pen_cold, (pen_warm, pen_cold)
