"""Fused Pallas solver kernel vs the XLA path (interpret mode on CPU).

The kernel reuses `solve_contact_core` and replaces gathers with one-hot
matmuls (exact zero-adds), so results must match the XLA solver to float32
roundoff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solver2d_tpu import SolverType
from solver2d_tpu.models.contact_scenes import pyramid_world
from solver2d_tpu.ops import coloring
from solver2d_tpu.solvers import pallas_solver
from solver2d_tpu.solvers.common import (
    finalize_positions,
    make_body_map,
    pack_body_state,
    prepare_contacts,
    unpack_body_state,
)
from solver2d_tpu.solvers.loops import solve_tgs_soft
from solver2d_tpu.step import step as step_fn


@pytest.fixture(scope="module")
def settled():
    """A pyramid stepped a few times so a real contact population exists."""
    w, ids = pyramid_world(SolverType.TGS_SOFT, base_count=6)
    state, cfg = w.freeze(max_colors=8)
    f = jax.jit(lambda s: step_fn(s, 1.0 / 60.0, cfg))
    for _ in range(5):
        state = f(state)
    return state, cfg


def test_kernel_matches_xla_solver(settled):
    state, cfg = settled
    bodies, contacts, joints = state.bodies, state.contacts, state.joints
    dyn = (bodies.type == 2) & bodies.alive
    touching = contacts.alive & (contacts.point_count > 0)
    assert int(touching.sum()) > 10  # real workload

    ccolor, _ = coloring.color_graph(
        contacts.body_a, contacts.body_b, touching, dyn, cfg.max_bodies, cfg.max_colors
    )
    cmap = make_body_map(contacts.body_a, contacts.body_b, ccolor, touching, dyn, cfg.max_bodies, cfg.max_colors)
    jcolor, _ = coloring.color_graph(
        joints.body_a, joints.body_b, joints.alive, dyn, cfg.max_bodies, cfg.joint_max_colors
    )
    jmap = make_body_map(joints.body_a, joints.body_b, jcolor, joints.alive, dyn, cfg.max_bodies, cfg.joint_max_colors)
    colors = (ccolor, cmap, jcolor, jmap)

    dt = 1.0 / 60.0
    # XLA reference path
    ref_bodies, ref_contacts, _ = solve_tgs_soft(
        bodies, contacts, joints, colors, state.gravity, jnp.float32(dt), cfg
    )

    # Pallas path: same prepare, then the fused kernel, then finalize
    from solver2d_tpu.config import CONTACT_HERTZ

    h = dt / cfg.iterations
    inv_h = cfg.iterations / dt
    hertz = min(CONTACT_HERTZ, 0.25 * inv_h)
    cons, n0, t0 = prepare_contacts(bodies, contacts, h=h, hertz=hertz, soft=True, warm_start=cfg.warm_start)
    from solver2d_tpu.config import JOINT_HERTZ
    from solver2d_tpu.solvers import joints as jk

    jhertz = min(JOINT_HERTZ, 0.125 * inv_h)
    jcons, jimp0 = jk.prepare_joints(bodies, joints, h=h, hertz=jhertz, soft=True, warm_start=True)
    bs0 = pack_body_state(bodies.v, bodies.w, bodies.delta_pos, bodies.rot)
    bs, n_imp, t_imp, _ = pallas_solver.fused_solve(
        bodies, bs0, n0, t0, cons, state.gravity, ccolor, cmap,
        jnp.float32(h), jnp.float32(inv_h), cfg,
        jcons, jimp0, jcolor, jmap, interpret=True,
    )
    v, w, dp, rot = unpack_body_state(bs)
    out_bodies = finalize_positions(bodies, dp, rot, v, w)

    np.testing.assert_allclose(
        np.asarray(out_bodies.position), np.asarray(ref_bodies.position), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(out_bodies.v), np.asarray(ref_bodies.v), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_bodies.rot), np.asarray(ref_bodies.rot), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(n_imp), np.asarray(ref_contacts.normal_impulse), atol=2e-3
    )


@pytest.mark.parametrize("solver", [SolverType.TGS_SOFT, SolverType.SOFT_STEP, SolverType.PGS_SOFT])
def test_step_with_pallas_flag(solver):
    """Full step() with use_pallas_solver must track the XLA step for every
    solver the fused kernel covers."""
    w, ids = pyramid_world(solver, base_count=4)
    state_x, cfg_x = w.freeze(max_colors=8)
    w2, _ = pyramid_world(solver, base_count=4)
    state_p, cfg_p = w2.freeze(max_colors=8, use_pallas_solver=True)

    fx = jax.jit(lambda s: step_fn(s, 1.0 / 60.0, cfg_x))
    fp = jax.jit(lambda s: step_fn(s, 1.0 / 60.0, cfg_p))
    for _ in range(30):
        state_x = fx(state_x)
        state_p = fp(state_p)
    np.testing.assert_allclose(
        np.asarray(state_p.bodies.position), np.asarray(state_x.bodies.position), atol=5e-3
    )
    assert float(state_p.diag.max_penetration) < 0.02


@pytest.mark.parametrize("solver", [SolverType.TGS_SOFT, SolverType.PGS_SOFT])
def test_step_with_pallas_flag_joints(solver):
    """The fused kernel's joint pass (revolute chain under gravity, motors +
    limits in the Ragdoll variant are covered by the scene catalog) must track
    the XLA path's joint solve (solve order: joints before contacts per
    substep, reference src/solve_tgs_soft.c:207-231). 6 steps: interpret
    mode executes the kernel op-by-op on CPU, ~minutes per step on the
    1-core box — enough for the chain to load and the impulses to settle."""
    from solver2d_tpu.models import build

    state_x, cfg_x = build("Joints", "Stretched Chain", solver).freeze(max_colors=4)
    state_p, cfg_p = build("Joints", "Stretched Chain", solver).freeze(
        max_colors=4, use_pallas_solver=True
    )

    fx = jax.jit(lambda s: step_fn(s, 1.0 / 60.0, cfg_x))
    fp = jax.jit(lambda s: step_fn(s, 1.0 / 60.0, cfg_p))
    for _ in range(6):
        state_x = fx(state_x)
        state_p = fp(state_p)
    assert np.isfinite(np.asarray(state_p.bodies.position)).all()
    np.testing.assert_allclose(
        np.asarray(state_p.bodies.position), np.asarray(state_x.bodies.position), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(state_p.joints.impulse), np.asarray(state_x.joints.impulse), atol=5e-2
    )
