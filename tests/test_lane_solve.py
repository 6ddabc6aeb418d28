"""Lane-batched solve (solvers/lane_solve.py) vs the per-world bucketed path.

The lane path re-schedules the identical per-constraint math (same
solve_contact_core, same prepared constraints) with shared world-0 structure
and worlds in the lane dimension, so on a lockstep (replicated) batch it must
reproduce the dense path's trajectories up to floating-point reassociation in
the warm-start scatter-add (reference semantics: solve_tgs_soft.c:138-280)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solver2d_tpu.config import SolverType
from solver2d_tpu.models.contact_scenes import pyramid_world
from solver2d_tpu.parallel import replicate_state
from solver2d_tpu.step import step_batch

pytestmark = pytest.mark.fast

STEPS = 25


def _freeze(solver):
    w, ids = pyramid_world(solver, base_count=3)
    state, cfg = w.freeze(
        max_colors=6, gjk_iters=8, contact_bucket_cap=-1,
        solve_joints=False, lane_solve=True,
    )
    return state, cfg, ids


def _run(state, cfg, worlds, steps=STEPS):
    batch = replicate_state(state, worlds)

    @jax.jit
    def roll(b):
        def body(s, _):
            return step_batch(s, 1.0 / 60.0, cfg), None

        out, _ = jax.lax.scan(body, b, None, length=steps)
        return out

    return roll(batch)


@pytest.mark.parametrize(
    "solver", [SolverType.TGS_SOFT, SolverType.PGS_SOFT, SolverType.SOFT_STEP]
)
def test_lane_matches_dense_on_lockstep_batch(solver):
    state, cfg, ids = _freeze(solver)
    lane = _run(state, cfg, 4)
    dense = _run(state, cfg.replace(lane_solve=False), 4)

    # same manifolds (narrowphase is shared; trajectories must agree closely
    # enough that contact sets stay identical)
    np.testing.assert_array_equal(
        np.asarray(lane.contacts.point_count), np.asarray(dense.contacts.point_count)
    )
    np.testing.assert_allclose(
        np.asarray(lane.bodies.position), np.asarray(dense.bodies.position),
        atol=2e-5, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(lane.contacts.normal_impulse), np.asarray(dense.contacts.normal_impulse),
        atol=2e-4, rtol=0,
    )
    # identical worlds stay in lockstep bit-for-bit under the lane path
    pos = np.asarray(lane.bodies.position)
    np.testing.assert_array_equal(pos[0], pos[1])
    assert int(np.asarray(lane.diag.color_overflow).max()) == 0
    assert np.isfinite(pos).all()


def test_lane_diverged_world_is_flagged():
    """Lane mode shares world-0's pairing/constraint structure. A world
    whose fat AABBs no longer equal world 0's — the exact condition under
    which its pairing could differ — gets diag.pair_overflow raised, so
    divergence from the lockstep contract is never silent."""
    import dataclasses

    state, cfg, ids = _freeze(SolverType.TGS_SOFT)
    # settle so the contact tables are populated
    batch = _run(state, cfg, 3, steps=10)
    assert not np.asarray(batch.diag.pair_overflow).any()

    # teleport world 2's top box: its AABBs now differ from world 0's
    top = ids[-1]
    b = batch.bodies
    pos = b.position.at[2, top].set(jnp.array([6.0, 0.3]))
    org = b.origin.at[2, top].set(jnp.array([6.0, 0.3]))
    vel = b.v.at[2, top].set(jnp.zeros(2))
    batch = dataclasses.replace(
        batch, bodies=dataclasses.replace(b, position=pos, origin=org, v=vel)
    )

    stepf = jax.jit(partial(step_batch, config=cfg))
    # step 1 refreshes world 2's AABBs at the new pose; step 2 sees them
    # differ from world 0's and raises the flag
    batch = stepf(batch, 1.0 / 60.0)
    batch = stepf(batch, 1.0 / 60.0)
    ovf = np.asarray(batch.diag.pair_overflow)
    assert bool(ovf[2]), ovf
    assert not ovf[0] and not ovf[1]
    assert np.isfinite(np.asarray(batch.bodies.position)).all()
