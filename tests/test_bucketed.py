"""Color-bucketed solve (SimConfig.contact_bucket_cap): unit behavior of
build_color_buckets plus trajectory parity vs the dense colored path.

The bucketed path must compute the SAME per-contact math as the dense path
(same coloring, same within-color parallel-GS semantics) — only the layout
changes — so trajectories agree to float reassociation noise."""

import jax.numpy as jnp
import numpy as np
import pytest

from solver2d_tpu import BodyType, SolverType, World
from solver2d_tpu.ops import geometry
from solver2d_tpu.ops.coloring import build_color_buckets
from solver2d_tpu.step import make_step

pytestmark = pytest.mark.fast


def test_build_color_buckets_unit():
    color = jnp.array([0, 1, 0, -1, 2, 0, 1, 0], jnp.int32)
    active = jnp.array([1, 1, 1, 1, 1, 0, 1, 1], bool)
    K, cap = 4, 2
    bucket, new_color, dropped = build_color_buckets(color, active, K, cap)
    bucket = np.asarray(bucket).reshape(K, cap)
    # color 0 actives are constraints 0,2,7 -> first two bucketed, 7 dropped
    assert bucket[0].tolist() == [0, 2]
    assert bucket[1].tolist() == [1, 6]
    assert bucket[2].tolist() == [4, -1]
    assert bucket[3].tolist() == [-1, -1]
    assert int(dropped) == 1
    nc = np.asarray(new_color)
    assert nc[7] == -1                      # dropped -> recolor next step
    assert nc[0] == 0 and nc[2] == 0 and nc[4] == 2
    # every active bucketed constraint appears exactly once
    flat = bucket.reshape(-1)
    assert sorted(flat[flat >= 0].tolist()) == [0, 1, 2, 4, 6]


def _stack_world(solver, n=6):
    w = World(solver=solver)
    g = w.create_body(type=BodyType.STATIC, position=(0.0, -0.5))
    w.create_polygon_shape(g, geometry.box(6.0, 0.5))
    for i in range(n):
        b = w.create_body(type=BodyType.DYNAMIC, position=(0.1 * (i % 2), 0.55 + 1.05 * i))
        w.create_polygon_shape(b, geometry.box(0.5, 0.5))
    return w


@pytest.mark.parametrize(
    "solver",
    [SolverType.TGS_SOFT, SolverType.PGS_NGS, SolverType.XPBD, SolverType.PGS_NGS_BLOCK],
    ids=lambda s: s.name,
)
def test_bucketed_matches_dense(solver):
    # PGS_NGS_BLOCK at max_colors=8 compiles to an executable whose CPU
    # serialization SEGFAULTS inside jaxlib (LoadedExecutable.serialize, the
    # persistent-cache write path — reproduced twice at the same frame,
    # compilation_cache.py put_executable_and_time). Shrink the Murty-block
    # program (4 colors, 4 boxes) below the crash size; physics asserts are
    # unchanged. See CLAUDE.md round-5 notes.
    n, colors = (4, 4) if solver == SolverType.PGS_NGS_BLOCK else (6, 8)
    state_d, cfg_d = _stack_world(solver, n=n).freeze(max_colors=colors)
    state_b, cfg_b = _stack_world(solver, n=n).freeze(max_colors=colors, contact_bucket_cap=-1)
    assert cfg_b.contact_bucket_cap > 0  # -1 auto-sized at freeze
    step_d, step_b = make_step(cfg_d), make_step(cfg_b)
    for i in range(90):
        state_d = step_d(state_d, 1 / 60)
        state_b = step_b(state_b, 1 / 60)
        if i == 9:
            # short horizon: identical coloring (cap generous), identical
            # per-contact math -> only scatter-order reassociation noise
            pd = np.asarray(state_d.bodies.position)
            pb = np.asarray(state_b.bodies.position)
            assert np.allclose(pd, pb, atol=1e-5), np.abs(pd - pb).max()
    pd = np.asarray(state_d.bodies.position)
    pb = np.asarray(state_b.bodies.position)
    assert np.allclose(pd, pb, atol=2e-4), np.abs(pd - pb).max()
    assert int(state_b.diag.color_overflow) == 0
    assert float(state_b.diag.max_penetration) < 0.02
    # stored warm-start impulses must round-trip the bucket permutation
    nd = np.asarray(state_d.contacts.normal_impulse)
    nb = np.asarray(state_b.contacts.normal_impulse)
    assert np.allclose(nd, nb, atol=2e-3), np.abs(nd - nb).max()


def test_bucketed_tight_cap_balances():
    """A cap below the greedy color sizes forces the capacity-aware coloring
    to spread contacts across colors; after the transient the stack must be
    fully solved (no persistent drops) and stay put."""
    state, cfg = _stack_world(SolverType.TGS_SOFT).freeze(
        max_colors=8, contact_bucket_cap=2
    )
    stepf = make_step(cfg)
    for _ in range(120):
        state = stepf(state, 1 / 60)
    assert int(state.diag.color_overflow) == 0           # balanced in steady state
    assert float(state.diag.max_penetration) < 0.02
    ys = np.asarray(state.bodies.position)[1:7, 1]
    assert np.all(np.diff(ys) > 0.8), ys                 # stack intact, no sinking


def _chain_world(solver, n=5):
    """Pendulum chain: exercises revolute prepare/warm/solve + limits."""
    w = World(solver=solver)
    g = w.create_body(type=BodyType.STATIC, position=(0.0, 0.0))
    w.create_polygon_shape(g, geometry.box(0.2, 0.2))
    prev = g
    for i in range(n):
        b = w.create_body(type=BodyType.DYNAMIC, position=(1.0 + i, 0.0))
        w.create_capsule_shape(b, (-0.4, 0.0), (0.4, 0.0), 0.1)
        w.create_revolute_joint(prev, b, local_anchor_a=(0.5, 0.0), local_anchor_b=(-0.5, 0.0))
        prev = b
    return w


@pytest.mark.parametrize(
    "solver", [SolverType.TGS_SOFT, SolverType.XPBD], ids=lambda s: s.name
)
def test_solve_joints_false_identical_on_jointless_scene(solver):
    """config.solve_joints=False statically removes the empty joint table's
    solve phases; on a joint-free scene every skipped phase was an exact
    no-op, so trajectories must be BIT-identical, not merely close."""
    state_t, cfg_t = _stack_world(solver, n=4).freeze(max_colors=8)
    state_f, cfg_f = _stack_world(solver, n=4).freeze(max_colors=8, solve_joints=False)
    assert cfg_t.solve_joints and not cfg_f.solve_joints
    step_t, step_f = make_step(cfg_t), make_step(cfg_f)
    for _ in range(60):
        state_t = step_t(state_t, 1 / 60)
        state_f = step_f(state_f, 1 / 60)
    np.testing.assert_array_equal(
        np.asarray(state_t.bodies.position), np.asarray(state_f.bodies.position)
    )
    np.testing.assert_array_equal(
        np.asarray(state_t.bodies.rot), np.asarray(state_f.bodies.rot)
    )
    np.testing.assert_array_equal(
        np.asarray(state_t.contacts.normal_impulse),
        np.asarray(state_f.contacts.normal_impulse),
    )


def test_solve_joints_false_rejects_jointed_scene():
    with pytest.raises(AssertionError):
        _chain_world(SolverType.TGS_SOFT).freeze(solve_joints=False)


@pytest.mark.parametrize(
    "solver", [SolverType.TGS_SOFT, SolverType.PGS_NGS_BLOCK], ids=lambda s: s.name
)
def test_solve_contacts_false_identical_on_contact_free_scene(solver):
    """config.solve_contacts=False (the mirror skip, for the reference's
    contact-free joint scenes like Joint Grid) statically removes the empty
    contact table's phases; on a contact-free scene every skipped phase was
    an exact no-op, so trajectories must be BIT-identical."""
    state_t, cfg_t = _chain_world(solver).freeze(max_colors=4, joint_max_colors=4)
    state_f, cfg_f = _chain_world(solver).freeze(
        max_colors=4, joint_max_colors=4, solve_contacts=False
    )
    assert cfg_t.solve_contacts and not cfg_f.solve_contacts
    step_t, step_f = make_step(cfg_t), make_step(cfg_f)
    for _ in range(60):
        state_t = step_t(state_t, 1 / 60)
        state_f = step_f(state_f, 1 / 60)
    assert int(np.asarray(state_t.diag.contact_count)) == 0  # scene stayed contact-free
    np.testing.assert_array_equal(
        np.asarray(state_t.bodies.position), np.asarray(state_f.bodies.position)
    )
    np.testing.assert_array_equal(
        np.asarray(state_t.bodies.rot), np.asarray(state_f.bodies.rot)
    )
    np.testing.assert_array_equal(
        np.asarray(state_t.joints.impulse), np.asarray(state_f.joints.impulse)
    )


@pytest.mark.parametrize(
    "solver", [SolverType.PGS_NGS, SolverType.XPBD], ids=lambda s: s.name
)
def test_joint_bucketed_matches_dense(solver):
    state_d, cfg_d = _chain_world(solver).freeze(joint_max_colors=4)
    state_b, cfg_b = _chain_world(solver).freeze(joint_max_colors=4, joint_bucket_cap=-1)
    assert cfg_b.joint_bucket_cap > 0
    step_d, step_b = make_step(cfg_d), make_step(cfg_b)
    for _ in range(60):
        state_d = step_d(state_d, 1 / 60)
        state_b = step_b(state_b, 1 / 60)
    pd = np.asarray(state_d.bodies.position)
    pb = np.asarray(state_b.bodies.position)
    assert np.allclose(pd, pb, atol=2e-4), np.abs(pd - pb).max()
    assert np.isfinite(pb).all()
    assert int(state_b.diag.color_overflow) == 0
    jd = np.asarray(state_d.joints.impulse)
    jb = np.asarray(state_b.joints.impulse)
    assert np.allclose(jd, jb, atol=2e-3), np.abs(jd - jb).max()
