"""Scene catalog tests: all 24 scenes build; a representative subset steps
stably. (Scene->failure-mode mapping per SURVEY.md §4.)"""

import jax
import numpy as np
import pytest

from solver2d_tpu import SolverType
from solver2d_tpu.models import SCENES, build, scene_names
from solver2d_tpu.step import step as step_fn
from solver2d_tpu.utils.metrics import kinetic_energy


def test_catalog_complete():
    """All 26 reference samples are present: 15 in sample_contact.cpp, 5 in
    sample_far.cpp (Far Chain registers under Joints like the reference),
    6 in sample_joints.cpp."""
    names = scene_names()
    cats = {}
    for c, n in names:
        cats.setdefault(c, []).append(n)
    assert len(cats["Contact"]) == 15
    assert len(cats["Far"]) == 4
    assert len(cats["Joints"]) == 7
    assert len(names) == 26


@pytest.mark.parametrize("key", scene_names(), ids=lambda k: f"{k[0]}-{k[1]}")
def test_scene_builds(key):
    # big scenes are built with reduced parameters here (full size is the
    # benchmark harness's job)
    if key == ("Joints", "Joint Grid"):
        from solver2d_tpu.models.joint_scenes import joint_grid

        scene = joint_grid(SolverType.TGS_SOFT, numk=8, numi=8)
    elif key == ("Joints", "Ragdoll Stress"):
        from solver2d_tpu.models.joint_scenes import ragdoll_stress

        scene = ragdoll_stress(SolverType.TGS_SOFT, count=4)
    elif key == ("Contact", "Rush"):
        from solver2d_tpu.models.contact_scenes import rush

        scene = rush(SolverType.TGS_SOFT, count=50)
    elif key == ("Contact", "Confined"):
        from solver2d_tpu.models.contact_scenes import confined

        scene = confined(SolverType.TGS_SOFT, grid_count=8)
    else:
        scene = build(key[0], key[1], SolverType.TGS_SOFT)
    state, cfg = scene.freeze()
    assert int(state.bodies.alive.sum()) >= 1
    assert cfg.max_bodies >= int(state.bodies.alive.sum())


def rollout(state, cfg, n, dt=1.0 / 60.0, pre=None):
    def body(s, _):
        if pre is not None:
            s = pre(s)
        return step_fn(s, dt, cfg), None

    f = jax.jit(lambda s: jax.lax.scan(body, s, None, length=n)[0])
    return f(state)


@pytest.mark.parametrize(
    "key",
    [("Contact", "Overlap Recovery"), ("Contact", "Double Domino"), ("Joints", "Stretched Chain")],
    ids=lambda k: f"{k[0]}-{k[1]}",
)
def test_scene_steps_stably(key):
    scene = build(key[0], key[1], SolverType.TGS_SOFT)
    state, cfg = scene.freeze(max_colors=8)
    out = rollout(state, cfg, 90, pre=scene.pre_step)
    pos = np.asarray(out.bodies.position)
    alive = np.asarray(out.bodies.alive)
    assert np.isfinite(pos[alive]).all()
    assert float(kinetic_energy(out)) < 1e5


def test_overlap_recovery_separates():
    """Overlapped pyramid must push apart to bounded penetration
    (reference failure mode: sample_contact.cpp:368-418)."""
    scene = build("Contact", "Overlap Recovery", SolverType.PGS_NGS_BLOCK)
    state, cfg = scene.freeze(max_colors=8)
    out = rollout(state, cfg, 120)
    assert float(out.diag.max_penetration) < 0.05
    assert not bool(out.diag.pair_overflow)


def test_rush_pre_step_forces():
    """Rush applies per-step central forces (sample_contact.cpp:631-650)."""
    scene = build("Contact", "Rush", SolverType.TGS_SOFT)
    state, cfg = scene.freeze(max_colors=8)
    s1 = scene.pre_step(state)
    f = np.asarray(s1.bodies.force)
    dyn = np.asarray(state.bodies.type) == 2
    assert (np.abs(f[dyn]).sum(axis=1) > 0).all()
    # forces point inward
    p = np.asarray(state.bodies.position)[dyn]
    assert np.all((f[dyn] * p).sum(axis=1) < 0)


def test_warm_start_energy_event():
    """Top body destruction at step 120 (sample_contact.cpp:101-110)."""
    scene = build("Contact", "Warm Start Energy", SolverType.PGS_SOFT)
    state, cfg = scene.freeze()
    top = scene.meta["top"]
    new = scene.on_step(state, 120)
    assert new is not None
    assert not bool(new.bodies.alive[top])
    assert scene.on_step(state, 60) is None
