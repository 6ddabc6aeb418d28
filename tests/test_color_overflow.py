"""Color-overflow fence: at default configs, NO scene in the catalog may
skip constraints (diag.color_overflow == 0 over a rollout).

Overflowed constraints are silently skipped for a step (config.py:
incremental_coloring), and the failure mode — sinking stacks — was hit in
round 1 when max_colors was cut below the contact graph's needs. The
reference has no such failure mode at all: sequential Gauss-Seidel solves
every constraint every iteration (reference: src/solve_pgs.c:133-153), so
zero overflow at scene defaults is the parity bar.

Not in the `fast` tier: 26 distinct XLA programs. The persistent compile
cache (/tmp/jaxcache) makes reruns cheap.
"""

import jax
import numpy as np
import pytest

from solver2d_tpu import SolverType
from solver2d_tpu.models import build, scene_names
from solver2d_tpu.step import step as step_fn

# big scenes built at reduced size (full size is tests/test_large_scenes.py /
# the flagship harness's job); same reductions as test_scenes.py
_SMALL = {
    ("Joints", "Joint Grid"): ("joint_scenes", "joint_grid", dict(numk=8, numi=8)),
    ("Joints", "Ragdoll Stress"): ("joint_scenes", "ragdoll_stress", dict(count=4)),
    ("Contact", "Rush"): ("contact_scenes", "rush", dict(count=50)),
    ("Contact", "Confined"): ("contact_scenes", "confined", dict(grid_count=8)),
}


def _build(key):
    if key in _SMALL:
        mod, fn, kw = _SMALL[key]
        import importlib

        m = importlib.import_module(f"solver2d_tpu.models.{mod}")
        return getattr(m, fn)(SolverType.TGS_SOFT, **kw)
    return build(key[0], key[1], SolverType.TGS_SOFT)


@pytest.mark.parametrize("key", scene_names(), ids=lambda k: f"{k[0]}-{k[1]}")
def test_no_color_overflow_at_defaults(key):
    scene = _build(key)
    state, cfg = scene.freeze()

    def body(s, i):
        if scene.pre_step is not None:
            s = scene.pre_step(s)
        s = step_fn(s, 1.0 / 60.0, cfg)
        return s, (s.diag.color_overflow, s.diag.pair_overflow)

    f = jax.jit(lambda s: jax.lax.scan(body, s, np.arange(30)))
    out, (covf, povf) = f(state)

    pos = np.asarray(out.bodies.position)
    alive = np.asarray(out.bodies.alive)
    assert np.isfinite(pos[alive]).all(), f"{key}: non-finite positions"
    assert not np.asarray(povf).any(), f"{key}: pair-table overflow at defaults"
    assert int(np.asarray(covf).max()) == 0, (
        f"{key}: {int(np.asarray(covf).max())} constraints skipped by color "
        f"overflow at default max_colors={cfg.max_colors}"
    )
