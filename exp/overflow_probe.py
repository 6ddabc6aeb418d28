"""Probe the four scenes failing the color-overflow fence at defaults
(round 5): raise the caps far above default, roll 30 steps, and print what
each scene actually needs (max live pairs vs default C, colors) so the
default_config auto-sizing can be fixed from data, not guesswork."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import importlib

import numpy as np

from solver2d_tpu import SolverType
from solver2d_tpu.models import build
from solver2d_tpu.step import step as step_fn

SMALL = {
    ("Joints", "Ragdoll Stress"): ("joint_scenes", "ragdoll_stress", dict(count=4)),
}


def _build(key):
    if key in SMALL:
        mod, fn, kw = SMALL[key]
        m = importlib.import_module(f"solver2d_tpu.models.{mod}")
        return getattr(m, fn)(SolverType.TGS_SOFT, **kw)
    return build(key[0], key[1], SolverType.TGS_SOFT)


for key in [
    ("Contact", "Card House"),
    ("Contact", "Pyramid"),
    ("Far", "Ragdoll Pile"),
    ("Joints", "Ragdoll Stress"),
]:
    scene = _build(key)
    dflt = scene.world.default_config(**scene.config_overrides)
    state, cfg = scene.freeze(
        max_contacts=4 * dflt.max_contacts, max_colors=16, sap_window=64
    )

    def body(s, _):
        if scene.pre_step is not None:
            s = scene.pre_step(s)
        s = step_fn(s, 1.0 / 60.0, cfg)
        return s, (
            s.diag.pair_count,
            s.diag.contact_count,
            s.diag.color_overflow,
            s.diag.pair_overflow,
        )

    f = jax.jit(lambda s: jax.lax.scan(body, s, np.arange(30)))
    out, (pc, cc, covf, povf) = f(state)
    print(
        f"{key}: default C={dflt.max_contacts} colors={dflt.max_colors} "
        f"cell={dflt.grid_cell:.2f} big={dflt.max_big_shapes} | probe "
        f"maxpairs={int(np.asarray(pc).max())} maxcontacts={int(np.asarray(cc).max())} "
        f"covf={int(np.asarray(covf).max())} povf={bool(np.asarray(povf).any())}",
        flush=True,
    )
