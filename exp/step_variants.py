"""Full-step TPU timing across config variants (bench scene).
Run: PYTHONPATH=/root/repo:$PYTHONPATH python exp/step_variants.py [names...]
Env: S2_PROF_WORLDS (64), S2_PROF_BASE (20), S2_PROF_STEPS (20)
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from solver2d_tpu.config import SolverType
from solver2d_tpu.models.contact_scenes import pyramid_world
from solver2d_tpu.parallel import replicate_state
from solver2d_tpu.step import step

WORLDS = int(os.environ.get("S2_PROF_WORLDS", "64"))
BASE = int(os.environ.get("S2_PROF_BASE", "20"))
STEPS = int(os.environ.get("S2_PROF_STEPS", "20"))

VARIANTS = {
    "incremental": dict(),
    "mis": dict(incremental_coloring=False),
    "colors10": dict(max_colors=10),
    "pallas": dict(use_pallas_solver=True),
    "pallas10": dict(use_pallas_solver=True, max_colors=10),
    # narrowphase backends (ops/narrow_lanes.py): lane-major XLA vs fused Pallas
    "lanes": dict(narrowphase="lanes"),
    "lanes10": dict(narrowphase="lanes", max_colors=10),
    "npallas": dict(narrowphase="pallas"),
    "npallas10": dict(narrowphase="pallas", max_colors=10),
    # everything fused: Pallas narrowphase + Pallas solver
    "allpallas10": dict(narrowphase="pallas", use_pallas_solver=True, max_colors=10),
    # best-of-each candidate: lane-major XLA narrowphase + fused Pallas solver
    "lanespallas10": dict(narrowphase="lanes", use_pallas_solver=True, max_colors=10),
}

names = sys.argv[1:] or ["incremental", "mis"]

for name in names:
    over = VARIANTS[name]
    w, ids = pyramid_world(SolverType.TGS_SOFT, base_count=BASE)
    kw = dict(
        max_contacts=((4 * len(ids) + 127) // 128) * 128,
        max_colors=16,
        gjk_iters=10,
    )
    kw.update(over)
    state, cfg = w.freeze(**kw)
    vstep = jax.vmap(partial(step, config=cfg), in_axes=(0, None))

    @jax.jit
    def run_block(b):
        def body(s, _):
            return vstep(s, jnp.float32(1 / 60)), None
        out, _ = jax.lax.scan(body, b, None, length=STEPS)
        return out

    batch = replicate_state(state, WORLDS)
    batch = run_block(batch)
    _ = np.asarray(batch.diag.step_id)
    batch = run_block(batch)
    _ = np.asarray(batch.diag.step_id)
    t0 = time.perf_counter()
    batch = run_block(batch)
    _ = np.asarray(batch.bodies.position)
    dt = time.perf_counter() - t0
    wsps = WORLDS * STEPS / dt
    ovf = int(np.asarray(batch.diag.color_overflow).max())
    pen = float(np.asarray(batch.diag.max_penetration).max())
    print(f"{name:>12}: {wsps:8.1f} wsps  ({dt*1000/STEPS:.1f} ms/step, "
          f"color_overflow={ovf}, max_pen={pen:.4f})", flush=True)
