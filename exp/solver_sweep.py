"""Per-solver throughput sweep (VERDICT r4 #5; BASELINE.md asks for
"steps/sec ... per solver"). One small-scale line per solver so per-solver
perf regressions (e.g. the sticky/jacobi dense-path cost growing invisibly)
are caught each round.

Scale: 64 worlds x 211-body pyramid (the round-3 bench scene) x 20 steps,
lanes narrowphase, bucketed where supported. Writes one JSON line per solver
to stdout and a summary table; exp/chip log captures it.

Usage: python exp/solver_sweep.py [SOLVER ...]   (default: all ten)
Env: S2_SW_WORLDS (64), S2_SW_STEPS (20), S2_SW_BASE (20)
"""

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from solver2d_tpu.config import BUCKETABLE_SOLVERS, SolverType
from solver2d_tpu.models.contact_scenes import pyramid_world
from solver2d_tpu.parallel import replicate_state
from solver2d_tpu.step import step

WORLDS = int(os.environ.get("S2_SW_WORLDS", "64"))
STEPS = int(os.environ.get("S2_SW_STEPS", "20"))
BASE = int(os.environ.get("S2_SW_BASE", "20"))


def bench_solver(solver: SolverType):
    w, ids = pyramid_world(solver, base_count=BASE)
    state, cfg = w.freeze(
        max_contacts=((4 * len(ids) + 127) // 128) * 128,
        max_colors=12,
        gjk_iters=10,
        narrowphase="lanes",
        contact_bucket_cap=-1 if solver in BUCKETABLE_SOLVERS else 0,
        solve_joints=False,
    )
    vstep = jax.vmap(partial(step, config=cfg), in_axes=(0, None))

    @partial(jax.jit, donate_argnums=0)
    def run(b):
        out, _ = jax.lax.scan(
            lambda s, _: (vstep(s, jnp.float32(1 / 60)), None), b, None, length=STEPS
        )
        return out

    batch = replicate_state(state, WORLDS)
    batch = run(batch)
    _ = np.asarray(batch.diag.step_id)
    batch = run(batch)
    _ = np.asarray(batch.diag.step_id)
    t0 = time.perf_counter()
    batch = run(batch)
    _ = np.asarray(batch.bodies.position)
    dt = time.perf_counter() - t0
    wsps = WORLDS * STEPS / dt
    rec = {
        "solver": solver.name,
        "wsps": round(wsps, 1),
        "ms_per_step": round(dt * 1000 / STEPS, 2),
        "pen": round(float(np.max(np.asarray(batch.diag.max_penetration))), 4),
        "color_ovf": int(np.max(np.asarray(batch.diag.color_overflow))),
        "worlds": WORLDS,
        "bodies": len(ids) + 1,
        "bucketed": cfg.contact_bucket_cap > 0,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    names = sys.argv[1:] or [s.name for s in SolverType]
    rows = []
    for name in names:
        try:
            rows.append(bench_solver(SolverType[name]))
        except Exception as e:  # keep sweeping; record the failure
            print(json.dumps({"solver": name, "error": str(e)[:200]}), flush=True)
    print(f"\n{'solver':>15} {'wsps':>8} {'ms/step':>8} {'pen':>7} {'ovf':>4}")
    for r in rows:
        if "error" not in r:
            print(f"{r['solver']:>15} {r['wsps']:>8} {r['ms_per_step']:>8} "
                  f"{r['pen']:>7} {r['color_ovf']:>4}", flush=True)


if __name__ == "__main__":
    main()
