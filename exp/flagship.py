"""On-chip flagship workloads (VERDICT r1 #1/#4): actually simulate the
reference's headline scenes and record throughput.

  pyramid100  — Pyramid base 100 (5,050 boxes + ground), 1 world
                (reference: samples/collection/sample_contact.cpp:527-531)
  jointgrid   — Joint Grid 100x100 (~19.8k revolute joints), 1 world
                (reference: samples/collection/sample_joints.cpp:365-457)
  northstar   — 4096 worlds x base-62 pyramid (~2k bodies/world)
                (BASELINE.md; scale worlds down via S2_FS_WORLDS if OOM)

Usage: python exp/flagship.py [pyramid100|jointgrid|northstar] ...
Env: S2_FS_STEPS (30), S2_FS_WORLDS (northstar worlds, 4096), S2_FS_NARROW.
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
from solver2d_tpu.models.joint_scenes import joint_grid
from solver2d_tpu.parallel import replicate_state
from solver2d_tpu.step import step

STEPS = int(os.environ.get("S2_FS_STEPS", "30"))
NARROW = os.environ.get("S2_FS_NARROW", "xla")


def timeblock(name, state, cfg, worlds=1, steps=STEPS):
    if worlds > 1:
        f = jax.vmap(partial(step, config=cfg), in_axes=(0, None))
        state = replicate_state(state, worlds)
    else:
        f = partial(step, config=cfg)

    # donated input: without this two full batch copies coexist across the
    # call boundary (gigabytes at north-star scale)
    @partial(jax.jit, donate_argnums=0)
    def run(b):
        out, _ = jax.lax.scan(lambda s, _: (f(s, jnp.float32(1 / 60)), None), b, None, length=steps)
        return out

    t0 = time.perf_counter()
    state = run(state)
    _ = np.asarray(state.diag.step_id)
    print(f"{name}: first call (compile+run) {time.perf_counter()-t0:.1f}s", flush=True)
    state = run(state)
    _ = np.asarray(state.diag.step_id)
    t0 = time.perf_counter()
    state = run(state)
    _ = np.asarray(state.bodies.position)
    dt = time.perf_counter() - t0
    wsps = worlds * steps / dt
    pos = np.asarray(state.bodies.position)
    print(
        f"{name}: {dt*1000/steps:.1f} ms/step/batch, {wsps:.1f} world-steps/s | "
        f"finite={np.isfinite(pos).all()} pen={float(np.max(np.asarray(state.diag.max_penetration))):.4f} "
        f"pair_ovf={np.asarray(state.diag.pair_overflow).any()} "
        f"color_ovf={int(np.max(np.asarray(state.diag.color_overflow)))} "
        f"pairs={int(np.max(np.asarray(state.diag.pair_count)))} "
        f"contacts={int(np.max(np.asarray(state.diag.contact_count)))}",
        flush=True,
    )
    return state


def pyramid100():
    w, ids = pyramid_world(SolverType.TGS_SOFT, base_count=100)
    # colors: the tall pyramid's contact graph needs ~10; 12 adds margin
    # (8 measured color_ovf=80 on chip — skipped constraints)
    state, cfg = w.freeze(
        max_contacts=4 * 5056, gjk_iters=10, narrowphase=NARROW,
        max_colors=int(os.environ.get("S2_FS_COLORS", "12")),
    )
    print(f"pyramid100: bodies={len(ids)+1} S={cfg.max_shapes} C={cfg.max_contacts} "
          f"colors={cfg.max_colors} cell={cfg.grid_cell:.2f} big={cfg.max_big_shapes}", flush=True)
    out = timeblock("pyramid100", state, cfg)
    ys = np.asarray(out.bodies.position)[np.array(ids), 1]
    print(f"pyramid100: min box y = {ys.min():.3f} (ground at 0)", flush=True)


def jointgrid():
    scene = joint_grid(SolverType.TGS_SOFT, numk=100, numi=100)
    state, cfg = scene.freeze(narrowphase=NARROW)
    print(f"jointgrid: bodies={int(np.asarray(state.bodies.alive).sum())} "
          f"joints={int(np.asarray(state.joints.alive).sum())} jcolors={cfg.joint_max_colors}", flush=True)
    out = timeblock("jointgrid", state, cfg)
    from solver2d_tpu.utils.metrics import joint_error

    print(f"jointgrid: joint_error={float(joint_error(out)):.4f}", flush=True)


def northstar():
    worlds = int(os.environ.get("S2_FS_WORLDS", "4096"))
    w, ids = pyramid_world(SolverType.TGS_SOFT, base_count=62)  # 1953 boxes
    state, cfg = w.freeze(
        max_contacts=((4 * len(ids) + 127) // 128) * 128, gjk_iters=10, narrowphase=NARROW,
        max_colors=int(os.environ.get("S2_FS_COLORS", "12")),
    )
    print(f"northstar: {worlds} worlds x {len(ids)+1} bodies, C={cfg.max_contacts} "
          f"S={cfg.max_shapes} colors={cfg.max_colors}", flush=True)
    timeblock("northstar", state, cfg, worlds=worlds)


if __name__ == "__main__":
    which = sys.argv[1:] or ["pyramid100"]
    for name in which:
        dict(pyramid100=pyramid100, jointgrid=jointgrid, northstar=northstar)[name]()
