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
from solver2d_tpu.step import step, step_batch

STEPS = int(os.environ.get("S2_FS_STEPS", "30"))
NARROW = os.environ.get("S2_FS_NARROW", "xla")


def timeblock(name, state, cfg, worlds=1, steps=STEPS, chunk=0):
    if worlds > 1:
        vstep = partial(step_batch, config=cfg)
        state = replicate_state(state, worlds)
        if chunk and chunk < worlds:
            # Chunked stepping: lax.map serializes the batch through
            # chunk-sized sub-batches, so every fused kernel keeps the
            # known-good chunk shape (the >=128-world monolithic program
            # kills the TPU worker, CLAUDE.md) and step temporaries are
            # amortized across chunks instead of scaling with the batch.
            assert worlds % chunk == 0, (worlds, chunk)
            nc = worlds // chunk
            state = jax.tree_util.tree_map(
                lambda x: x.reshape((nc, chunk) + x.shape[1:]), state
            )
            f = lambda s, dt: jax.lax.map(lambda sb: vstep(sb, dt), s)
        else:
            f = vstep
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
        contact_bucket_cap=int(os.environ.get("S2_FS_BUCKET", "0")),  # -1 auto
        solve_joints=os.environ.get("S2_FS_NOJOINTS", "0") != "1",
    )
    print(f"pyramid100: bodies={len(ids)+1} S={cfg.max_shapes} C={cfg.max_contacts} "
          f"colors={cfg.max_colors} cell={cfg.grid_cell:.2f} big={cfg.max_big_shapes}", flush=True)
    out = timeblock("pyramid100", state, cfg)
    ys = np.asarray(out.bodies.position)[np.array(ids), 1]
    print(f"pyramid100: min box y = {ys.min():.3f} (ground at 0)", flush=True)


def jointgrid():
    scene = joint_grid(SolverType.TGS_SOFT, numk=100, numi=100)
    state, cfg = scene.freeze(
        narrowphase=NARROW,
        joint_bucket_cap=int(os.environ.get("S2_FS_JBUCKET", "0")),  # -1 auto
        contact_bucket_cap=int(os.environ.get("S2_FS_BUCKET", "0")),
        # the grid's joint graph is 4-edge-colorable (Konig); default 8
        joint_max_colors=int(os.environ.get("S2_FS_JCOLORS", "8")),
        # the scene is contact-free (jointed-pair filtering drops every
        # candidate): S2_FS_NOCONTACTS=1 statically skips the empty contact
        # phases (config.solve_contacts)
        solve_contacts=os.environ.get("S2_FS_NOCONTACTS", "0") != "1",
    )
    print(f"jointgrid: bodies={int(np.asarray(state.bodies.alive).sum())} "
          f"joints={int(np.asarray(state.joints.alive).sum())} jcolors={cfg.joint_max_colors}", flush=True)
    out = timeblock("jointgrid", state, cfg)
    from solver2d_tpu.utils.metrics import joint_error

    print(f"jointgrid: joint_error={float(joint_error(out)):.4f}", flush=True)


def timeblock_hostchunk(name, state, cfg, worlds, chunk, steps=STEPS):
    """Host-driven chunking: `worlds/chunk` SEPARATE chunk-sized device
    batches stepped sequentially by one jitted chunk-sized run block.

    Device-side chunking (lax.map) still kills the TPU worker at >=256
    worlds (total-buffer-size triggered, exp/chip_r4.log); host chunking
    keeps every device allocation at the proven 64-world scale and reuses
    the already-compiled chunk program."""
    assert worlds % chunk == 0
    nc = worlds // chunk
    vstep = partial(step_batch, config=cfg)

    @partial(jax.jit, donate_argnums=0)
    def run(b):
        out, _ = jax.lax.scan(lambda s, _: (vstep(s, jnp.float32(1 / 60)), None), b, None, length=steps)
        return out

    chunks = [replicate_state(state, chunk) for _ in range(nc)]
    # warm up twice on chunk 0 (compile + output-layout recompile)
    chunks[0] = run(chunks[0])
    _ = np.asarray(chunks[0].diag.step_id)
    chunks[0] = run(chunks[0])
    _ = np.asarray(chunks[0].diag.step_id)

    t0 = time.perf_counter()
    for i in range(nc):
        chunks[i] = run(chunks[i])
    for i in range(nc):
        _ = np.asarray(chunks[i].diag.step_id)
    dt = time.perf_counter() - t0
    wsps = worlds * steps / dt
    pos = np.asarray(chunks[-1].bodies.position)
    print(
        f"{name}: {dt*1000/steps:.1f} ms/step/batch ({nc} host chunks x {chunk}), "
        f"{wsps:.1f} world-steps/s | finite={np.isfinite(pos).all()} "
        f"pen={float(np.max(np.asarray(chunks[-1].diag.max_penetration))):.4f} "
        f"color_ovf={int(np.max(np.asarray(chunks[-1].diag.color_overflow)))}",
        flush=True,
    )


def northstar():
    worlds = int(os.environ.get("S2_FS_WORLDS", "4096"))
    hostchunk = int(os.environ.get("S2_FS_HOSTCHUNK", "0"))
    chunk = int(os.environ.get("S2_FS_CHUNK", "0"))
    bucket = int(os.environ.get("S2_FS_BUCKET", "0"))  # -1 = auto cap
    lane = os.environ.get("S2_FS_LANE", "0") == "1"
    w, ids = pyramid_world(SolverType.TGS_SOFT, base_count=62)  # 1953 boxes
    state, cfg = w.freeze(
        max_contacts=((4 * len(ids) + 127) // 128) * 128, gjk_iters=10, narrowphase=NARROW,
        max_colors=int(os.environ.get("S2_FS_COLORS", "12")),
        contact_bucket_cap=bucket if not lane else (bucket or -1),
        # S2_FS_NOJOINTS=1: statically skip the empty joint table's
        # joint_max_colors serialized phases per sweep (config.solve_joints)
        solve_joints=os.environ.get("S2_FS_NOJOINTS", "0") != "1",
        lane_solve=lane,
    )
    print(f"northstar: {worlds} worlds x {len(ids)+1} bodies, C={cfg.max_contacts} "
          f"S={cfg.max_shapes} colors={cfg.max_colors} bucket={cfg.contact_bucket_cap} "
          f"chunk={chunk} hostchunk={hostchunk} joints={cfg.solve_joints}", flush=True)
    if hostchunk:
        timeblock_hostchunk("northstar", state, cfg, worlds, hostchunk)
    else:
        timeblock("northstar", state, cfg, worlds=worlds, chunk=chunk)


if __name__ == "__main__":
    which = sys.argv[1:] or ["pyramid100"]
    for name in which:
        dict(pyramid100=pyramid100, jointgrid=jointgrid, northstar=northstar)[name]()
