"""Minimal repro ladder for the >=128-world monolithic TPU-worker crash
(VERDICT r4 #4). Known facts (exp/chip_r4.log, CLAUDE.md crash ladder):

  - ns128 monolithic step   -> worker dies ("kernel fault" UNAVAILABLE)
  - ns128 lax.map chunk64   -> runs
  - ns256 lax.map chunk64   -> worker dies
  - ns512 HOST-chunk 64     -> runs, with ALL 8 chunk batches resident
                               (~the same total state bytes as monolithic 512!)

The last line already contradicts a pure "total resident allocation" theory:
host chunking keeps every world's state on device at once and survives. What
differs in the dead configs is the SIZE OF ONE XLA PROGRAM's peak working set
/ its largest fused kernels. This script isolates the axes one at a time;
each subcommand is ONE question (tunnel compiles are expensive):

  alloc G        allocate dead f32 buffers totaling G GiB + run a trivial
                 chained op ladder. If this crashes, allocation size alone
                 kills the worker (theory A).
  deadweight G   hold G GiB of dead buffers while running the PROVEN 64-world
                 monolithic north-star step. If this crashes, resident bytes
                 + the real program interact (theory B).
  mono W         monolithic W-world north-star step (crash shape). Knobs:
                 S2_CR_NARROW (lanes), S2_CR_CONTACTS (0=auto), S2_CR_BROAD
                 (grid|sap). Shrinking max_contacts / swapping broadphase
                 under the same W separates which stage's fused kernel dies.

Usage: python exp/crash_repro.py alloc 4 | deadweight 8 | mono 128
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _trivial_ladder(gib: float):
    """Dead buffers + a chained trivial op; prints ok at each rung."""
    n_buf = 16
    per = int(gib * (1 << 30) / 4 / n_buf)
    bufs = [jnp.ones((per,), jnp.float32) * i for i in range(n_buf)]
    for b in bufs:
        b.block_until_ready()
    print(f"alloc: {gib} GiB resident in {n_buf} buffers", flush=True)

    from functools import partial as _partial

    # donate the input list: without donation the chain double-buffers the
    # whole allocation and >7.8 GiB OOMs on the copy, not on the residency
    @_partial(jax.jit, donate_argnums=0)
    def chain(xs):
        def body(c, _):
            return [x + c[0][0] * 1e-9 for x in c], None
        out, _ = jax.lax.scan(body, xs, None, length=8)
        return out

    out = chain(bufs)
    _ = np.asarray(out[0][:4])
    out = chain(out)
    _ = np.asarray(out[0][:4])
    print(f"alloc {gib} GiB: trivial chained program OK", flush=True)
    return out  # keep resident for callers


def _northstar_state(worlds_hint: int):
    from solver2d_tpu.config import SolverType
    from solver2d_tpu.models.contact_scenes import pyramid_world

    contacts = int(os.environ.get("S2_CR_CONTACTS", "0"))
    w, ids = pyramid_world(SolverType.TGS_SOFT, base_count=62)
    state, cfg = w.freeze(
        max_contacts=contacts or ((4 * len(ids) + 127) // 128) * 128,
        max_colors=12,
        gjk_iters=10,
        narrowphase=os.environ.get("S2_CR_NARROW", "lanes"),
        contact_bucket_cap=-1,
        solve_joints=False,
        broadphase=os.environ.get("S2_CR_BROAD", "grid"),
    )
    print(f"northstar cfg: C={cfg.max_contacts} S={cfg.max_shapes} "
          f"narrow={cfg.narrowphase} broad={cfg.broadphase}", flush=True)
    return state, cfg


def _run_mono(state, cfg, worlds: int, steps: int = 10):
    from solver2d_tpu.parallel import replicate_state
    from solver2d_tpu.step import step

    vstep = jax.vmap(partial(step, config=cfg), in_axes=(0, None))

    @partial(jax.jit, donate_argnums=0)
    def run(b):
        out, _ = jax.lax.scan(
            lambda s, _: (vstep(s, jnp.float32(1 / 60)), None), b, None, length=steps
        )
        return out

    batch = replicate_state(state, worlds)
    t0 = time.perf_counter()
    batch = run(batch)
    _ = np.asarray(batch.diag.step_id)
    print(f"mono {worlds}: first call ok ({time.perf_counter()-t0:.0f}s)", flush=True)
    batch = run(batch)
    _ = np.asarray(batch.diag.step_id)
    t0 = time.perf_counter()
    batch = run(batch)
    _ = np.asarray(batch.bodies.position)
    dt = time.perf_counter() - t0
    print(f"mono {worlds}: OK, {worlds*steps/dt:.1f} wsps", flush=True)


def main():
    which = sys.argv[1]
    if which == "alloc":
        _trivial_ladder(float(sys.argv[2]))
    elif which == "deadweight":
        dead = _trivial_ladder(float(sys.argv[2]))
        state, cfg = _northstar_state(64)
        _run_mono(state, cfg, 64)
        _ = np.asarray(dead[0][:4])  # keep the dead buffers live to the end
    elif which == "mono":
        worlds = int(sys.argv[2])
        state, cfg = _northstar_state(worlds)
        _run_mono(state, cfg, worlds)
    else:
        raise SystemExit(f"unknown subcommand {which}")


if __name__ == "__main__":
    main()
