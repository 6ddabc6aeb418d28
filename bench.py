"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North star (BASELINE.md): 4096 vmapped worlds of a 2k-body pyramid at
>= 10k world-steps/sec/chip on TPU v5e. This harness measures batched
world-steps/sec on the largest configuration that fits; env vars override:
  S2_BENCH_WORLDS, S2_BENCH_BASE, S2_BENCH_STEPS, S2_BENCH_SOLVER
"""

import json
import os
import sys
import time


def main():
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from solver2d_tpu.config import SolverType
    from solver2d_tpu.models.contact_scenes import pyramid_world
    from solver2d_tpu.parallel import replicate_state
    from solver2d_tpu.step import step, step_batch

    # Defaults ARE the north-star configuration (BASELINE.md): base-62
    # pyramid (1954 bodies/world) at 512 worlds, host-chunked into 64-world
    # device batches (monolithic >=128-world programs kill the TPU worker),
    # color-bucketed solve. Round-3 bench (128 x 211-body pyramid) remains
    # reachable via S2_BENCH_WORLDS=128 S2_BENCH_BASE=20 S2_BENCH_HOSTCHUNK=0.
    worlds = int(os.environ.get("S2_BENCH_WORLDS", "512"))
    base = int(os.environ.get("S2_BENCH_BASE", "62"))
    steps = int(os.environ.get("S2_BENCH_STEPS", "20"))
    solver = SolverType[os.environ.get("S2_BENCH_SOLVER", "TGS_SOFT")]
    # lanes = lane-major narrowphase, 1.9x faster than the vmapped per-pair
    # kernel on chip with bit-identical manifolds (tests/test_narrow_lanes.py)
    narrow = os.environ.get("S2_BENCH_NARROW", "lanes")  # xla | lanes | pallas
    bucket = int(os.environ.get("S2_BENCH_BUCKET", "896"))  # -1 = auto cap, 0 = dense
    chunk = int(os.environ.get("S2_BENCH_CHUNK", "0"))     # worlds per lax.map chunk
    # worlds per HOST-driven chunk: separate chunk-sized device batches
    # stepped sequentially by ONE jitted chunk-sized run block. This is how
    # the north-star configuration runs: monolithic OR lax.map-chunked
    # programs kill the TPU worker at >=128 / >=256 worlds respectively
    # (exp/chip_r4.log), while host chunking keeps every device allocation at
    # the proven chunk scale.
    hostchunk = int(os.environ.get("S2_BENCH_HOSTCHUNK", "64"))
    # lane-batched solve (solvers/lane_solve.py): shared constraint structure,
    # worlds in lanes — solve row-gather cost stops scaling with the batch.
    # Default ON (measured round 5: 245.9 vs 114.0 wsps at the official
    # 512x1954 configuration, same physics line, overflow 0); S2_BENCH_LANE=0
    # restores the per-world bucketed solve for A/B runs.
    lane = os.environ.get("S2_BENCH_LANE", "1") != "0"

    w, ids = pyramid_world(solver, base_count=base)
    n_bodies = len(ids) + 1
    # pyramid contact count ~= 3 per box; modest headroom
    # max_colors 9: every color is a serialized solve phase; the capacity-
    # aware coloring fits the base-62 pyramid in 9 colors with ovf 0 at cap
    # 896 (campaign I: ns64 1056.7 wsps vs 969.7 at colors 10; official 512
    # bench 1097.3 vs 1043.9). colors=8 needs cap 992 and still overflows
    # (ovf 62, pen 0.022 — campaign J): 9 is the floor for this scene.
    # bucket cap 896 = 1.016x the 9-color uniform share (7936/9 = 882): the
    # auto 2x cap made ~half the bucket rows pads, and the flattened [cap*W]
    # solve math pays for pads (campaign F: cap 1592 -> 896 nearly halved
    # step time; campaign I: 832/800 at colors 10 overflow — don't tighten).
    state, cfg = w.freeze(
        max_contacts=((4 * len(ids) + 127) // 128) * 128,
        max_colors=int(os.environ.get("S2_BENCH_COLORS", "9")),
        gjk_iters=10,
        narrowphase=narrow,
        contact_bucket_cap=bucket,
        # the pyramid has zero joints; skip the empty joint table's
        # joint_max_colors serialized solve phases per sweep (see
        # config.solve_joints — the reference costs nothing for zero joints).
        # Measured on chip (campaign H): 114.0 vs 109.5 wsps at the default
        # 512x1954 configuration. Default ON; ONLY the literal "0" re-enables
        # the empty joint phases for A/B runs (ADVICE r4: any other value —
        # "true", "2" — keeps the default skip rather than inverting it).
        solve_joints=os.environ.get("S2_BENCH_NOJOINTS", "1") == "0",
        lane_solve=lane,
    )

    vstep = partial(step_batch, config=cfg)
    if hostchunk and hostchunk < worlds:
        assert worlds % hostchunk == 0, (worlds, hostchunk)

        @partial(jax.jit, donate_argnums=0)
        def run_chunk(b):
            def body(s, _):
                return vstep(s, jnp.float32(1.0 / 60.0)), None

            out, _ = jax.lax.scan(body, b, None, length=steps)
            return out

        nc = worlds // hostchunk
        chunks = [replicate_state(state, hostchunk) for _ in range(nc)]
        chunks[0] = run_chunk(chunks[0])
        _ = np.asarray(chunks[0].diag.step_id)
        chunks[0] = run_chunk(chunks[0])
        _ = np.asarray(chunks[0].diag.step_id)
        t0 = time.perf_counter()
        for i in range(nc):
            chunks[i] = run_chunk(chunks[i])
        for i in range(nc):
            _ = np.asarray(chunks[i].bodies.position)
        elapsed = time.perf_counter() - t0
        _emit(worlds, base, n_bodies, steps, solver, narrow, cfg, chunk, hostchunk, elapsed)
        return

    if chunk and chunk < worlds:
        # serialize through chunk-sized sub-batches so fused kernels keep a
        # known-good shape (see exp/flagship.py timeblock; CLAUDE.md crash)
        assert worlds % chunk == 0, (worlds, chunk)
        stepf = lambda s, dt: jax.lax.map(lambda sb: vstep(sb, dt), s)
    else:
        stepf = vstep

    # donate the input batch: without donation two full batch copies coexist
    # across the call boundary — at north-star scale that is gigabytes
    @partial(jax.jit, donate_argnums=0)
    def run_block(b):
        def body(s, _):
            return stepf(s, jnp.float32(1.0 / 60.0)), None

        out, _ = jax.lax.scan(body, b, None, length=steps)
        return out

    batch = replicate_state(state, worlds)
    if chunk and chunk < worlds:
        batch = jax.tree_util.tree_map(
            lambda x: x.reshape((worlds // chunk, chunk) + x.shape[1:]), batch
        )

    # Warm up TWICE with chained (output->input) calls: call 1 compiles, call
    # 2 may recompile for the XLA-chosen output layouts; only then is the
    # executable cache stable. Materialize to defeat async dispatch queuing.
    batch = run_block(batch)
    _ = np.asarray(batch.diag.step_id)
    batch = run_block(batch)
    _ = np.asarray(batch.diag.step_id)

    t0 = time.perf_counter()
    batch = run_block(batch)
    _ = np.asarray(batch.bodies.position)  # full materialization barrier
    elapsed = time.perf_counter() - t0

    _emit(worlds, base, n_bodies, steps, solver, narrow, cfg, chunk, 0, elapsed)


def _emit(worlds, base, n_bodies, steps, solver, narrow, cfg, chunk, hostchunk, elapsed):
    world_steps_per_sec = worlds * steps / elapsed
    target = 10000.0
    print(
        json.dumps(
            {
                "metric": f"world-steps/sec, {worlds} worlds x {n_bodies}-body pyramid ({solver.name})",
                "value": round(world_steps_per_sec, 1),
                "unit": "world-steps/sec",
                "vs_baseline": round(world_steps_per_sec / target, 4),
                # pin the exact config so a future env-var change can't
                # silently move the goalposts (VERDICT r2 weak #8)
                "config": {
                    "worlds": worlds,
                    "base": base,
                    "bodies": n_bodies,
                    "steps": steps,
                    "solver": solver.name,
                    "narrowphase": narrow,
                    "max_colors": cfg.max_colors,
                    "gjk_iters": cfg.gjk_iters,
                    "pallas_solver": cfg.use_pallas_solver,
                    "bucket_cap": cfg.contact_bucket_cap,
                    "solve_joints": cfg.solve_joints,
                    "lane_solve": cfg.lane_solve,
                    "chunk": chunk,
                    "hostchunk": hostchunk,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
