"""Tracing / profiling.

TPU analog of the reference's frame-time overlay and counters
(reference: samples/main.cpp:720-832, include/solver2d/timer.h): wall-clock
step timing with compile-time separation, per-stage breakdown via jitted
sub-functions, and `jax.profiler` trace capture for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


@dataclasses.dataclass
class StepTimer:
    """Tracks steps/sec with the first (compile) call excluded."""

    compile_s: float = 0.0
    total_s: float = 0.0
    steps: int = 0

    def timed(self, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        if self.steps == 0:
            self.compile_s = dt
        else:
            self.total_s += dt
        self.steps += 1
        return out

    @property
    def ms_per_step(self) -> float:
        return 1e3 * self.total_s / max(self.steps - 1, 1)

    @property
    def steps_per_sec(self) -> float:
        return max(self.steps - 1, 1) / max(self.total_s, 1e-12)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/s2tpu_trace"):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def stage_times(state, config, dt=1.0 / 60.0, repeats: int = 10):
    """Per-stage wall-clock breakdown of one step (each stage jitted
    separately; the fused step is faster — this is for diagnosis only)."""
    import jax.numpy as jnp

    from .. import step as step_mod
    from ..ops import broadphase, coloring

    shapes = state.shapes
    bodies = state.bodies

    results = {}

    def bench(name, f, *args):
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = f(*args)
        jax.block_until_ready(out)
        results[name] = 1e3 * (time.perf_counter() - t0) / repeats
        return out

    jointed = broadphase.jointed_body_keys(state.joints, config)
    pairs = bench(
        "broadphase",
        jax.jit(lambda s, j: broadphase.find_pairs(s, bodies.type, j, config)),
        shapes, jointed,
    )
    contacts = broadphase.match_contacts(state.contacts, pairs, shapes, bodies.type, shapes.body)
    contacts = bench("narrowphase", jax.jit(lambda st, c: step_mod.update_manifolds(st, c)), state, contacts)
    dyn = (bodies.type == 2) & bodies.alive
    touching = contacts.alive & (contacts.point_count > 0)
    bench(
        "coloring",
        jax.jit(lambda ba, bb, t: coloring.color_graph(ba, bb, t, dyn, config.max_bodies, config.max_colors)),
        contacts.body_a, contacts.body_b, touching,
    )
    bench("full_step", jax.jit(lambda s: step_mod.step(s, dt, config)), state)
    return results
