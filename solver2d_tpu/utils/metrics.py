"""Statistics and observability (analog of s2Statistics,
reference: include/solver2d/timer.h:8-17, src/world.c:565-579, plus
physics-health metrics used by the scene parity tests)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..state import State


@dataclasses.dataclass
class Statistics:
    body_count: int
    shape_count: int
    contact_count: int
    joint_count: int
    pair_count: int
    max_penetration: float
    kinetic_energy: float
    color_overflow: int
    pair_overflow: bool
    step_id: int
    # Capacity utilization — the SoA analog of the reference's proxy count /
    # stack high-water counters (reference: include/solver2d/timer.h:8-17):
    # fixed-capacity tables make "fraction of capacity used" the meaningful
    # headroom metric (tree height / allocator high-water are N/A by design).
    body_capacity: int = 0
    shape_capacity: int = 0
    contact_capacity: int = 0
    joint_capacity: int = 0

    @property
    def utilization(self) -> dict:
        """used/capacity per table (contact uses pair_count: the peak demand
        on the table this step, which is what overflows it)."""
        def frac(used, cap):
            return used / cap if cap else 0.0

        return {
            "bodies": frac(self.body_count, self.body_capacity),
            "shapes": frac(self.shape_count, self.shape_capacity),
            "contacts": frac(self.pair_count, self.contact_capacity),
            "joints": frac(self.joint_count, self.joint_capacity),
        }


def statistics(state: State) -> Statistics:
    """Host-side pull of the per-step counters (one device_get)."""
    b = state.bodies
    ke = kinetic_energy(state)
    return Statistics(
        body_count=int(b.alive.sum()),
        shape_count=int(state.shapes.alive.sum()),
        contact_count=int(state.diag.contact_count),
        joint_count=int(state.joints.alive.sum()),
        pair_count=int(state.diag.pair_count),
        max_penetration=float(state.diag.max_penetration),
        kinetic_energy=float(ke),
        color_overflow=int(state.diag.color_overflow),
        pair_overflow=bool(state.diag.pair_overflow),
        step_id=int(state.diag.step_id),
        body_capacity=int(b.alive.shape[0]),
        shape_capacity=int(state.shapes.alive.shape[0]),
        contact_capacity=int(state.contacts.key.shape[0]),
        joint_capacity=int(state.joints.alive.shape[0]),
    )


def kinetic_energy(state: State):
    """Total KE (jittable) — the energy-gain metric for relax-pass parity."""
    b = state.bodies
    dyn = (b.type == 2) & b.alive
    lin = 0.5 * b.mass * (b.v**2).sum(-1)
    ang = 0.5 * b.inertia * b.w**2
    return jnp.where(dyn, lin + ang, 0.0).sum()


def max_penetration(state: State):
    return state.diag.max_penetration


@dataclasses.dataclass
class GJKStats:
    """Analog of the S2_GJK_DEBUG counters (reference: src/distance.c:480-482,
    :572-574, :597-599): calls, total support iterations, max iterations per
    call — plus warm-cache hit count. Debug-only instrumentation like the
    reference's (computed on demand, never in the hot step path); use it to
    tune SimConfig.gjk_iters by data instead of blind."""

    calls: int        # live pairs evaluated (s2_gjkCalls)
    iters: int        # total support iterations (s2_gjkIters)
    max_iters: int    # worst pair (s2_gjkMaxIters)
    cache_hits: int   # pairs entering with a warm simplex cache


def gjk_stats(state: State, gjk_iters: int = 20, cold: bool = False) -> GJKStats:
    """Re-run GJK over the live contact table with the same inputs the
    narrowphase uses (step.update_manifolds) and count convergence.

    Like the reference counters, `iterations` counts support-point trips
    BEYOND the warm-started simplex (distance.c:572-599): a settled resting
    contact whose cached simplex already brackets the origin reports 0.
    Pass cold=True to zero the caches and measure the from-scratch
    convergence budget — the number that tunes SimConfig.gjk_iters."""
    import jax

    from ..ops import distance as gjk_mod
    from ..ops import math2d as m
    from ..ops.gather import tgather

    shapes, bodies, con = state.shapes, state.bodies, state.contacts
    sa, sb = con.shape_a, con.shape_b

    va, vb = tgather(shapes.verts, sa), tgather(shapes.verts, sb)
    ca, cb = tgather(shapes.count, sa), tgather(shapes.count, sb)
    pa = tgather(bodies.origin, con.body_a)
    qa = tgather(bodies.rot, con.body_a)
    pb = tgather(bodies.origin, con.body_b)
    qb = tgather(bodies.rot, con.body_b)

    def one(va, ca, vb, cb, pa, qa, pb, qb, cc, cia, cib):
        xp, xq = m.inv_mul_transforms(pa, qa, pb, qb)
        vb_l = xp[None, :] + m.rotate(xq[None, :], vb)
        out = gjk_mod.gjk(va, ca, vb_l, cb, cc, cia, cib, max_iters=gjk_iters)
        return out.iterations

    cache_count = jnp.zeros_like(con.cache_count) if cold else con.cache_count
    iters = jax.vmap(one)(
        va, ca, vb, cb, pa, qa, pb, qb,
        cache_count, con.cache_index_a, con.cache_index_b,
    )
    live = con.alive
    iters = jnp.where(live, iters, 0)
    return GJKStats(
        calls=int(live.sum()),
        iters=int(iters.sum()),
        max_iters=int(iters.max()),
        cache_hits=int((live & (cache_count > 0)).sum()),
    )


def joint_error(state: State):
    """Max point-to-point joint separation (jittable) — the joint-stretch
    metric for Joint Grid / Bridge parity envelopes."""
    from ..ops import math2d as m

    j = state.joints
    b = state.bodies
    ia, ib = j.body_a, j.body_b
    pa = b.origin[ia] + m.rotate(b.rot[ia], j.local_anchor_a)
    pb = b.origin[ib] + m.rotate(b.rot[ib], j.local_anchor_b)
    err = jnp.linalg.norm(pb - pa, axis=-1)
    rev = j.alive & (j.type == 0)
    return jnp.where(rev, err, 0.0).max()
