"""Lane-batched contact solve: shared constraint structure, worlds in lanes.

The per-world solve path pays TPU row-gather cost per (world x row): every
color phase gathers [2*cap] endpoint rows and applies a [B]-row body map, and
vmap flattens worlds into rows, so the solve costs ~rows x W per phase and
dominates the step (~85% at 64 worlds x 1954 bodies, exp/chip_r5.log). TPU
row-gathers cost ~constant per ROW almost independent of row width, so this
module shares ONE index set across the whole batch and puts worlds in the
minor (lane) dimension instead:

    body state     bs   [B, W*8]   (row = one body, all worlds)
    constraints    cons [T*W, ...] (flattened bucket-position-major)
    phase gather   tgather(bs, [2*cap] shared indices) -> [2*cap, W*8]
    phase apply    [B]-row gather from [cap, W*16] per-constraint outputs

Per-phase row counts drop from (2*cap + B) x W to (2*cap + B) x 1; the math
core (`solve_contact_core`) runs unchanged on the flattened [cap*W] layout,
so per-constraint arithmetic is identical to the per-world bucketed path.

Structure (colors, buckets, body map) comes from world 0. A world whose
contact at slot s has diverged from world 0's pair at s is masked out of
that constraint for the step and counted in the per-world mismatch
diagnostic (folded into diag.color_overflow). Lockstep batches — the
`parallel.replicate_state` contract, and the north-star workload — never
diverge: identical worlds take identical broadphase/matching decisions, so
slot tables stay aligned for the whole rollout.

Reference semantics per solver: solve_tgs_soft.c:138-280 (TGS_Soft),
solve_soft_step.c:182-311 (SoftStep), solve_pgs_soft.c:127-242 (PGS_Soft) —
the same scripts as solvers/loops.py, re-scheduled for lane data movement.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CONTACT_HERTZ, SimConfig, SolverType
from ..ops import math2d as m
from ..ops.gather import tgather, tscatter_add, tscatter_set
from . import contact_kernels as ck
from .common import (
    body_const_rows,
    finalize_positions,
    integrate_positions,
    integrate_velocities,
    make_body_map,
    pack_rows,
    prepare_contacts,
    sfori,
    unpack_rows,
)


class LaneStructure(NamedTuple):
    """Shared (world-0) constraint structure for one lane-batched step."""

    bucket: jnp.ndarray       # [T] i32 contact slot per bucket position (-1 pad)
    ia: jnp.ndarray           # [T] i32 endpoint A body (world-0 pairs)
    ib: jnp.ndarray           # [T] i32 endpoint B body
    slot: jnp.ndarray         # [B, K] i32 bucket-global body map (make_body_map)
    winner: jnp.ndarray       # [T] bool constraint owns its map entries
    is_a: jnp.ndarray         # [B, K] bool slot's constraint has this body as A
    ccolor: jnp.ndarray       # [C] i32 world-0 colors (broadcast back to the batch)
    shared_overflow: jnp.ndarray  # [] i32 world-0 color+bucket+winner overflow


class _LaneContacts(NamedTuple):
    """Duck-typed `Contacts` view for prepare_contacts: flattened [T*W] rows
    in bucket-position-major order (row (t, w) = world w at bucket slot t)."""

    body_a: jnp.ndarray
    body_b: jnp.ndarray
    alive: jnp.ndarray
    point_count: jnp.ndarray
    normal: jnp.ndarray
    anchor_a: jnp.ndarray
    anchor_b: jnp.ndarray
    separation: jnp.ndarray
    friction: jnp.ndarray
    normal_impulse: jnp.ndarray
    tangent_impulse: jnp.ndarray


class _LaneBodies(NamedTuple):
    """Duck-typed `Bodies` view for integrate_velocities: [B*W] flattened
    (body-major) constant fields."""

    type: jnp.ndarray
    alive: jnp.ndarray
    mass: jnp.ndarray
    inv_mass: jnp.ndarray
    inv_inertia: jnp.ndarray
    force: jnp.ndarray
    torque: jnp.ndarray
    linear_damping: jnp.ndarray
    angular_damping: jnp.ndarray
    gravity_scale: jnp.ndarray


def _t2(x):
    """[W, N, ...] -> [N, W, ...] (worlds to lanes)."""
    return jnp.moveaxis(x, 0, 1)


def _flat(x, n_rows):
    """[N, W, ...] -> [N*W, ...]."""
    return x.reshape((n_rows,) + x.shape[2:])


def build_lane_structure(contacts, dyn0, config: SimConfig) -> LaneStructure:
    """Color + bucket world 0's contact graph and derive the shared solve
    structure (the lane analog of step.py's coloring block)."""
    from ..ops import coloring

    W = contacts.body_a.shape[0]
    B = config.max_bodies
    cap = config.contact_bucket_cap
    K = config.max_colors

    ba0 = contacts.body_a[0]
    bb0 = contacts.body_b[0]
    touching0 = contacts.alive[0] & (contacts.point_count[0] > 0)
    ccolor, c_ovf = coloring.assign_colors(
        contacts.color[0], ba0, bb0, touching0, dyn0,
        B, K, rounds=config.color_rounds, bucket_cap=cap,
    )
    c_active = touching0 & (ccolor >= 0)
    bucket, ccolor, drop = coloring.build_color_buckets(ccolor, c_active, K, cap)
    bi = jnp.maximum(bucket, 0)
    valid = bucket >= 0
    active_b = tgather(c_active, bi) & valid
    color_b = jnp.repeat(jnp.arange(K, dtype=jnp.int32), cap, total_repeat_length=K * cap)
    ia = tgather(ba0, bi)
    ib = tgather(bb0, bi)
    cmap = make_body_map(ia, ib, color_b, active_b, dyn0, B, K)
    shared_ovf = (c_ovf + drop + (active_b & ~cmap.winner).sum()).astype(jnp.int32)

    # per-body endpoint-A selector, all colors in one gather
    owner_a = tgather(ia, jnp.maximum(cmap.slot, 0).reshape(-1)).reshape(B, K)
    is_a = owner_a == jnp.arange(B, dtype=jnp.int32)[:, None]

    # per-world mismatch counting happens in lane_solve from the permuted
    # match lanes — the same data path the solve itself trusts
    return LaneStructure(
        bucket=bucket, ia=ia, ib=ib, slot=cmap.slot, winner=cmap.winner,
        is_a=is_a, ccolor=ccolor, shared_overflow=shared_ovf,
    )


def _permute_contacts_lane(contacts, struct: LaneStructure, W: int):
    """Gather the per-world contact fields prepare_contacts needs into the
    flattened lane layout with ONE wide-row gather (shared bucket indices;
    all int lanes travel as exact small-float values, no bitcasts)."""
    T = struct.bucket.shape[0]
    f32 = jnp.float32
    packed = jnp.concatenate(
        [
            contacts.body_a.astype(f32)[..., None],          # 1
            contacts.body_b.astype(f32)[..., None],          # 1
            contacts.alive.astype(f32)[..., None],           # 1
            contacts.point_count.astype(f32)[..., None],     # 1
            contacts.normal,                                  # 2
            contacts.anchor_a.reshape(W, -1, 4),              # 4
            contacts.anchor_b.reshape(W, -1, 4),              # 4
            contacts.separation,                              # 2
            contacts.friction[..., None],                     # 1
            contacts.normal_impulse,                          # 2
            contacts.tangent_impulse,                         # 2
        ],
        axis=-1,
    )  # [W, C, 21]
    L = packed.shape[-1]
    wide = _t2(packed).reshape(-1, W * L)  # [C, W*L]
    rows = tgather(wide, jnp.maximum(struct.bucket, 0)).reshape(T, W, L)
    valid = (struct.bucket >= 0)[:, None]

    ba = rows[..., 0].astype(jnp.int32)
    bb = rows[..., 1].astype(jnp.int32)
    # a lane is live only where the world's pair matches the shared structure
    match = valid & (ba == struct.ia[:, None]) & (bb == struct.ib[:, None])
    alive = (rows[..., 2] > 0.5) & match
    # per-world count of touching lanes the shared structure covers; a
    # world's mismatch = its touching total - covered (computed by caller)
    covered = (
        ((rows[..., 2] > 0.5) & (rows[..., 3] > 0.5) & match).sum(axis=0).astype(jnp.int32)
    )
    n = T * W
    return covered, _LaneContacts(
        body_a=_flat(jnp.broadcast_to(struct.ia[:, None], (T, W)), n),
        body_b=_flat(jnp.broadcast_to(struct.ib[:, None], (T, W)), n),
        alive=_flat(alive, n),
        point_count=_flat(rows[..., 3].astype(jnp.int32), n),
        normal=_flat(rows[..., 4:6], n),
        anchor_a=_flat(rows[..., 6:10].reshape(T, W, 2, 2), n),
        anchor_b=_flat(rows[..., 10:14].reshape(T, W, 2, 2), n),
        separation=_flat(rows[..., 14:16], n),
        friction=_flat(rows[..., 16], n),
        normal_impulse=_flat(rows[..., 17:19], n),
        tangent_impulse=_flat(rows[..., 19:21], n),
    )


def _lane_bodies(bodies) -> _LaneBodies:
    """Flatten the batch's per-body constants to [B*W] (body-major)."""
    B = bodies.type.shape[1]
    W = bodies.type.shape[0]
    n = B * W

    def fl(x):
        return _flat(_t2(x), n)

    return _LaneBodies(
        type=fl(bodies.type), alive=fl(bodies.alive),
        mass=fl(bodies.mass), inv_mass=fl(bodies.inv_mass),
        inv_inertia=fl(bodies.inv_inertia),
        force=fl(bodies.force), torque=fl(bodies.torque),
        linear_damping=fl(bodies.linear_damping),
        angular_damping=fl(bodies.angular_damping),
        gravity_scale=fl(bodies.gravity_scale),
    )


def _gather_endpoint_rows(bs_wide, ia, ib, W):
    """One shared-index wide gather of both endpoints' packed body rows.
    bs_wide: [B, W*8]; returns flattened ([n, 8], [n, 8]) with n = len(ia)*W."""
    T = ia.shape[0]
    rows = tgather(bs_wide, jnp.concatenate([ia, ib])).reshape(2 * T, W, 8)
    return _flat(rows[:T], T * W), _flat(rows[T:], T * W)


def _lane_warm_start(bs_wide, cons, n_imp, t_imp, struct: LaneStructure, W,
                     fixed_anchors: bool):
    """Lane warm start: P math on the flattened rows, applied with one
    shared-index wide scatter-add (reference: src/solve_common.c:276-326)."""
    if fixed_anchors:
        rA, rB = cons.r_a0, cons.r_b0
    else:
        ra, rb = _gather_endpoint_rows(bs_wide, struct.ia, struct.ib, W)
        _, _, _, qA = unpack_rows(ra)
        _, _, _, qB = unpack_rows(rb)
        rA = m.rotate(qA[:, None, :], cons.local_anchor_a)
        rB = m.rotate(qB[:, None, :], cons.local_anchor_b)

    tangent = m.right_perp(cons.normal)
    P = n_imp[..., None] * cons.normal[:, None, :] + t_imp[..., None] * tangent[:, None, :]
    P = jnp.where(cons.pmask[..., None], P, 0.0)
    P_tot = P.sum(axis=1)
    torque_a = m.cross(rA, P).sum(axis=1)
    torque_b = m.cross(rB, P).sum(axis=1)

    z2 = jnp.zeros_like(P_tot)
    z1 = jnp.zeros_like(torque_a[:, None])
    dA = jnp.concatenate(
        [-cons.inv_mass_a[:, None] * P_tot, (-cons.inv_i_a * torque_a)[:, None], z2, z2, z1], axis=-1
    )
    dB = jnp.concatenate(
        [cons.inv_mass_b[:, None] * P_tot, (cons.inv_i_b * torque_b)[:, None], z2, z2, z1], axis=-1
    )
    T = struct.ia.shape[0]
    deltas = jnp.concatenate(
        [dA.reshape(T, W * 8), dB.reshape(T, W * 8)], axis=0
    )
    return tscatter_add(bs_wide, jnp.concatenate([struct.ia, struct.ib]), deltas)


def _lane_gs_sweep(carry, cons, struct: LaneStructure, cfg: SimConfig, W,
                   mode, inv_h, use_bias):
    """One full colored Gauss-Seidel sweep (all colors) in lane layout."""
    bs_wide, n_imp, t_imp = carry
    cap = cfg.contact_bucket_cap
    B = cfg.max_bodies

    for k in range(cfg.max_colors):
        o = k * cap
        nw = o * W
        sl = slice(nw, nw + cap * W)
        cons_k = type(cons)(*(x[sl] for x in cons))
        n_k = n_imp[sl]
        t_k = t_imp[sl]
        ia_k = struct.ia[o:o + cap]
        ib_k = struct.ib[o:o + cap]

        ra, rb = _gather_endpoint_rows(bs_wide, ia_k, ib_k, W)
        vA, wA, dcA, qA = unpack_rows(ra)
        vB, wB, dcB, qB = unpack_rows(rb)
        vA2, wA2, vB2, wB2, n2, t2 = ck.solve_contact_core(
            cons_k, vA, wA, vB, wB, qA, qB, dcA, dcB, n_k, t_k, mode, inv_h, use_bias
        )

        # apply: one [B]-row wide gather over this color's outputs. Lane
        # layout must interleave PER WORLD ([A(w) 8 | B(w) 8] x W), because
        # the [B, W, 16] unpack below slices 16 consecutive lanes per world.
        outA = pack_rows(vA2, wA2, dcA, qA).reshape(cap, W, 8)
        outB = pack_rows(vB2, wB2, dcB, qB).reshape(cap, W, 8)
        pool = jnp.concatenate([outA, outB], axis=-1).reshape(cap, W * 16)
        slot_g = struct.slot[:, k]
        local = jnp.where(slot_g >= 0, slot_g - o, 0)
        got = tgather(pool, local).reshape(B, W, 16)
        sel = jnp.where(struct.is_a[:, k, None, None], got[:, :, :8], got[:, :, 8:])
        bs3 = bs_wide.reshape(B, W, 8)
        bs_wide = jnp.where((slot_g >= 0)[:, None, None], sel, bs3).reshape(B, W * 8)

        upd = cons_k.active & jnp.repeat(struct.winner[o:o + cap], W)
        n_imp = n_imp.at[sl].set(jnp.where(upd[:, None], n2, n_k))
        t_imp = t_imp.at[sl].set(jnp.where(upd[:, None], t2, t_k))
    return bs_wide, n_imp, t_imp


def _store_impulses_lane(contacts, cons, struct: LaneStructure, n_imp, t_imp, W):
    """Scatter lane impulses back to the per-world tables with one
    shared-index wide scatter (bucketed analog of store_impulses)."""
    import dataclasses

    T = struct.bucket.shape[0]
    C = contacts.normal_impulse.shape[1]
    pm = cons.pmask.astype(jnp.float32)  # [T*W, 2]
    rows = jnp.concatenate(
        [n_imp.reshape(T, W, 2), t_imp.reshape(T, W, 2), pm.reshape(T, W, 2)], axis=-1
    ).reshape(T, W * 6)
    out = tscatter_set(
        jnp.zeros((C + 1, W * 6), jnp.float32),
        jnp.where(struct.bucket >= 0, struct.bucket, C),
        rows,
    )[:C].reshape(C, W, 6)
    out = _t2(out)  # [W, C, 6]
    keep = out[..., 4:6] > 0.5
    return dataclasses.replace(
        contacts,
        normal_impulse=jnp.where(keep, out[..., 0:2], contacts.normal_impulse),
        tangent_impulse=jnp.where(keep, out[..., 2:4], contacts.tangent_impulse),
    )


def lane_solve(bodies, contacts, struct: LaneStructure, gravity, dt, cfg: SimConfig):
    """Dispatch the lane-batched solver script for cfg.solver.

    bodies/contacts are the [W, ...] batch; gravity is world 0's (lockstep
    batches share it). Returns (bodies', contacts', mismatch [W]) where
    mismatch counts each world's touching contacts the shared structure did
    not cover (0 on lockstep batches)."""
    W, B = bodies.type.shape
    lc = _lane_bodies(bodies)
    nrows = B * W

    # packed body state, lane layout
    v = _flat(_t2(bodies.v), nrows)
    w = _flat(_t2(bodies.w), nrows)
    dp = _flat(_t2(bodies.delta_pos), nrows)
    rot = _flat(_t2(bodies.rot), nrows)
    bs = jnp.concatenate([v, w[:, None], dp, rot, jnp.zeros_like(w[:, None])], axis=-1)
    bs_wide = bs.reshape(B, W * 8)

    # prepared constraints, lane layout (shared-index wide gathers)
    if cfg.solver in (SolverType.TGS_SOFT, SolverType.SOFT_STEP):
        h = dt / cfg.iterations
        inv_h = jnp.where(dt > 0, cfg.iterations / jnp.where(dt > 0, dt, 1.0), 0.0)
        hertz = jnp.minimum(CONTACT_HERTZ, 0.25 * inv_h)
    else:  # PGS_SOFT
        h = dt
        inv_h = jnp.where(dt > 0, 1.0 / jnp.where(dt > 0, dt, 1.0), 0.0)
        hertz = jnp.minimum(CONTACT_HERTZ, 0.333 * inv_h)

    covered, lcon = _permute_contacts_lane(contacts, struct, W)
    touching_total = (contacts.alive & (contacts.point_count > 0)).sum(axis=1).astype(jnp.int32)
    mismatch = touching_total - covered
    # endpoint body-constant rows with one shared-index wide gather
    bconst = jnp.concatenate(
        [
            bodies.inv_mass[..., None], bodies.inv_inertia[..., None],
            bodies.rot, bodies.local_center,
        ],
        axis=-1,
    )  # [W, B, 6]
    bw = _t2(bconst).reshape(B, W * 6)
    T = struct.bucket.shape[0]
    brows = tgather(bw, jnp.concatenate([struct.ia, struct.ib])).reshape(2 * T, W, 6)
    ra = _flat(brows[:T], T * W)
    rb = _flat(brows[T:], T * W)

    cons, n_imp, t_imp = prepare_contacts(
        None, lcon, h=h, hertz=hertz, soft=True, warm_start=cfg.warm_start,
        body_rows=(ra, rb),
    )

    mode = {
        SolverType.TGS_SOFT: ck.TGS_SOFT,
        SolverType.SOFT_STEP: ck.SOFT_STEP,
        SolverType.PGS_SOFT: ck.PGS_SOFT,
    }[cfg.solver]
    fixed_warm = cfg.solver == SolverType.SOFT_STEP
    g0 = gravity

    def integrate_v(bs_wide):
        b3 = bs_wide.reshape(B, W, 8).reshape(nrows, 8)
        v, w = integrate_velocities(lc, b3[:, 0:2], b3[:, 2], g0, h)
        out = jnp.concatenate([v, w[:, None], b3[:, 3:]], axis=-1)
        return out.reshape(B, W * 8)

    def integrate_p(bs_wide):
        b3 = bs_wide.reshape(nrows, 8)
        dp, rot = integrate_positions(
            lc.alive, lc.type, b3[:, 3:5], b3[:, 5:7], b3[:, 0:2], b3[:, 2], h
        )
        out = jnp.concatenate([b3[:, 0:3], dp, rot, b3[:, 7:8]], axis=-1)
        return out.reshape(B, W * 8)

    if cfg.solver in (SolverType.TGS_SOFT, SolverType.SOFT_STEP):
        # substep script (solve_tgs_soft.c:138-280 / solve_soft_step.c:182-311)
        def substep(_, carry):
            bs_wide, n, t = carry
            bs_wide = integrate_v(bs_wide)
            if cfg.warm_start:
                bs_wide = _lane_warm_start(bs_wide, cons, n, t, struct, W, fixed_warm)
            bs_wide, n, t = _lane_gs_sweep((bs_wide, n, t), cons, struct, cfg, W, mode, inv_h, True)
            bs_wide = integrate_p(bs_wide)
            if cfg.extra_iterations > 0:
                bs_wide, n, t = _lane_gs_sweep((bs_wide, n, t), cons, struct, cfg, W, mode, inv_h, False)
            return bs_wide, n, t

        bs_wide, n_imp, t_imp = sfori(cfg.iterations, substep, (bs_wide, n_imp, t_imp))
    else:
        # PGS_Soft script (solve_pgs_soft.c:127-242)
        bs_wide = integrate_v(bs_wide)
        if cfg.warm_start:
            bs_wide = _lane_warm_start(bs_wide, cons, n_imp, t_imp, struct, W, False)

        def it(_, carry):
            return _lane_gs_sweep(carry, cons, struct, cfg, W, mode, inv_h, True)

        bs_wide, n_imp, t_imp = sfori(cfg.iterations, it, (bs_wide, n_imp, t_imp))
        bs_wide = integrate_p(bs_wide)

        def relax(_, carry):
            return _lane_gs_sweep(carry, cons, struct, cfg, W, mode, inv_h, False)

        bs_wide, n_imp, t_imp = sfori(cfg.extra_iterations, relax, (bs_wide, n_imp, t_imp))

    # back to per-world layout + finalize (elementwise, vmapped)
    b3 = bs_wide.reshape(B, W, 8)
    vw = jnp.moveaxis(b3, 1, 0)  # [W, B, 8]
    new_bodies = jax.vmap(finalize_positions)(
        bodies, vw[..., 3:5], vw[..., 5:7], vw[..., 0:2], vw[..., 2]
    )
    contacts = _store_impulses_lane(contacts, cons, struct, n_imp, t_imp, W)
    return new_bodies, contacts, mismatch
