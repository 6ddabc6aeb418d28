"""Shared solver kernels: integration, constraint preparation, warm starting,
NGS position correction, impulse storage.

Functional re-derivation of reference: src/solve_common.c. Sequential
Gauss-Seidel sweeps become graph-colored passes (see ops/coloring.py): a
`fori_loop` over colors where each color's constraints are solved in parallel
with disjoint scatter-writes — within a color this is bitwise-equivalent to a
sequential sweep in some order.

Body state during solving is the tuple BS = (v, w, delta_pos, rot); contact
constraint data is the immutable `ContactCons`; accumulated impulses are the
mutable `(normal_impulse, tangent_impulse)` pair threaded through loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    BAUMGARTE,
    CONTACT_ZETA,
    LINEAR_SLOP,
    MAX_BAUMGARTE_VELOCITY,
    MAX_LINEAR_CORRECTION,
    PI,
)
from ..ops import math2d as m
from ..ops.gather import tgather, tscatter_add
from ..state import Bodies, Contacts


# ---------------------------------------------------------------- integration

def integrate_velocities(bodies: Bodies, v_in, w_in, gravity, h):
    """reference: src/solve_common.c:10-45. Uses bodies only for constant
    fields (mass, damping, forces); velocities come from the loop carry."""
    dyn = (bodies.type == 2) & bodies.alive
    mg = bodies.mass[:, None] * bodies.gravity_scale[:, None] * gravity[None, :]
    v = v_in + (h * bodies.inv_mass)[:, None] * (bodies.force + mg)
    w = w_in + h * bodies.inv_inertia * bodies.torque
    v = v / (1.0 + h * bodies.linear_damping)[:, None]
    w = w / (1.0 + h * bodies.angular_damping)
    v = jnp.where(dyn[:, None], v, v_in)
    w = jnp.where(dyn, w, w_in)
    return v, w


def integrate_positions(bodies_alive, bodies_type, delta_pos, rot, v, w, h):
    """reference: src/solve_common.c:47-68 (non-static bodies)"""
    moving = bodies_alive & (bodies_type != 0)
    dp = jnp.where(moving[:, None], delta_pos + h * v, delta_pos)
    new_rot = m.integrate_rot(rot, h * w)
    r = jnp.where(moving[:, None], new_rot, rot)
    return dp, r


def finalize_positions(bodies: Bodies, delta_pos, rot, v, w) -> Bodies:
    """position += delta; recompute origin; clear forces
    (reference: src/solve_common.c:70-91, src/world.c:260-301)."""
    moving = bodies.alive & (bodies.type != 0)
    position = jnp.where(moving[:, None], bodies.position + delta_pos, bodies.position)
    origin = jnp.where(
        moving[:, None], position - m.rotate(rot, bodies.local_center), bodies.origin
    )
    return Bodies(
        type=bodies.type,
        origin=origin,
        position=position,
        delta_pos=jnp.zeros_like(delta_pos),
        delta_pos0=jnp.zeros_like(delta_pos),
        rot=rot,
        rot0=rot,
        local_center=bodies.local_center,
        v=v,
        w=w,
        v0=bodies.v0,
        w0=bodies.w0,
        force=jnp.zeros_like(bodies.force),
        torque=jnp.zeros_like(bodies.torque),
        mass=bodies.mass,
        inv_mass=bodies.inv_mass,
        inertia=bodies.inertia,
        inv_inertia=bodies.inv_inertia,
        linear_damping=bodies.linear_damping,
        angular_damping=bodies.angular_damping,
        gravity_scale=bodies.gravity_scale,
        alive=bodies.alive,
    )


# ------------------------------------------------------------- constraint prep

class ContactCons(NamedTuple):
    """Immutable per-contact constraint data (mirror of s2ContactConstraint,
    reference: src/solvers.h:26-56, point axis = trailing [C,2])."""

    ia: jnp.ndarray
    ib: jnp.ndarray
    inv_mass_a: jnp.ndarray
    inv_i_a: jnp.ndarray
    inv_mass_b: jnp.ndarray
    inv_i_b: jnp.ndarray
    normal: jnp.ndarray        # [C,2]
    friction: jnp.ndarray      # [C]
    active: jnp.ndarray        # [C] alive & point_count > 0
    pmask: jnp.ndarray         # [C,2] per-point validity
    local_anchor_a: jnp.ndarray  # [C,2,2] com-relative
    local_anchor_b: jnp.ndarray
    r_a0: jnp.ndarray          # [C,2,2] world anchors at prepare
    r_b0: jnp.ndarray
    separation: jnp.ndarray    # [C,2]
    adjusted_separation: jnp.ndarray  # [C,2]
    normal_mass: jnp.ndarray   # [C,2]
    tangent_mass: jnp.ndarray  # [C,2]
    bias_coef: jnp.ndarray     # [C,2]
    mass_coef: jnp.ndarray     # [C,2]
    imp_coef: jnp.ndarray      # [C,2]


def _effective_masses(rA, rB, normal, mA, iA, mB, iB):
    """kNormal/kTangent per point. rA/rB: [C,2,2]; normal: [C,2]."""
    tangent = m.right_perp(normal)
    rnA = m.cross(rA, normal[:, None, :])
    rnB = m.cross(rB, normal[:, None, :])
    k_n = mA[:, None] + mB[:, None] + iA[:, None] * rnA**2 + iB[:, None] * rnB**2
    rtA = m.cross(rA, tangent[:, None, :])
    rtB = m.cross(rB, tangent[:, None, :])
    k_t = mA[:, None] + mB[:, None] + iA[:, None] * rtA**2 + iB[:, None] * rtB**2
    nm = jnp.where(k_n > 0.0, 1.0 / jnp.where(k_n > 0.0, k_n, 1.0), 0.0)
    tm = jnp.where(k_t > 0.0, 1.0 / jnp.where(k_t > 0.0, k_t, 1.0), 0.0)
    return nm, tm


def body_const_rows(bodies: Bodies):
    """The packed per-body constant rows prepare_contacts gathers:
    [inv_mass, inv_I, rot(2), local_center(2)]."""
    return jnp.concatenate(
        [bodies.inv_mass[:, None], bodies.inv_inertia[:, None], bodies.rot, bodies.local_center],
        axis=-1,
    )


def prepare_contacts(bodies: Bodies, contacts: Contacts, *, h, hertz, soft: bool, warm_start: bool,
                     body_rows=None):
    """PGS prep (reference: src/solve_common.c:93-168) and soft prep
    (:188-274) in one kernel; `soft` selects the coefficient model.

    body_rows: optional pre-gathered (ra, rb) endpoint constant rows (the
    lane-batched path gathers them with shared wide-row indices, see
    solvers/lane_solve.py); default gathers per contact here.

    Returns (cons, normal_impulse, tangent_impulse)."""
    ia, ib = contacts.body_a, contacts.body_b
    if body_rows is None:
        # one packed row-gather per endpoint (TPU row-gathers have a large
        # fixed per-row cost)
        bconst = body_const_rows(bodies)
        ra, rb = tgather(bconst, ia), tgather(bconst, ib)
    else:
        ra, rb = body_rows
    mA, iA, qA, lcA = ra[:, 0], ra[:, 1], ra[:, 2:4], ra[:, 4:6]
    mB, iB, qB, lcB = rb[:, 0], rb[:, 1], rb[:, 2:4], rb[:, 4:6]

    active = contacts.alive & (contacts.point_count > 0)
    pmask = active[:, None] & (jnp.arange(2)[None, :] < contacts.point_count[:, None])

    normal = contacts.normal
    la = contacts.anchor_a - lcA[:, None, :]
    lb = contacts.anchor_b - lcB[:, None, :]
    rA = m.rotate(qA[:, None, :], la)
    rB = m.rotate(qB[:, None, :], lb)

    sep = contacts.separation
    adj = sep - ((rB - rA) * normal[:, None, :]).sum(-1)

    nm, tm = _effective_masses(rA, rB, normal, mA, iA, mB, iB)

    if soft:
        # stiffer vs statics (solve_common.c:219); coefficients are per
        # contact but stored per point ([C,2]) like the reference
        contact_hertz = jnp.where((mA == 0.0) | (mB == 0.0), 2.0 * hertz, hertz)
        omega = (2.0 * PI * contact_hertz)[:, None] * jnp.ones((1, 2), jnp.float32)
        c = h * omega * (2.0 * CONTACT_ZETA + h * omega)
        bias_coef = omega / (2.0 * CONTACT_ZETA + h * omega)
        imp_coef = 1.0 / (1.0 + c)
        mass_coef = c * imp_coef
    else:
        bias_coef = jnp.where(sep > 0.0, 1.0, 0.0)
        mass_coef = jnp.ones_like(sep)
        imp_coef = jnp.zeros_like(sep)
    # Both preps keep warm impulses unconditionally: the PGS prep's
    # `cp->separation <= 0` guard (solve_common.c:133) reads the just-zeroed
    # stack allocation (stack_allocator.c:83 memset), so it always passes.
    keep = jnp.full_like(sep, warm_start, dtype=bool)

    n_imp = jnp.where(keep & pmask, contacts.normal_impulse, 0.0)
    t_imp = jnp.where(keep & pmask, contacts.tangent_impulse, 0.0)

    cons = ContactCons(
        ia=ia, ib=ib, inv_mass_a=mA, inv_i_a=iA, inv_mass_b=mB, inv_i_b=iB,
        normal=normal, friction=contacts.friction, active=active, pmask=pmask,
        local_anchor_a=la, local_anchor_b=lb, r_a0=rA, r_b0=rB,
        separation=sep, adjusted_separation=adj,
        normal_mass=nm, tangent_mass=tm,
        bias_coef=bias_coef, mass_coef=mass_coef, imp_coef=imp_coef,
    )
    return cons, n_imp, t_imp


# ---------------------------------------------------------- colored GS driver

from typing import NamedTuple as _NamedTuple


class BodyMap(_NamedTuple):
    """Scatter-free application table (see ops/coloring.py:build_body_map).

    slot:   [B, n_colors] constraint index writing body b in color k (-1 none)
    winner: [N] constraint actually owns its table entries (False only for
            conflicting constraints in the overflow bucket — those are skipped
            for the step and counted in diagnostics)."""

    slot: jnp.ndarray
    winner: jnp.ndarray


def make_body_map(body_a, body_b, color, active, dyn_mask, num_bodies, n_colors, write_a_extra=None):
    from ..ops.coloring import build_body_map

    idx = jnp.arange(body_a.shape[0], dtype=jnp.int32)
    dyn_a = tgather(dyn_mask, body_a)
    dyn_b = tgather(dyn_mask, body_b)
    write_a = dyn_a if write_a_extra is None else (dyn_a & write_a_extra)
    write_b = dyn_b
    slot = build_body_map(body_a, body_b, color, active, write_a, write_b, num_bodies, n_colors)
    n_colors_i = slot.shape[1]
    flat_slot = slot.reshape(-1)
    N = body_a.shape[0]
    c = jnp.clip(color, 0, n_colors_i - 1)
    cells = jnp.concatenate([body_a, body_b]) * n_colors_i + jnp.concatenate([c, c])
    got = tgather(flat_slot, cells)
    own_a = ~write_a | (got[:N] == idx)
    own_b = ~write_b | (got[N:] == idx)
    return BodyMap(slot=slot, winner=own_a & own_b)


def _exp(mask, ndim):
    return mask.reshape(mask.shape + (1,) * (ndim - 1))


# ------------------------------------------------------- packed body state
#
# TPU row-gathers have a large fixed per-row cost, so all per-body solver
# state lives in ONE [B, 8] array during solving: one gather per endpoint per
# pass instead of eight. Lanes: [vx, vy, w, dpx, dpy, rot_s, rot_c, pad].

def pack_body_state(v, w, dp, rot):
    return jnp.concatenate(
        [v, w[:, None], dp, rot, jnp.zeros_like(w[:, None])], axis=-1
    )


def unpack_body_state(bs):
    return bs[:, 0:2], bs[:, 2], bs[:, 3:5], bs[:, 5:7]


def unpack_rows(rows):
    """Split gathered [C, 8] rows into (v [C,2], w [C], dp [C,2], rot [C,2])."""
    return rows[:, 0:2], rows[:, 2], rows[:, 3:5], rows[:, 5:7]


def pack_rows(v, w, dp, rot):
    return jnp.concatenate(
        [v, w[:, None], dp, rot, jnp.zeros_like(w[:, None])], axis=-1
    )


def gather_rows2(bs, ia, ib):
    """Gather endpoint rows for both ends in ONE row-gather call (row-gathers
    carry a large fixed per-call cost on TPU). Returns (rows_a, rows_b)."""
    C = ia.shape[0]
    rows = tgather(bs, jnp.concatenate([ia, ib]))
    return rows[:C], rows[C:]


def gather_apply(slot_k, body_a, values_a, values_b, targets):
    """Apply per-constraint endpoint values to per-body arrays by gathering.

    slot_k: [B] constraint index for this color (-1 = untouched);
    values_a/values_b: tuples of [C, ...] f32 new values for endpoint A/B;
    targets: tuple of [B, ...] f32 arrays. Returns updated targets.

    All endpoint values plus the constraint's body-A index ride ONE packed
    row-gather (the per-call fixed cost dominates on TPU)."""
    B = targets[0].shape[0]
    C = body_a.shape[0]
    ci = jnp.maximum(slot_k, 0)
    valid = slot_k >= 0

    import jax as _jax

    def lanes(x):
        return x.reshape(C, -1)

    # body index lane uses the FTZ-safe biased transport (broadphase._i2f):
    # a plain bitcast makes small ints denormal and the TPU zeroes them
    # inside concat+gather fusions (see broadphase.py)
    from ..ops.broadphase import _f2i, _i2f

    packed = jnp.concatenate(
        [lanes(v) for v in values_a]
        + [lanes(v) for v in values_b]
        + [_i2f(body_a)[:, None]],
        axis=-1,
    )
    rows = tgather(packed, ci)  # [B, sum(k)*2 + 1]
    is_a = _f2i(rows[:, -1]) == jnp.arange(B, dtype=body_a.dtype)

    outs = []
    o = 0
    na = sum(int(np.prod(v.shape[1:])) for v in values_a)
    for arr, va in zip(targets, values_a):
        k = int(np.prod(va.shape[1:]))
        a_val = rows[:, o:o + k].reshape((B,) + va.shape[1:])
        b_val = rows[:, na + o:na + o + k].reshape((B,) + va.shape[1:])
        sel = jnp.where(_exp(is_a, arr.ndim), a_val, b_val)
        outs.append(jnp.where(_exp(valid, arr.ndim), sel, arr))
        o += k
    return tuple(outs)


def sfori(n: int, body, carry):
    """Statically-unrolled fori_loop. Every solver loop bound here is a
    compile-time constant, and on TPU each device while-loop trip costs
    ~1-2 ms of sequencing overhead (measured: a TGS substep schedule of
    ~330 trips accounted for ~0.7 s/step at 128 worlds); unrolling turns
    the whole solve into straight-line fused XLA."""
    for i in range(n):
        carry = body(i, carry)
    return carry


def colored_pass(n_colors: int, solve_fn, carry):
    """Run solve_fn once per color: solve_fn(carry, k) -> carry.

    Within a color the constraints touch disjoint dynamic bodies, so the
    gather-applied parallel solve equals a sequential Gauss-Seidel sweep."""

    def body(k, carry):
        return solve_fn(carry, k)

    return sfori(n_colors, body, carry)


# ------------------------------------------------ packed integration/warm

def integrate_velocities_packed(bodies: Bodies, bs, gravity, h):
    v, w, dp, rot = unpack_body_state(bs)
    v, w = integrate_velocities(bodies, v, w, gravity, h)
    return pack_body_state(v, w, dp, rot)


def integrate_positions_packed(bodies: Bodies, bs, h):
    v, w, dp, rot = unpack_body_state(bs)
    dp, rot = integrate_positions(bodies.alive, bodies.type, dp, rot, v, w, h)
    return pack_body_state(v, w, dp, rot)


def warm_start_packed(bs, cons: ContactCons, n_imp, t_imp, fixed_anchors: bool = False):
    """Packed warm start: two scatter-adds total (reference:
    src/solve_common.c:276-326; fixed variant solve_soft_step.c:16-63)."""
    if fixed_anchors:
        rA, rB = cons.r_a0, cons.r_b0
    else:
        _, _, _, rot = unpack_body_state(bs)
        qA, qB = tgather(rot, cons.ia), tgather(rot, cons.ib)
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
    dA = jnp.concatenate([-cons.inv_mass_a[:, None] * P_tot, (-cons.inv_i_a * torque_a)[:, None], z2, z2, z1], axis=-1)
    dB = jnp.concatenate([cons.inv_mass_b[:, None] * P_tot, (cons.inv_i_b * torque_b)[:, None], z2, z2, z1], axis=-1)
    bs = tscatter_add(bs, jnp.concatenate([cons.ia, cons.ib]), jnp.concatenate([dA, dB]))
    return bs


# ------------------------------------------------------------ NGS positions

def ngs_pass(bs, cons: ContactCons, k, bmap: "BodyMap"):
    """Nonlinear Gauss-Seidel position correction for one color
    (reference: src/solve_common.c:328-394). Packed body state; applied
    scatter-free via the body map. The math lives in `ngs_apply` (shared
    with the bucketed path)."""
    return ngs_apply(bs, cons, bmap.slot[:, k])


def store_impulses(contacts: Contacts, cons: ContactCons, n_imp, t_imp) -> Contacts:
    """Write accumulated impulses back to the manifold for next-step warm
    starting (reference: src/solve_common.c:396-410)."""
    import dataclasses

    keep = cons.pmask
    return dataclasses.replace(
        contacts,
        normal_impulse=jnp.where(keep, n_imp, contacts.normal_impulse),
        tangent_impulse=jnp.where(keep, t_imp, contacts.tangent_impulse),
    )


# ------------------------------------------------------------ bucketed solve
#
# The dense colored pass re-solves ALL C contacts once per color and applies
# only color k — max_colors x redundant math and row-gather traffic. The
# bucketed path (ops/coloring.py:build_color_buckets) permutes the prepared
# constraints into color-major buckets ONCE per step; each statically
# unrolled phase then slices its own ~C/max_colors rows. Same per-contact
# math, same within-color parallel-GS semantics.


def permute_rows(arrays, bucket):
    """Permute a tuple of [N, ...] arrays into bucket order with ONE packed
    row-gather (per-row fixed cost dominates on TPU). bucket: i32 [T] with
    -1 pads. Int lanes ride the FTZ-safe biased transport (broadphase._i2f);
    bools travel as 0/1 f32. Returns (tuple of [T, ...] arrays, valid [T])."""
    from ..ops.broadphase import _f2i, _i2f

    valid = bucket >= 0
    bi = jnp.maximum(bucket, 0)
    cols = []
    for x in arrays:
        flat = x.reshape(x.shape[0], -1)
        if x.dtype == jnp.int32:
            flat = _i2f(flat)
        elif x.dtype == jnp.bool_:
            flat = flat.astype(jnp.float32)
        cols.append(flat)
    packed = jnp.concatenate(cols, axis=-1)
    rows = tgather(packed, bi)
    outs = []
    o = 0
    for x in arrays:
        k = int(np.prod(x.shape[1:]))
        seg = rows[:, o:o + k].reshape((bi.shape[0],) + x.shape[1:])
        if x.dtype == jnp.int32:
            seg = _f2i(seg)
        elif x.dtype == jnp.bool_:
            seg = seg > 0.5
        outs.append(seg)
        o += k
    return tuple(outs), valid


def bucket_contacts(cons: ContactCons, n_imp, t_imp, bucket):
    """Permute prepared constraints + impulses into color-major bucket order;
    pad rows are masked inactive."""
    outs, valid = permute_rows(tuple(cons) + (n_imp, t_imp), bucket)
    cons_b = ContactCons(*outs[:-2])
    cons_b = cons_b._replace(
        active=cons_b.active & valid,
        pmask=cons_b.pmask & valid[:, None],
    )
    return cons_b, outs[-2], outs[-1]


def unbucket_impulses(contacts: Contacts, cons_b: ContactCons, bucket, n_b, t_b) -> Contacts:
    """Scatter bucketed impulses back to contact-slot order and store them in
    the manifold (bucketed analog of store_impulses; reference:
    src/solve_common.c:396-410 writes only the manifold's live points)."""
    import dataclasses

    from ..ops.gather import tscatter_set

    C = contacts.normal_impulse.shape[0]
    bi = jnp.where(bucket >= 0, bucket, C)
    stacked = []
    for src, tgt in ((n_b, contacts.normal_impulse), (t_b, contacts.tangent_impulse)):
        cols = []
        for j in range(2):
            idx = jnp.where(cons_b.pmask[:, j], bi, C)
            padded = jnp.concatenate([tgt[:, j], jnp.zeros((1,), tgt.dtype)])
            cols.append(tscatter_set(padded, idx, src[:, j])[:C])
        stacked.append(jnp.stack(cols, axis=-1))
    return dataclasses.replace(
        contacts, normal_impulse=stacked[0], tangent_impulse=stacked[1]
    )


def ngs_apply(bs, cons: ContactCons, slot_k):
    """NGS position correction for one constraint set applied via a direct
    slot table (shared by the dense per-color path and the bucketed path)."""
    ia, ib = cons.ia, cons.ib
    mA, iA = cons.inv_mass_a, cons.inv_i_a
    mB, iB = cons.inv_mass_b, cons.inv_i_b
    rowsA, rowsB = gather_rows2(bs, ia, ib)
    vA, wA, dcA, qA = unpack_rows(rowsA)
    vB, wB, dcB, qB = unpack_rows(rowsB)
    normal = cons.normal

    for j in range(2):
        rA = m.rotate(qA, cons.local_anchor_a[:, j])
        rB = m.rotate(qB, cons.local_anchor_b[:, j])
        d = (dcB - dcA) + (rB - rA)
        sep = (d * normal).sum(-1) + cons.adjusted_separation[:, j]
        C = jnp.clip(BAUMGARTE * (sep + LINEAR_SLOP), -MAX_LINEAR_CORRECTION, 0.0)
        rnA = m.cross(rA, normal)
        rnB = m.cross(rB, normal)
        K = mA + mB + iA * rnA**2 + iB * rnB**2
        impulse = jnp.where(K > 0.0, -C / jnp.where(K > 0.0, K, 1.0), 0.0)
        # NGS skips speculative points (solve_common.c:355-359)
        ok = cons.pmask[:, j] & (cons.separation[:, j] <= 0.0)
        impulse = jnp.where(ok, impulse, 0.0)
        P = impulse[:, None] * normal
        dcA = dcA - mA[:, None] * P
        qA = m.integrate_rot(qA, -iA * m.cross(rA, P))
        dcB = dcB + mB[:, None] * P
        qB = m.integrate_rot(qB, iB * m.cross(rB, P))

    outA = pack_rows(vA, wA, dcA, qA)
    outB = pack_rows(vB, wB, dcB, qB)
    (bs,) = gather_apply(slot_k, cons.ia, (outA,), (outB,), (bs,))
    return bs
