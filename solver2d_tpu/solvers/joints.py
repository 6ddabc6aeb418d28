"""Joint constraint kernels: revolute (5 solver variants) + mouse.

Functional re-derivation of reference: src/revolute_joint.c and
src/mouse_joint.c, vectorized over the joint array with a type mask (revolute
vs mouse selected per lane). Dispatch tables in src/joint.c:294-465 map to the
mode arguments here:

- prepare / warm start           (revolute_joint.c:30-150, mouse_joint.c:31-107)
- solve rigid                    (revolute_joint.c:152-303; mouse solved always)
- solve soft                     (revolute_joint.c:508-657; mouse only when bias,
                                  joint.c:388-397)
- solve Baumgarte                (revolute_joint.c:660-790)
- position solve (NGS)           (revolute_joint.c:305-419)
- solve XPBD                     (revolute_joint.c:825-888)

Fresh pivot effective mass is recomputed every solve (S2_FRESH_PIVOT_MASS=1,
revolute_joint.c:15). Joints are colored like contacts; each colored pass
scatters disjoint body updates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import (
    ANGULAR_SLOP,
    BAUMGARTE,
    MAX_ANGULAR_CORRECTION,
    PI,
)
from ..ops import math2d as m
from ..ops.gather import tgather
from ..state import Bodies, Joints
from .common import gather_rows2


class JointCons(NamedTuple):
    ia: jnp.ndarray
    ib: jnp.ndarray
    is_mouse: jnp.ndarray   # bool [J]
    active: jnp.ndarray     # bool [J]
    inv_mass_a: jnp.ndarray
    inv_i_a: jnp.ndarray
    inv_mass_b: jnp.ndarray
    inv_i_b: jnp.ndarray
    local_anchor_a: jnp.ndarray  # [J,2] com-relative
    local_anchor_b: jnp.ndarray
    center_diff0: jnp.ndarray    # [J,2]
    axial_mass: jnp.ndarray      # [J]
    # prepared pivot effective-mass inverse, stored as the three distinct
    # entries of the symmetric 2x2 (rank-2 only: the fused Pallas kernel
    # cannot slice rank-3 minor dims — Mosaic)
    pm11: jnp.ndarray            # [J]
    pm12: jnp.ndarray            # [J]
    pm22: jnp.ndarray            # [J]
    inertia_b: jnp.ndarray       # [J] body-B rotational inertia (mouse damping)
    bias_coef: jnp.ndarray       # [J]
    mass_coef: jnp.ndarray       # [J]
    imp_coef: jnp.ndarray        # [J]
    # revolute params
    reference_angle: jnp.ndarray
    lower_angle: jnp.ndarray
    upper_angle: jnp.ndarray
    enable_limit: jnp.ndarray
    enable_motor: jnp.ndarray
    motor_speed: jnp.ndarray
    max_motor_torque: jnp.ndarray
    # mouse params
    target: jnp.ndarray          # [J,2]


class JointImp(NamedTuple):
    impulse: jnp.ndarray        # [J,2]
    motor: jnp.ndarray          # [J]
    lower: jnp.ndarray          # [J]
    upper: jnp.ndarray          # [J]


def _pivot_k(rA, rB, mA, mB, iA, iB):
    """Symmetric pivot effective-mass matrix as its three distinct entries
    (reference: revolute_joint.c:624-633). Rank-2 columns, not [J,2,2]."""
    k11 = mA + mB + rA[:, 1] ** 2 * iA + rB[:, 1] ** 2 * iB
    k12 = -rA[:, 1] * rA[:, 0] * iA - rB[:, 1] * rB[:, 0] * iB
    k22 = mA + mB + rA[:, 0] ** 2 * iA + rB[:, 0] ** 2 * iB
    return k11, k12, k22


def _solve_sym(k11, k12, k22, b):
    """Solve the symmetric 2x2 [k11 k12; k12 k22] x = b, det==0 -> zero
    (mirrors math.h:410-420 semantics)."""
    det = k11 * k22 - k12 * k12
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    x = inv_det * (k22 * b[:, 0] - k12 * b[:, 1])
    y = inv_det * (k11 * b[:, 1] - k12 * b[:, 0])
    return jnp.stack([x, y], axis=-1)


def _inv_sym(k11, k12, k22):
    """Inverse of the symmetric 2x2 as its three distinct entries."""
    det = k11 * k22 - k12 * k12
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    return inv_det * k22, -inv_det * k12, inv_det * k11


def prepare_joints(bodies: Bodies, joints: Joints, *, h, hertz, soft: bool, warm_start: bool):
    """Revolute prep (revolute_joint.c:30-105 rigid, :421-506 soft) + mouse
    prep (mouse_joint.c:31-83). Returns (cons, imp)."""
    ia, ib = joints.body_a, joints.body_b
    is_mouse = joints.type == 1
    mA, iA = tgather(bodies.inv_mass, ia), tgather(bodies.inv_inertia, ia)
    mB, iB = tgather(bodies.inv_mass, ib), tgather(bodies.inv_inertia, ib)
    # mouse joint ignores body A entirely (mouse_joint.c:31-107)
    mA = jnp.where(is_mouse, 0.0, mA)
    iA = jnp.where(is_mouse, 0.0, iA)

    la = joints.local_anchor_a - tgather(bodies.local_center, ia)
    lb = joints.local_anchor_b - tgather(bodies.local_center, ib)
    qA, qB = tgather(bodies.rot, ia), tgather(bodies.rot, ib)
    rA = m.rotate(qA, la)
    rB = m.rotate(qB, lb)

    center_diff0 = jnp.where(
        is_mouse[:, None],
        tgather(bodies.position, ib) - joints.target,  # mouse_joint.c:75-76
        tgather(bodies.position, ib) - tgather(bodies.position, ia),  # revolute_joint.c:53
    )

    k11, k12, k22 = _pivot_k(rA, rB, mA, mB, iA, iB)
    pm11, pm12, pm22 = _inv_sym(k11, k12, k22)

    k_ax = iA + iB
    axial_mass = jnp.where(k_ax > 0.0, 1.0 / jnp.where(k_ax > 0.0, k_ax, 1.0), 0.0)
    fixed_rotation = k_ax == 0.0

    # soft coefficients: mouse uses its own hertz/damping with substep h
    # (mouse_joint.c:50-58); revolute soft uses the solver's joint hertz with
    # zeta=10 (revolute_joint.c:470-477)
    zeta = jnp.where(is_mouse, joints.damping_ratio, 10.0)
    hz = jnp.where(is_mouse, joints.hertz, hertz if soft else 0.0)
    omega = 2.0 * PI * hz
    c = h * omega * (2.0 * zeta + h * omega)
    denom = 2.0 * zeta + h * omega
    bias_coef = jnp.where(denom > 0.0, omega / jnp.where(denom > 0.0, denom, 1.0), 0.0)
    imp_coef = 1.0 / (1.0 + c)
    mass_coef = c * imp_coef

    keep_axial = joints.alive & warm_start & ~fixed_rotation
    imp = JointImp(
        impulse=jnp.where((joints.alive & warm_start)[:, None], joints.impulse, 0.0),
        motor=jnp.where(keep_axial & joints.enable_motor, joints.motor_impulse, 0.0),
        lower=jnp.where(keep_axial & joints.enable_limit, joints.lower_impulse, 0.0),
        upper=jnp.where(keep_axial & joints.enable_limit, joints.upper_impulse, 0.0),
    )
    # mouse keeps motor_impulse as its angular-damping state
    imp = imp._replace(motor=jnp.where(is_mouse, joints.motor_impulse, imp.motor))

    cons = JointCons(
        ia=ia, ib=ib, is_mouse=is_mouse, active=joints.alive,
        inv_mass_a=mA, inv_i_a=iA, inv_mass_b=mB, inv_i_b=iB,
        local_anchor_a=la, local_anchor_b=lb, center_diff0=center_diff0,
        axial_mass=axial_mass, pm11=pm11, pm12=pm12, pm22=pm22,
        inertia_b=tgather(bodies.inertia, ib),
        bias_coef=bias_coef, mass_coef=mass_coef, imp_coef=imp_coef,
        reference_angle=joints.reference_angle,
        lower_angle=joints.lower_angle, upper_angle=joints.upper_angle,
        enable_limit=joints.enable_limit, enable_motor=joints.enable_motor,
        motor_speed=joints.motor_speed, max_motor_torque=joints.max_motor_torque,
        target=joints.target,
    )
    return cons, imp


def warm_start_pass(bs, k, cons: JointCons, imp: JointImp, bmap):
    """(revolute_joint.c:107-150, mouse_joint.c:85-107) — applied per color
    via the body map (scatter-free). Packed body state."""
    return warm_start_apply(bs, cons, imp, bmap.slot[:, k])


def warm_start_apply(bs, cons: JointCons, imp: JointImp, slot):
    """Warm start one constraint set via a direct slot table (shared by the
    dense per-color path and the bucketed path)."""
    from .common import gather_apply, pack_rows, unpack_rows, gather_rows2

    ia, ib = cons.ia, cons.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA, wA, dcA, qA = unpack_rows(_ra)
    vB, wB, dcB, qB = unpack_rows(_rb)
    rA = m.rotate(qA, cons.local_anchor_a)
    rB = m.rotate(qB, cons.local_anchor_b)
    axial = imp.motor + imp.lower - imp.upper
    axial = jnp.where(cons.is_mouse, imp.motor, axial)
    P = imp.impulse

    vA2 = vA - cons.inv_mass_a[:, None] * P
    wA2 = wA - cons.inv_i_a * (m.cross(rA, P) + axial)
    vB2 = vB + cons.inv_mass_b[:, None] * P
    wB2 = wB + cons.inv_i_b * (m.cross(rB, P) + axial)
    outA = pack_rows(vA2, wA2, dcA, qA)
    outB = pack_rows(vB2, wB2, dcB, qB)
    (bs,) = gather_apply(slot, ia, (outA,), (outB,), (bs,))
    return bs


def _motor_limits(cons, imp, wA, wB, qA, qB, h, inv_h, mode: str, use_bias: bool):
    """Motor + angle limits shared by rigid/soft/baumgarte solves.
    mode: 'rigid' (revolute_joint.c:174-219), 'soft' (:527-603),
    'baumgarte' (:679-747). Returns (wA, wB, imp)."""
    iA, iB = cons.inv_i_a, cons.inv_i_b
    fixed_rot = (iA + iB) == 0.0
    rev = ~cons.is_mouse & cons.active

    # Motor
    do_motor = rev & cons.enable_motor & ~fixed_rot
    cdot = wB - wA - cons.motor_speed
    impulse = -cons.axial_mass * cdot
    max_imp = h * cons.max_motor_torque
    new_motor = jnp.clip(imp.motor + impulse, -max_imp, max_imp)
    d = jnp.where(do_motor, new_motor - imp.motor, 0.0)
    motor = jnp.where(do_motor, new_motor, imp.motor)
    wA = wA - iA * d
    wB = wB + iB * d

    # Limits
    do_limit = rev & cons.enable_limit & ~fixed_rot
    angle = m.relative_angle(qB, qA) - cons.reference_angle

    def limit(C, cdot, old, scale_imp):
        if mode == "rigid":
            bias = jnp.maximum(C, 0.0) * inv_h
            mass_scale = 1.0
            imp_scale = jnp.zeros_like(C)
        elif mode == "soft":
            spec = C > 0.0
            bias = jnp.where(spec, C * inv_h, jnp.where(use_bias, cons.bias_coef * C, 0.0))
            mass_scale = jnp.where(spec | (not use_bias), 1.0, cons.mass_coef)
            imp_scale = jnp.where(spec | (not use_bias), 0.0, cons.imp_coef)
        else:  # baumgarte
            spec = C > 0.0
            bias = jnp.where(spec, C * inv_h, jnp.where(use_bias, BAUMGARTE * inv_h * C, 0.0))
            mass_scale = 1.0
            imp_scale = jnp.zeros_like(C)
        impulse = -cons.axial_mass * mass_scale * (cdot + bias) - imp_scale * scale_imp
        new = jnp.maximum(old + impulse, 0.0)
        return new

    # Lower limit
    C_lo = angle - cons.lower_angle
    new_lower = limit(C_lo, wB - wA, imp.lower, imp.lower)
    d_lo = jnp.where(do_limit, new_lower - imp.lower, 0.0)
    lower = jnp.where(do_limit, new_lower, imp.lower)
    wA = wA - iA * d_lo
    wB = wB + iB * d_lo

    # Upper limit (signs flipped, revolute_joint.c:205-218). NOTE: the soft
    # variant's impulse-scale term reads lowerImpulse here — mirroring
    # revolute_joint.c:595 exactly for behavior parity.
    C_hi = cons.upper_angle - angle
    new_upper = limit(C_hi, wA - wB, imp.upper, imp.lower)
    d_hi = jnp.where(do_limit, new_upper - imp.upper, 0.0)
    upper = jnp.where(do_limit, new_upper, imp.upper)
    wA = wA + iA * d_hi
    wB = wB - iB * d_hi

    return wA, wB, imp._replace(motor=motor, lower=lower, upper=upper)


def _mouse_angular_damping(cons, imp, wB, h):
    """Mouse pseudo-motor angular damping (mouse_joint.c:120-131)."""
    zeta, hz = 0.1, 0.5
    omega = 2.0 * PI * hz
    c = h * omega * (2.0 * zeta + h * omega)
    imp_scale = 1.0 / (1.0 + c)
    mass_scale = c * imp_scale
    impulse = -mass_scale * cons.inertia_b * wB - imp_scale * imp.motor
    do = cons.is_mouse & cons.active
    motor = jnp.where(do, imp.motor + impulse, imp.motor)
    wB = wB + jnp.where(do, cons.inv_i_b * impulse, 0.0)
    return wB, imp._replace(motor=motor)


def solve_joint_core(cons: JointCons, vA, wA, vB, wB, qA, qB, dcA_r, dcB_r,
                     imp: JointImp, mode: str, h, inv_h, use_bias: bool,
                     solve_mouse: bool = True, only_mouse: bool = False):
    """Pure per-lane joint velocity solve (no gathers/applies): the exact
    same math for the XLA colored pass and the fused Pallas kernel, so the
    two backends cannot diverge. All arrays rank <= 2 (Mosaic-safe).

    Returns (vA2, wA2, vB2, wB2, new_imp, imp2, scope): velocities already
    restored to their inputs outside `scope`; `new_imp` is the all-lane
    updated pivot impulse, `imp2` the all-lane motor/limit impulses — the
    caller masks both to the winning color lanes."""
    mA, iA = cons.inv_mass_a, cons.inv_i_a
    mB, iB = cons.inv_mass_b, cons.inv_i_b

    wA0_in, wB0_in, vA0_in, vB0_in = wA, wB, vA, vB

    wA, wB, imp2 = _motor_limits(cons, imp, wA, wB, qA, qB, h, inv_h, mode, use_bias)

    if solve_mouse:
        wB, imp2 = _mouse_angular_damping(cons, imp2, wB, h)

    # Point-to-point
    rA = m.rotate(qA, cons.local_anchor_a)
    rB = m.rotate(qB, cons.local_anchor_b)
    cdot = (vB + m.cross_sv(wB, rB)) - (vA + m.cross_sv(wA, rA))

    separation = (dcB_r - dcA_r) + (rB - rA) + cons.center_diff0
    # mouse separation: dcB + rB + (cB0 - target) (mouse_joint.c:138-141)
    separation = jnp.where(cons.is_mouse[:, None], dcB_r + rB + cons.center_diff0, separation)

    if mode == "rigid":
        bias = jnp.zeros_like(cdot)
        mass_scale = jnp.ones((cdot.shape[0],))
        imp_scale = jnp.zeros((cdot.shape[0],))
    elif mode == "soft":
        bias = jnp.where(use_bias, cons.bias_coef[:, None] * separation, 0.0)
        mass_scale = jnp.where(use_bias, cons.mass_coef, 1.0)
        imp_scale = jnp.where(use_bias, cons.imp_coef, 0.0)
    else:  # baumgarte (always biased, revolute_joint.c:762-763)
        bias = BAUMGARTE * inv_h * separation
        mass_scale = jnp.ones((cdot.shape[0],))
        imp_scale = jnp.zeros((cdot.shape[0],))

    # mouse always uses its soft coefficients (mouse_joint.c:133-159)
    bias = jnp.where(cons.is_mouse[:, None], cons.bias_coef[:, None] * separation, bias)
    mass_scale = jnp.where(cons.is_mouse, cons.mass_coef, mass_scale)
    imp_scale = jnp.where(cons.is_mouse, cons.imp_coef, imp_scale)

    # fresh pivot mass (S2_FRESH_PIVOT_MASS, revolute_joint.c:630-636); the
    # mouse joint uses its prepared pivot mass (mouse_joint.c:153)
    k11, k12, k22 = _pivot_k(rA, rB, mA, mB, iA, iB)
    rhs = cdot + bias
    b_fresh = _solve_sym(k11, k12, k22, rhs)
    b_prep = jnp.stack(
        [cons.pm11 * rhs[:, 0] + cons.pm12 * rhs[:, 1],
         cons.pm12 * rhs[:, 0] + cons.pm22 * rhs[:, 1]],
        axis=-1,
    )
    b = jnp.where(cons.is_mouse[:, None], b_prep, b_fresh)

    impulse = -mass_scale[:, None] * b - imp_scale[:, None] * imp2.impulse
    new_imp = imp2.impulse + impulse

    not_mouse = ~cons.is_mouse
    vA = vA - jnp.where(not_mouse, mA, 0.0)[:, None] * impulse
    wA = wA - jnp.where(not_mouse, iA, 0.0) * m.cross(rA, impulse)
    vB = vB + mB[:, None] * impulse
    wB = wB + iB * m.cross(rB, impulse)

    # soft relax passes leave mouse joints untouched (joint.c:390-397);
    # the XPBD loop solves ONLY mouse joints in velocity space (joint.c:450-465)
    scope = cons.active
    if not solve_mouse:
        scope = scope & ~cons.is_mouse
    if only_mouse:
        scope = scope & cons.is_mouse
    # out-of-scope joints must not change body state even when in the table
    scopen = scope[:, None]
    vA = jnp.where(scopen, vA, vA0_in)
    wA = jnp.where(scope, wA, wA0_in)
    vB = jnp.where(scopen, vB, vB0_in)
    wB = jnp.where(scope, wB, wB0_in)
    return vA, wA, vB, wB, new_imp, imp2, scope


def solve_pass(carry, k, cons: JointCons, mode: str, h, inv_h, use_bias: bool, color, bmap, solve_mouse: bool = True, only_mouse: bool = False):
    """One colored joint velocity pass, applied scatter-free via the body map.

    mode: 'rigid' | 'soft' | 'baumgarte'. carry = (bs, imp).
    solve_mouse: mouse joints are skipped in soft relax passes
    (joint.c:390-397)."""
    from .common import gather_apply, pack_rows, unpack_rows

    bs, imp = carry
    ia, ib = cons.ia, cons.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA, wA, dcA_r, qA = unpack_rows(_ra)
    vB, wB, dcB_r, qB = unpack_rows(_rb)

    vA, wA, vB, wB, new_imp, imp2, scope = solve_joint_core(
        cons, vA, wA, vB, wB, qA, qB, dcA_r, dcB_r, imp, mode, h, inv_h,
        use_bias, solve_mouse, only_mouse,
    )

    upd = (color == k) & scope & bmap.winner
    updn = upd[:, None]
    outA = pack_rows(vA, wA, dcA_r, qA)
    outB = pack_rows(vB, wB, dcB_r, qB)
    (bs,) = gather_apply(bmap.slot[:, k], ia, (outA,), (outB,), (bs,))
    imp_out = JointImp(
        impulse=jnp.where(updn, new_imp, imp.impulse),
        motor=jnp.where(upd, imp2.motor, imp.motor),
        lower=jnp.where(upd, imp2.lower, imp.lower),
        upper=jnp.where(upd, imp2.upper, imp.upper),
    )
    return (bs, imp_out)


def position_pass(bs, k, cons: JointCons, color, bmap):
    """NGS joint position solve (revolute_joint.c:305-419): angular limit
    correction + point-to-point projection. Mouse joints are skipped
    (joint.c:353-364). Packed body state."""
    return position_apply(bs, cons, bmap.slot[:, k])


def position_apply(bs, cons: JointCons, slot):
    from .common import pack_rows, unpack_rows

    ia, ib = cons.ia, cons.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA_r, wA_r, dcA, qA = unpack_rows(_ra)
    vB_r, wB_r, dcB, qB = unpack_rows(_rb)
    mA, iA = cons.inv_mass_a, cons.inv_i_a
    mB, iB = cons.inv_mass_b, cons.inv_i_b
    fixed_rot = (iA + iB) == 0.0
    rev = ~cons.is_mouse & cons.active

    # angular limit (revolute_joint.c:322-346)
    do_limit = rev & cons.enable_limit & ~fixed_rot
    angle = m.relative_angle(qB, qA) - cons.reference_angle
    equal = jnp.abs(cons.upper_angle - cons.lower_angle) < 2.0 * ANGULAR_SLOP
    C_eq = jnp.clip(angle - cons.lower_angle, -MAX_ANGULAR_CORRECTION, MAX_ANGULAR_CORRECTION)
    C_lo = jnp.clip(angle - cons.lower_angle + ANGULAR_SLOP, -MAX_ANGULAR_CORRECTION, 0.0)
    C_hi = jnp.clip(angle - cons.upper_angle - ANGULAR_SLOP, 0.0, MAX_ANGULAR_CORRECTION)
    C = jnp.where(
        equal, C_eq,
        jnp.where(angle <= cons.lower_angle, C_lo, jnp.where(angle >= cons.upper_angle, C_hi, 0.0)),
    )
    limit_imp = jnp.where(do_limit, -cons.axial_mass * C, 0.0)
    qA = m.integrate_rot(qA, -iA * limit_imp)
    qB = m.integrate_rot(qB, iB * limit_imp)

    # point-to-point (revolute_joint.c:348-413)
    rA = m.rotate(qA, cons.local_anchor_a)
    rB = m.rotate(qB, cons.local_anchor_b)
    Cp = (dcB - dcA) + (rB - rA) + cons.center_diff0
    k11, k12, k22 = _pivot_k(rA, rB, mA, mB, iA, iB)
    impulse = _solve_sym(k11, k12, k22, -Cp)
    impulse = jnp.where(rev[:, None], impulse, 0.0)

    dcA = dcA - mA[:, None] * impulse
    qA = m.integrate_rot(qA, -iA * m.cross(rA, impulse))
    dcB = dcB + mB[:, None] * impulse
    qB = m.integrate_rot(qB, iB * m.cross(rB, impulse))

    from .common import gather_apply

    # out-of-scope (mouse) joints must not change position state
    rows0A, rows0B = gather_rows2(bs, ia, ib)
    outA = pack_rows(vA_r, wA_r, dcA, qA)
    outB = pack_rows(vB_r, wB_r, dcB, qB)
    revn = rev[:, None]
    outA = jnp.where(revn, outA, rows0A)
    outB = jnp.where(revn, outB, rows0B)
    (bs,) = gather_apply(slot, ia, (outA,), (outB,), (bs,))
    return bs


def xpbd_pass(bs, k, cons: JointCons, inv_h, color, bmap):
    """XPBD scalar-distance projection (revolute_joint.c:825-888); mouse
    joints fall through to the regular mouse solve in the XPBD loop
    (joint.c:450-465), handled by the caller. Packed body state."""
    return xpbd_apply(bs, cons, inv_h, bmap.slot[:, k])


def xpbd_apply(bs, cons: JointCons, inv_h, slot):
    from .common import pack_rows, unpack_rows

    ia, ib = cons.ia, cons.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA_r, wA_r, dcA, qA = unpack_rows(_ra)
    vB_r, wB_r, dcB, qB = unpack_rows(_rb)
    mA, iA = cons.inv_mass_a, cons.inv_i_a
    mB, iB = cons.inv_mass_b, cons.inv_i_b
    rev = ~cons.is_mouse & cons.active & ((mA != 0.0) | (mB != 0.0))

    rA = m.rotate(qA, cons.local_anchor_a)
    rB = m.rotate(qB, cons.local_anchor_b)
    separation = (dcB - dcA) + (rB - rA) + cons.center_diff0
    c = m.length(separation)
    n = m.normalize(separation)
    rnA = m.cross(rA, n)
    rnB = m.cross(rB, n)
    kA = mA + iA * rnA**2
    kB = mB + iB * rnB**2
    denom = kA + kB
    lam = jnp.where(denom > 0.0, -c / jnp.where(denom > 0.0, denom, 1.0), 0.0)
    lam = jnp.where(rev, lam, 0.0)
    P = lam[:, None] * n

    dcA = dcA - mA[:, None] * P
    qA = m.integrate_rot(qA, -iA * m.cross(rA, P))
    dcB = dcB + mB[:, None] * P
    qB = m.integrate_rot(qB, iB * m.cross(rB, P))

    from .common import gather_apply

    rows0A, rows0B = gather_rows2(bs, ia, ib)
    outA = pack_rows(vA_r, wA_r, dcA, qA)
    outB = pack_rows(vB_r, wB_r, dcB, qB)
    revn = rev[:, None]
    outA = jnp.where(revn, outA, rows0A)
    outB = jnp.where(revn, outB, rows0B)
    (bs,) = gather_apply(slot, ia, (outA,), (outB,), (bs,))
    return bs


def store_impulses(joints: Joints, cons: JointCons, imp: JointImp) -> Joints:
    import dataclasses

    a = cons.active
    return dataclasses.replace(
        joints,
        impulse=jnp.where(a[:, None], imp.impulse, joints.impulse),
        motor_impulse=jnp.where(a, imp.motor, joints.motor_impulse),
        lower_impulse=jnp.where(a, imp.lower, joints.lower_impulse),
        upper_impulse=jnp.where(a, imp.upper, joints.upper_impulse),
    )


# ------------------------------------------------------------ bucketed solve
#
# Mirror of the contact bucketing (solvers/common.py): JointCons + JointImp
# are permuted into color-major buckets once per step; each unrolled joint
# phase slices only its own ~J/joint_max_colors rows.


def _imp_slice(imp: JointImp, o: int, cap: int) -> JointImp:
    return JointImp(
        impulse=imp.impulse[o:o + cap], motor=imp.motor[o:o + cap],
        lower=imp.lower[o:o + cap], upper=imp.upper[o:o + cap],
    )


def bucket_joints(cons: JointCons, imp: JointImp, bucket):
    """Permute prepared joint constraints + impulses into color-major bucket
    order (one packed row-gather); pad rows are masked inactive."""
    from .common import permute_rows

    n = len(cons)
    outs, valid = permute_rows(tuple(cons) + tuple(imp), bucket)
    cons_b = JointCons(*outs[:n])
    cons_b = cons_b._replace(active=cons_b.active & valid)
    return cons_b, JointImp(*outs[n:])


def solve_pass_bucketed(carry, k, cap, cons_k: JointCons, mode: str, h, inv_h,
                        use_bias: bool, slot_local, winner_k,
                        solve_mouse: bool = True, only_mouse: bool = False):
    """Bucketed variant of solve_pass: cons_k is color k's static bucket
    slice; the full bucketed JointImp rides the carry and only this color's
    slice is read/written."""
    from .common import gather_apply, pack_rows, unpack_rows

    bs, imp = carry
    o = k * cap
    imp_k = _imp_slice(imp, o, cap)
    ia, ib = cons_k.ia, cons_k.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA, wA, dcA_r, qA = unpack_rows(_ra)
    vB, wB, dcB_r, qB = unpack_rows(_rb)

    vA, wA, vB, wB, new_imp, imp2, scope = solve_joint_core(
        cons_k, vA, wA, vB, wB, qA, qB, dcA_r, dcB_r, imp_k, mode, h, inv_h,
        use_bias, solve_mouse, only_mouse,
    )
    upd = scope & winner_k
    updn = upd[:, None]
    outA = pack_rows(vA, wA, dcA_r, qA)
    outB = pack_rows(vB, wB, dcB_r, qB)
    (bs,) = gather_apply(slot_local, ia, (outA,), (outB,), (bs,))
    imp_out = JointImp(
        impulse=imp.impulse.at[o:o + cap].set(jnp.where(updn, new_imp, imp_k.impulse)),
        motor=imp.motor.at[o:o + cap].set(jnp.where(upd, imp2.motor, imp_k.motor)),
        lower=imp.lower.at[o:o + cap].set(jnp.where(upd, imp2.lower, imp_k.lower)),
        upper=imp.upper.at[o:o + cap].set(jnp.where(upd, imp2.upper, imp_k.upper)),
    )
    return (bs, imp_out)


def store_impulses_bucketed(joints: Joints, cons_b: JointCons, bucket, imp_b: JointImp) -> Joints:
    """Scatter bucketed joint impulses back to slot order and store them
    (bucketed analog of store_impulses)."""
    import dataclasses

    from ..ops.gather import tscatter_set

    J = joints.impulse.shape[0]
    idx = jnp.where(cons_b.active, jnp.maximum(bucket, 0), J)

    def put(tgt, src):
        pad = jnp.concatenate([tgt, jnp.zeros((1,) + tgt.shape[1:], tgt.dtype)])
        return tscatter_set(pad, idx, src)[:J]

    return dataclasses.replace(
        joints,
        impulse=put(joints.impulse, imp_b.impulse),
        motor_impulse=put(joints.motor_impulse, imp_b.motor),
        lower_impulse=put(joints.lower_impulse, imp_b.lower),
        upper_impulse=put(joints.upper_impulse, imp_b.upper),
    )
