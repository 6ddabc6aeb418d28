"""Fused Pallas TPU solver kernel: the whole TGS_Soft substep loop in VMEM.

The XLA path executes ~100 small gather/compute/apply segments per step, each
round-tripping body state through HBM; TPU row-gathers carry a large fixed
per-row cost (measured: ~100ms per [256x8192] row-gather vs ~0 for
elementwise — see CLAUDE.md). This kernel removes both costs for the solver
stage:

- grid = (worlds,): one world per program instance;
- packed body state [B, 8] and all contact-constraint arrays stay in VMEM for
  the entire substep loop (integrate -> warm start -> biased solve ->
  integrate positions -> relax, reference: src/solve_tgs_soft.c:208-269);
- gathers become MXU matmuls against one-hot incidence matrices built once in
  VMEM scratch: rowsA = Oa[C,B] @ bs[B,8]; scatters (color apply, warm start)
  are transposed products of the SAME matrices via dot_general contracting
  dim 0 — Oa^T @ (rows masked to color-k winners) — so no [B,C] copies and no
  slot table live in VMEM. One-hot columns have at most one unmasked nonzero
  per color (disjointness + winner gate), so results are bitwise-equal to the
  gather formulation (adding exact zeros). All one-hot dots carry
  precision=HIGHEST: the MXU rounds f32 operands to bf16 at DEFAULT (measured
  maxrel 3.8e-3, exp/mosaic_probe.py), which would corrupt every gathered body
  state; HIGHEST (3-pass bf16 splitting) is measured bitwise-exact at ~1.28x
  the dot cost.

Per-contact math reuses `contact_kernels.solve_contact_core` and per-joint
math reuses `joints.solve_joint_core` — the exact same jnp code as the XLA
path, so physics cannot diverge between backends. Joints (soft revolute +
mouse, reference src/solve_tgs_soft.c:207-231 solve order: joints before
contacts in every phase) ride their own [J,B] one-hot incidence pair.

Feasible sizes: only two persistent [C, B] f32 incidence matrices remain
(round 1 kept four plus per-color [B,C] select temporaries, bounding B*C at
~131K); the raised 100 MiB scoped cap now bounds B*(C+J) at ~2^18 elements —
this covers the official bench scene (216 bodies x 896 contacts = 193K).
Enable with SimConfig(use_pallas_solver=True).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from . import contact_kernels as ck
from . import joints as jk
from .common import ContactCons, pack_rows, unpack_rows


def _kernel(
    # scalar params [1,1] f32 in SMEM
    h_ref, inv_h_ref,
    # per-world inputs (VMEM)
    bs_ref,            # [B, 8]
    gravity_ref,       # [1, 2]
    body_dyn_ref,      # [B, 1] f32 1.0 if integrate (dynamic & alive)
    body_move_ref,     # [B, 1] f32 1.0 if non-static (position integrate)
    inv_mass_ref,      # [B, 1]
    mass_grav_ref,     # [B, 2] mass*gravity_scale*gravity + force, premultiplied
    inv_i_tau_ref,     # [B, 1] inv_I * torque
    damp_lin_ref,      # [B, 1] 1/(1+h*lin_damping)
    damp_ang_ref,      # [B, 1] 1/(1+h*ang_damping)
    ia_ref, ib_ref,    # [C, 1] i32
    cons_f_ref,        # [C, NF] packed per-contact f32 constraint fields
    pmask_ref,         # [C, 2] f32
    active_ref,        # [C, 1] f32
    color_ref,         # [C, 1] i32
    writea_ref,        # [C, 1] f32: endpoint A is written (dynamic body)
    writeb_ref,        # [C, 1] f32
    winner_ref,        # [C, 1] f32
    n_imp0_ref, t_imp0_ref,  # [C, 2]
    # joint inputs (VMEM); revolute + mouse, always fused (runtime-attached
    # mouse joints must work even when the scene froze without joints)
    ja_ref, jb_ref,    # [J, 1] i32
    jcons_f_ref,       # [J, NJF] packed per-joint f32 constraint fields
    jflags_ref,        # [J, 4] f32: is_mouse, active, enable_limit, enable_motor
    jcolor_ref,        # [J, 1] i32
    jwritea_ref, jwriteb_ref,  # [J, 1] f32
    jwinner_ref,       # [J, 1] f32
    jimp0_ref,         # [J, 5] impulse xy, motor, lower, upper
    # outputs
    bs_out_ref, n_out_ref, t_out_ref, jimp_out_ref,
    # scratch
    oa_ref, ob_ref,    # [C, B] one-hot f32
    joa_ref, job_ref,  # [J, B] one-hot f32
    *, B, C, n_colors, n_joint_colors, substeps, relax, warm_start, mode,
    loop="substep", relax_iters=0, fixed_warm=False,
):
    h = h_ref[0, 0]
    inv_h = inv_h_ref[0, 0]

    iota_b = jax.lax.broadcasted_iota(jnp.int32, (C, B), 1)
    ia = ia_ref[:, 0]
    ib = ib_ref[:, 0]
    active = active_ref[:, 0] > 0.0
    winner = winner_ref[:, 0] > 0.0
    oa_ref[:, :] = (ia[:, None] == iota_b).astype(jnp.float32)
    ob_ref[:, :] = (ib[:, None] == iota_b).astype(jnp.float32)

    J = ja_ref.shape[0]
    jiota_b = jax.lax.broadcasted_iota(jnp.int32, (J, B), 1)
    ja = ja_ref[:, 0]
    jb = jb_ref[:, 0]
    joa_ref[:, :] = (ja[:, None] == jiota_b).astype(jnp.float32)
    job_ref[:, :] = (jb[:, None] == jiota_b).astype(jnp.float32)

    # unpack the constraint-field matrix (columns fixed by pack order below).
    # Per-point fields become 2-TUPLES of rank-2 arrays: Mosaic cannot slice
    # the minor dims of rank-3 tiles (see contact_kernels._pt).
    f = cons_f_ref[:, :]
    two = lambda a, b: (a, b)
    cons = ContactCons(
        ia=ia, ib=ib,
        inv_mass_a=f[:, 0], inv_i_a=f[:, 1], inv_mass_b=f[:, 2], inv_i_b=f[:, 3],
        normal=f[:, 4:6], friction=f[:, 6], active=active,
        pmask=two(pmask_ref[:, 0] > 0.0, pmask_ref[:, 1] > 0.0),
        local_anchor_a=two(f[:, 7:9], f[:, 9:11]),
        local_anchor_b=two(f[:, 11:13], f[:, 13:15]),
        r_a0=two(f[:, 15:17], f[:, 17:19]),
        r_b0=two(f[:, 19:21], f[:, 21:23]),
        separation=two(f[:, 23], f[:, 24]), adjusted_separation=two(f[:, 25], f[:, 26]),
        normal_mass=two(f[:, 27], f[:, 28]), tangent_mass=two(f[:, 29], f[:, 30]),
        bias_coef=two(f[:, 31], f[:, 32]), mass_coef=two(f[:, 33], f[:, 34]), imp_coef=two(f[:, 35], f[:, 36]),
    )

    color = color_ref[:, 0]

    def gather_rows(bs):
        rows_a = jnp.dot(oa_ref[:, :], bs, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        rows_b = jnp.dot(ob_ref[:, :], bs, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return rows_a, rows_b

    # transposed one-hot products via dot_general contracting dim 0 of the
    # SAME [C,B] matrices — no [B,C] scratch copies and no slot table. Rows
    # of `rhs` are masked to the color-k WINNERS that actually write that
    # endpoint, so per color each dynamic body receives at most one nonzero
    # term (color disjointness + the winner gate owns both cells): adding
    # exact zeros keeps gather-exact semantics; overflow-bucket losers and
    # static endpoints contribute nothing and their bodies keep old state.
    _TDOT = (((0,), (0,)), ((), ()))

    def tdot(onehot, rhs):
        return jax.lax.dot_general(onehot, rhs, _TDOT, preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    wa_f = writea_ref[:, :]
    wb_f = writeb_ref[:, :]

    def color_apply(bs, out_a, out_b, updf):
        ua = updf * wa_f
        ub = updf * wb_f
        new_rows = tdot(oa_ref[:, :], out_a * ua) + tdot(ob_ref[:, :], out_b * ub)
        written = tdot(oa_ref[:, :], ua) + tdot(ob_ref[:, :], ub)  # [B,1] in {0,1}
        return bs + written * (new_rows - bs)

    # --- joints (soft mode: TGS_Soft / SoftStep / PGS_Soft all solve soft
    # revolute + mouse joints; solve order inside the substep mirrors
    # src/solve_tgs_soft.c:207-231 — joints before contacts) ---
    jf = jcons_f_ref[:, :]
    jflags = jflags_ref[:, :]
    j_is_mouse = jflags[:, 0] > 0.0
    j_active = jflags[:, 1] > 0.0
    jcons = jk.JointCons(
        ia=ja, ib=jb, is_mouse=j_is_mouse, active=j_active,
        inv_mass_a=jf[:, 0], inv_i_a=jf[:, 1], inv_mass_b=jf[:, 2], inv_i_b=jf[:, 3],
        local_anchor_a=jf[:, 4:6], local_anchor_b=jf[:, 6:8],
        center_diff0=jf[:, 8:10], axial_mass=jf[:, 10],
        pm11=jf[:, 11], pm12=jf[:, 12], pm22=jf[:, 13],
        bias_coef=jf[:, 14], mass_coef=jf[:, 15], imp_coef=jf[:, 16],
        reference_angle=jf[:, 17], lower_angle=jf[:, 18], upper_angle=jf[:, 19],
        enable_limit=jflags[:, 2] > 0.0, enable_motor=jflags[:, 3] > 0.0,
        motor_speed=jf[:, 20], max_motor_torque=jf[:, 21],
        inertia_b=jf[:, 22], target=jf[:, 8:10],
    )
    jcolor = jcolor_ref[:, 0]
    jwa_f = jwritea_ref[:, :]
    jwb_f = jwriteb_ref[:, :]

    def jgather_rows(bs):
        rows_a = jnp.dot(joa_ref[:, :], bs, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        rows_b = jnp.dot(job_ref[:, :], bs, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return rows_a, rows_b

    def jcolor_apply(bs, out_a, out_b, updf):
        ua = updf * jwa_f
        ub = updf * jwb_f
        new_rows = tdot(joa_ref[:, :], out_a * ua) + tdot(job_ref[:, :], out_b * ub)
        written = tdot(joa_ref[:, :], ua) + tdot(job_ref[:, :], ub)
        return bs + written * (new_rows - bs)

    jwinner = jwinner_ref[:, 0] > 0.0

    def joint_color_loop(bs, jimp5, use_bias, solve_mouse):
        def body(k, carry):
            bs, jimp5 = carry
            rows_a, rows_b = jgather_rows(bs)
            vA, wA, dcA, qA = unpack_rows(rows_a)
            vB, wB, dcB, qB = unpack_rows(rows_b)
            imp = jk.JointImp(impulse=jimp5[:, 0:2], motor=jimp5[:, 2],
                              lower=jimp5[:, 3], upper=jimp5[:, 4])
            vA2, wA2, vB2, wB2, new_imp, imp2, scope = jk.solve_joint_core(
                jcons, vA, wA, vB, wB, qA, qB, dcA, dcB, imp, "soft",
                h, inv_h, use_bias, solve_mouse,
            )
            updf = ((jcolor == k) & scope & jwinner).astype(jnp.float32)[:, None]
            out_a = pack_rows(vA2, wA2, dcA, qA)
            out_b = pack_rows(vB2, wB2, dcB, qB)
            bs = jcolor_apply(bs, out_a, out_b, updf)
            new5 = jnp.concatenate(
                [new_imp, imp2.motor[:, None], imp2.lower[:, None], imp2.upper[:, None]],
                axis=-1,
            )
            jimp5 = jimp5 + updf * (new5 - jimp5)
            return (bs, jimp5)

        return jax.lax.fori_loop(0, n_joint_colors, body, (bs, jimp5))

    def jwarm(bs, jimp5):
        # joint warm start (revolute_joint.c:107-150, mouse_joint.c:85-107):
        # additive velocity deltas, applied as one transposed-product
        # scatter-add over all joints (order-free sum, like contact warm)
        from ..ops import math2d as m

        rows_a, rows_b = jgather_rows(bs)
        _, _, _, qA = unpack_rows(rows_a)
        _, _, _, qB = unpack_rows(rows_b)
        rA = m.rotate(qA, jcons.local_anchor_a)
        rB = m.rotate(qB, jcons.local_anchor_b)
        P = jimp5[:, 0:2]
        axial = jimp5[:, 2] + jimp5[:, 3] - jimp5[:, 4]
        axial = jnp.where(j_is_mouse, jimp5[:, 2], axial)
        # XLA applies warm start through the colored slot table: only active,
        # colored, winning joints reach a body (solvers/joints.py:warm_start_pass)
        act = jflags[:, 1:2] * jwinner_ref[:, :] * (jcolor_ref[:, :] >= 0).astype(jnp.float32)
        zc = jnp.zeros((J, 2), jnp.float32)
        z1 = jnp.zeros((J, 1), jnp.float32)
        dA = jnp.concatenate(
            [-jcons.inv_mass_a[:, None] * P,
             (-jcons.inv_i_a * (m.cross(rA, P) + axial))[:, None], zc, zc, z1],
            axis=-1,
        ) * act
        dB = jnp.concatenate(
            [jcons.inv_mass_b[:, None] * P,
             (jcons.inv_i_b * (m.cross(rB, P) + axial))[:, None], zc, zc, z1],
            axis=-1,
        ) * act
        delta = tdot(joa_ref[:, :], dA * jwa_f) + tdot(job_ref[:, :], dB * jwb_f)
        return bs + delta

    def contact_color_loop(bs, n_imp, t_imp, use_bias):
        def body(k, carry):
            bs, n_imp, t_imp = carry
            rows_a, rows_b = gather_rows(bs)
            vA, wA, dcA, qA = unpack_rows(rows_a)
            vB, wB, dcB, qB = unpack_rows(rows_b)
            vA2, wA2, vB2, wB2, n2, t2 = ck.solve_contact_core(
                cons, vA, wA, vB, wB, qA, qB, dcA, dcB, n_imp, t_imp, mode, inv_h, use_bias
            )
            updf = ((color == k) & active & winner).astype(jnp.float32)[:, None]
            out_a = pack_rows(vA2, wA2, dcA, qA)
            out_b = pack_rows(vB2, wB2, dcB, qB)
            bs = color_apply(bs, out_a, out_b, updf)
            n_imp = n_imp + updf * (n2 - n_imp)
            t_imp = t_imp + updf * (t2 - t_imp)
            return (bs, n_imp, t_imp)

        return jax.lax.fori_loop(0, n_colors, body, (bs, n_imp, t_imp))

    def warm(bs, n_imp, t_imp):
        # current rotated anchors (TGS_Soft, solve_common.c:276-326) or the
        # fixed prepare-time anchors (SoftStep, solve_soft_step.c:16-63);
        # per-point loop keeps everything rank-2 for Mosaic
        from ..ops import math2d as m

        if not fixed_warm:
            rows_a, rows_b = gather_rows(bs)
            _, _, _, qA = unpack_rows(rows_a)
            _, _, _, qB = unpack_rows(rows_b)
        tangent = m.right_perp(cons.normal)
        P_tot = jnp.zeros((C, 2), jnp.float32)
        tq_a = jnp.zeros((C,), jnp.float32)
        tq_b = jnp.zeros((C,), jnp.float32)
        for j in range(2):
            maskp = pmask_ref[:, j] * active_ref[:, 0]
            Pj = (n_imp[:, j] * maskp)[:, None] * cons.normal + (t_imp[:, j] * maskp)[:, None] * tangent
            if fixed_warm:
                rAj, rBj = cons.r_a0[j], cons.r_b0[j]
            else:
                rAj = m.rotate(qA, cons.local_anchor_a[j])
                rBj = m.rotate(qB, cons.local_anchor_b[j])
            P_tot = P_tot + Pj
            tq_a = tq_a + m.cross(rAj, Pj)
            tq_b = tq_b + m.cross(rBj, Pj)
        zc = jnp.zeros((C, 2), jnp.float32)
        z1 = jnp.zeros((C, 1), jnp.float32)
        dA = jnp.concatenate([-cons.inv_mass_a[:, None] * P_tot, (-cons.inv_i_a * tq_a)[:, None], zc, zc, z1], axis=-1)
        dB = jnp.concatenate([cons.inv_mass_b[:, None] * P_tot, (cons.inv_i_b * tq_b)[:, None], zc, zc, z1], axis=-1)
        # scatter-add of per-constraint deltas = transposed one-hot products
        # (multiple constraints per body sum, exactly like the XLA path)
        delta = tdot(oa_ref[:, :], dA) + tdot(ob_ref[:, :], dB)
        return bs + delta

    def integrate_velocities(bs):
        v = bs[:, 0:2]
        w = bs[:, 2:3]
        dyn = body_dyn_ref[:, :]
        v2 = (v + h * inv_mass_ref[:, :] * mass_grav_ref[:, :]) * damp_lin_ref[:, :]
        w2 = (w + h * inv_i_tau_ref[:, :]) * damp_ang_ref[:, :]
        v = v + dyn * (v2 - v)
        w = w + dyn * (w2 - w)
        return jnp.concatenate([v, w, bs[:, 3:]], axis=-1)

    def integrate_positions(bs):
        from ..ops import math2d as m

        v, w, dp, rot = bs[:, 0:2], bs[:, 2:3], bs[:, 3:5], bs[:, 5:7]
        mv = body_move_ref[:, :]
        dp = dp + mv * h * v
        rot2 = m.integrate_rot(rot, h * w[:, 0])
        rot = rot + mv * (rot2 - rot)
        return jnp.concatenate([v, w, dp, rot, bs[:, 7:8]], axis=-1)

    bs0 = bs_ref[:, :]
    n0 = n_imp0_ref[:, :]
    t0 = t_imp0_ref[:, :]
    j0 = jimp0_ref[:, :]

    if loop == "substep":
        # TGS_Soft / SoftStep substep loop (solve_tgs_soft.c:208-269):
        # joints solve before contacts inside every phase
        def substep(_, carry):
            bs, n_imp, t_imp, jimp5 = carry
            bs = integrate_velocities(bs)
            if warm_start:
                bs = jwarm(bs, jimp5)
                bs = warm(bs, n_imp, t_imp)
            bs, jimp5 = joint_color_loop(bs, jimp5, True, True)
            bs, n_imp, t_imp = contact_color_loop(bs, n_imp, t_imp, True)
            bs = integrate_positions(bs)
            if relax:
                bs, jimp5 = joint_color_loop(bs, jimp5, False, False)
                bs, n_imp, t_imp = contact_color_loop(bs, n_imp, t_imp, False)
            return (bs, n_imp, t_imp, jimp5)

        bs, n_imp, t_imp, jimp5 = jax.lax.fori_loop(
            0, substeps, substep, (bs0, n0, t0, j0))
    else:
        # PGS_Soft single-step loop (solve_pgs_soft.c:127-242): integrate and
        # warm start once, `substeps` biased velocity iterations, one position
        # integrate, `relax_iters` relax iterations
        bs = integrate_velocities(bs0)
        if warm_start:
            # PGS_Soft warms contacts before joints (solve_pgs_soft.c /
            # loops.py:solve_pgs_soft), the reverse of the substep loop
            bs = warm(bs, n0, t0)
            bs = jwarm(bs, j0)

        def vel_iter(_, carry):
            bs, n_imp, t_imp, jimp5 = carry
            bs, jimp5 = joint_color_loop(bs, jimp5, True, True)
            bs, n_imp, t_imp = contact_color_loop(bs, n_imp, t_imp, True)
            return (bs, n_imp, t_imp, jimp5)

        bs, n_imp, t_imp, jimp5 = jax.lax.fori_loop(0, substeps, vel_iter, (bs, n0, t0, j0))
        bs = integrate_positions(bs)

        def relax_iter(_, carry):
            bs, n_imp, t_imp, jimp5 = carry
            bs, jimp5 = joint_color_loop(bs, jimp5, False, False)
            bs, n_imp, t_imp = contact_color_loop(bs, n_imp, t_imp, False)
            return (bs, n_imp, t_imp, jimp5)

        bs, n_imp, t_imp, jimp5 = jax.lax.fori_loop(
            0, relax_iters, relax_iter, (bs, n_imp, t_imp, jimp5))

    bs_out_ref[:, :] = bs
    n_out_ref[:, :] = n_imp
    t_out_ref[:, :] = t_imp
    jimp_out_ref[:, :] = jimp5


def pack_joint_fields(jcons: jk.JointCons):
    """Flatten per-joint f32 fields into one [J, 23] matrix (column order
    must match the kernel's unpack) plus a [J, 4] flag matrix."""
    jc = lambda x: x[:, None]
    cols = [
        jc(jcons.inv_mass_a), jc(jcons.inv_i_a), jc(jcons.inv_mass_b), jc(jcons.inv_i_b),
        jcons.local_anchor_a, jcons.local_anchor_b, jcons.center_diff0,
        jc(jcons.axial_mass), jc(jcons.pm11), jc(jcons.pm12), jc(jcons.pm22),
        jc(jcons.bias_coef), jc(jcons.mass_coef), jc(jcons.imp_coef),
        jc(jcons.reference_angle), jc(jcons.lower_angle), jc(jcons.upper_angle),
        jc(jcons.motor_speed), jc(jcons.max_motor_torque), jc(jcons.inertia_b),
    ]
    flags = [
        jc(jcons.is_mouse), jc(jcons.active), jc(jcons.enable_limit), jc(jcons.enable_motor),
    ]
    return (
        jnp.concatenate(cols, axis=-1),
        jnp.concatenate([f.astype(jnp.float32) for f in flags], axis=-1),
    )


def pack_cons_fields(cons: ContactCons):
    """Flatten the per-contact f32 constraint fields into one [C, 37] matrix
    (column order must match the kernel's unpack)."""
    cols = [
        cons.inv_mass_a[:, None], cons.inv_i_a[:, None],
        cons.inv_mass_b[:, None], cons.inv_i_b[:, None],
        cons.normal, cons.friction[:, None],
        cons.local_anchor_a[:, 0], cons.local_anchor_a[:, 1],
        cons.local_anchor_b[:, 0], cons.local_anchor_b[:, 1],
        cons.r_a0[:, 0], cons.r_a0[:, 1],
        cons.r_b0[:, 0], cons.r_b0[:, 1],
        cons.separation, cons.adjusted_separation,
        cons.normal_mass, cons.tangent_mass,
        cons.bias_coef, cons.mass_coef, cons.imp_coef,
    ]
    return jnp.concatenate(cols, axis=-1)


def fused_solve(bodies, bs0, n_imp0, t_imp0, cons: ContactCons, gravity,
                ccolor, cmap, h, inv_h, cfg: SimConfig,
                jcons: jk.JointCons, jimp0: jk.JointImp, jcolor, jmap,
                interpret=False,
                mode=ck.TGS_SOFT, loop="substep", fixed_warm=False, relax_iters=0):
    """Run a fused solver loop for one world. Returns (bs, n_imp, t_imp, jimp).

    loop='substep' reproduces TGS_Soft (mode=TGS_SOFT, rotating warm anchors)
    and SoftStep (mode=SOFT_STEP, fixed_warm=True); loop='pgs' reproduces
    PGS_Soft (mode=PGS_SOFT): vel iterations + relax_iters relax passes.
    Joints (soft revolute + mouse) are always fused — a contact-only scene
    pays one [J=max_joints, B] pass per joint color, negligible for the
    default J=8 capacity."""
    B = cfg.max_bodies
    C = cfg.max_contacts

    dyn = ((bodies.type == 2) & bodies.alive).astype(jnp.float32)[:, None]
    move = ((bodies.type != 0) & bodies.alive).astype(jnp.float32)[:, None]
    mass_grav = bodies.force + bodies.mass[:, None] * bodies.gravity_scale[:, None] * gravity[None, :]
    inv_i_tau = (bodies.inv_inertia * bodies.torque)[:, None]
    damp_lin = (1.0 / (1.0 + h * bodies.linear_damping))[:, None]
    damp_ang = (1.0 / (1.0 + h * bodies.angular_damping))[:, None]

    J = cfg.max_joints

    kernel = partial(
        _kernel, B=B, C=C, n_colors=cfg.max_colors,
        n_joint_colors=cfg.joint_max_colors, substeps=cfg.iterations,
        relax=cfg.extra_iterations > 0, warm_start=cfg.warm_start, mode=mode,
        loop=loop, relax_iters=relax_iters, fixed_warm=fixed_warm,
    )

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM)

    from ..ops.gather import tgather

    dyn_b = (bodies.type == 2) & bodies.alive
    writea = tgather(dyn_b, cons.ia).astype(jnp.float32)[:, None]
    writeb = tgather(dyn_b, cons.ib).astype(jnp.float32)[:, None]
    jwritea = tgather(dyn_b, jcons.ia).astype(jnp.float32)[:, None]
    jwriteb = tgather(dyn_b, jcons.ib).astype(jnp.float32)[:, None]
    jcons_f, jflags = pack_joint_fields(jcons)
    jimp0_packed = jnp.concatenate(
        [jimp0.impulse, jimp0.motor[:, None], jimp0.lower[:, None], jimp0.upper[:, None]],
        axis=-1,
    )

    bs, n_imp, t_imp, jimp5 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, 8), jnp.float32),
            jax.ShapeDtypeStruct((C, 2), jnp.float32),
            jax.ShapeDtypeStruct((C, 2), jnp.float32),
            jax.ShapeDtypeStruct((J, 5), jnp.float32),
        ),
        in_specs=[smem(), smem()] + [vmem()] * 29,
        out_specs=(vmem(), vmem(), vmem(), vmem()),
        scratch_shapes=[
            pltpu.VMEM((C, B), jnp.float32),
            pltpu.VMEM((C, B), jnp.float32),
            pltpu.VMEM((J, B), jnp.float32),
            pltpu.VMEM((J, B), jnp.float32),
        ],
        # the default 16 MiB scoped-VMEM budget is conservative (v5e has
        # 128 MiB physical): the compiler's scoped allocation includes its
        # own matmul transpose buffers and loop temporaries (~6x our two
        # incidence scratches — the bench scene needs 23.6 MiB). Raise the
        # cap; the freeze() B*C gate reflects what measured compiles fit
        # (exp/pallas_vmem_probe.py).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.full((1, 1), h, jnp.float32), jnp.full((1, 1), inv_h, jnp.float32),
        bs0, gravity[None, :], dyn, move,
        bodies.inv_mass[:, None], mass_grav, inv_i_tau, damp_lin, damp_ang,
        cons.ia[:, None], cons.ib[:, None],
        pack_cons_fields(cons),
        cons.pmask.astype(jnp.float32),
        cons.active.astype(jnp.float32)[:, None],
        ccolor[:, None],
        writea, writeb,
        cmap.winner.astype(jnp.float32)[:, None],
        n_imp0, t_imp0,
        jcons.ia[:, None], jcons.ib[:, None],
        jcons_f, jflags,
        jcolor[:, None],
        jwritea, jwriteb,
        jmap.winner.astype(jnp.float32)[:, None],
        jimp0_packed,
    )
    jimp = jk.JointImp(impulse=jimp5[:, 0:2], motor=jimp5[:, 2],
                       lower=jimp5[:, 3], upper=jimp5[:, 4])
    return bs, n_imp, t_imp, jimp
