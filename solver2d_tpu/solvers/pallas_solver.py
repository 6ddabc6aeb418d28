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
  gather formulation (adding exact zeros).

Per-contact math reuses `contact_kernels.solve_contact_core` — the exact same
jnp code as the XLA path, so physics cannot diverge between backends.

Feasible sizes: only two persistent [C, B] f32 incidence matrices remain
(round 1 kept four plus per-color [B,C] select temporaries, bounding B*C at
~131K); scoped VMEM (16 MB) now bounds B*C at ~262K elements — this covers
the official bench scene (216 bodies x 896 contacts = 193K). Enable with
SimConfig(use_pallas_solver=True) (contacts only; worlds with live joints
fall back to the XLA path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from . import contact_kernels as ck
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
    # outputs
    bs_out_ref, n_out_ref, t_out_ref,
    # scratch
    oa_ref, ob_ref,    # [C, B] one-hot f32
    *, B, C, n_colors, substeps, relax, warm_start, mode,
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
        rows_a = jnp.dot(oa_ref[:, :], bs, preferred_element_type=jnp.float32)
        rows_b = jnp.dot(ob_ref[:, :], bs, preferred_element_type=jnp.float32)
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
        return jax.lax.dot_general(onehot, rhs, _TDOT, preferred_element_type=jnp.float32)

    wa_f = writea_ref[:, :]
    wb_f = writeb_ref[:, :]

    def color_apply(bs, out_a, out_b, updf):
        ua = updf * wa_f
        ub = updf * wb_f
        new_rows = tdot(oa_ref[:, :], out_a * ua) + tdot(ob_ref[:, :], out_b * ub)
        written = tdot(oa_ref[:, :], ua) + tdot(ob_ref[:, :], ub)  # [B,1] in {0,1}
        return bs + written * (new_rows - bs)

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

    if loop == "substep":
        # TGS_Soft / SoftStep substep loop (solve_tgs_soft.c:208-269)
        def substep(_, carry):
            bs, n_imp, t_imp = carry
            bs = integrate_velocities(bs)
            if warm_start:
                bs = warm(bs, n_imp, t_imp)
            bs, n_imp, t_imp = contact_color_loop(bs, n_imp, t_imp, True)
            bs = integrate_positions(bs)
            if relax:
                bs, n_imp, t_imp = contact_color_loop(bs, n_imp, t_imp, False)
            return (bs, n_imp, t_imp)

        bs, n_imp, t_imp = jax.lax.fori_loop(0, substeps, substep, (bs0, n0, t0))
    else:
        # PGS_Soft single-step loop (solve_pgs_soft.c:127-242): integrate and
        # warm start once, `substeps` biased velocity iterations, one position
        # integrate, `relax_iters` relax iterations
        bs = integrate_velocities(bs0)
        if warm_start:
            bs = warm(bs, n0, t0)

        def vel_iter(_, carry):
            bs, n_imp, t_imp = carry
            return contact_color_loop(bs, n_imp, t_imp, True)

        bs, n_imp, t_imp = jax.lax.fori_loop(0, substeps, vel_iter, (bs, n0, t0))
        bs = integrate_positions(bs)

        def relax_iter(_, carry):
            bs, n_imp, t_imp = carry
            return contact_color_loop(bs, n_imp, t_imp, False)

        bs, n_imp, t_imp = jax.lax.fori_loop(0, relax_iters, relax_iter, (bs, n_imp, t_imp))

    bs_out_ref[:, :] = bs
    n_out_ref[:, :] = n_imp
    t_out_ref[:, :] = t_imp


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


def contact_solve(bodies, bs0, n_imp0, t_imp0, cons: ContactCons, gravity,
                  ccolor, cmap, h, inv_h, cfg: SimConfig, interpret=False,
                  mode=ck.TGS_SOFT, loop="substep", fixed_warm=False, relax_iters=0):
    """Run a fused solver loop for one world. Returns (bs, n_imp, t_imp).

    loop='substep' reproduces TGS_Soft (mode=TGS_SOFT, rotating warm anchors)
    and SoftStep (mode=SOFT_STEP, fixed_warm=True); loop='pgs' reproduces
    PGS_Soft (mode=PGS_SOFT): vel iterations + relax_iters relax passes."""
    B = cfg.max_bodies
    C = cfg.max_contacts

    dyn = ((bodies.type == 2) & bodies.alive).astype(jnp.float32)[:, None]
    move = ((bodies.type != 0) & bodies.alive).astype(jnp.float32)[:, None]
    mass_grav = bodies.force + bodies.mass[:, None] * bodies.gravity_scale[:, None] * gravity[None, :]
    inv_i_tau = (bodies.inv_inertia * bodies.torque)[:, None]
    damp_lin = (1.0 / (1.0 + h * bodies.linear_damping))[:, None]
    damp_ang = (1.0 / (1.0 + h * bodies.angular_damping))[:, None]

    kernel = partial(
        _kernel, B=B, C=C, n_colors=cfg.max_colors, substeps=cfg.iterations,
        relax=cfg.extra_iterations > 0, warm_start=cfg.warm_start, mode=mode,
        loop=loop, relax_iters=relax_iters, fixed_warm=fixed_warm,
    )

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM)

    from ..ops.gather import tgather

    dyn_b = (bodies.type == 2) & bodies.alive
    writea = tgather(dyn_b, cons.ia).astype(jnp.float32)[:, None]
    writeb = tgather(dyn_b, cons.ib).astype(jnp.float32)[:, None]

    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, 8), jnp.float32),
            jax.ShapeDtypeStruct((C, 2), jnp.float32),
            jax.ShapeDtypeStruct((C, 2), jnp.float32),
        ),
        in_specs=[smem(), smem()] + [vmem()] * 20,
        out_specs=(vmem(), vmem(), vmem()),
        scratch_shapes=[
            pltpu.VMEM((C, B), jnp.float32),
            pltpu.VMEM((C, B), jnp.float32),
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
    )
    return out


def tgs_soft_contact_solve(*args, **kwargs):
    """Back-compat alias: the TGS_Soft configuration of `contact_solve`."""
    return contact_solve(*args, **kwargs, mode=ck.TGS_SOFT, loop="substep")
