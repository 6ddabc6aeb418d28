"""The ten solver step scripts.

Each function reproduces one reference solver's iteration structure exactly
(files cited per function), recast as jit-compatible loops: `fori_loop` over
velocity iterations / substeps, colored constraint passes inside, shared
prepare/warm-start/integrate/finalize kernels from `common`.

Signature: solve(bodies, contacts, joints, colors, gravity, dt, config) ->
(bodies, contacts, joints), where colors = (ccolor, cmap, jcolor, jmap) is the
per-step coloring + scatter-free body maps (built in step.py).

All per-body solver state is threaded as ONE packed [B, 8] array (see
common.pack_body_state) so every colored pass costs two row-gathers and one
mapped apply - TPU row-gathers dominate this workload, so minimizing their
count is the main performance lever. Solver choice and iteration counts are
static (from SimConfig): each solver compiles to its own specialized program,
the analog of the reference's `switch (solverType)` (reference:
src/world.c:206-257).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import CONTACT_HERTZ, JOINT_HERTZ, SimConfig, SolverType
from ..ops import math2d as m
from ..state import Bodies
from . import contact_kernels as ck
from . import joints as jk
from .common import (
    sfori,
    colored_pass,
    finalize_positions,
    integrate_positions_packed,
    integrate_velocities_packed,
    ngs_pass,
    pack_body_state,
    prepare_contacts,
    store_impulses,
    unpack_body_state,
    warm_start_packed,
)

# carry layout threaded through all loops: (bs [B,8], n_imp, t_imp, joint_imp)


def _bucket(colors):
    """The contact color-major bucket table, or None on the dense path
    (step.py appends it to `colors` for bucketable solver/config combos)."""
    return colors[4] if len(colors) > 4 else None


def _jbucket(colors):
    """The joint color-major bucket table, or None on the dense path."""
    return colors[5] if len(colors) > 5 else None


def _cons_slice(cons, k, cap):
    sl = slice(k * cap, (k + 1) * cap)
    return type(cons)(*(x[sl] for x in cons))


def _slot_local(cmap, k, cap):
    slot_k = cmap.slot[:, k]
    return jnp.where(slot_k >= 0, slot_k - k * cap, -1)


def _warm_contacts(bs, cons, n, t, cfg, fixed_anchors=False):
    """warm_start_packed, statically skipped for contact-free scenes
    (config.solve_contacts — the mirror of the solve_joints skip)."""
    if not cfg.solve_contacts:
        return bs
    return warm_start_packed(bs, cons, n, t, fixed_anchors=fixed_anchors)


def _contact_gs(st, colors, cfg, cons, mode, inv_h, use_bias):
    if not cfg.solve_contacts:
        return st
    ccolor, cmap = colors[0], colors[1]
    bs, n, t, jimp = st
    if _bucket(colors) is not None:
        cap = cfg.contact_bucket_cap
        carry = (bs, n, t)
        for k in range(cfg.max_colors):
            carry = ck.gs_contact_pass_bucketed(
                carry, k, cap, _cons_slice(cons, k, cap), mode, inv_h, use_bias,
                _slot_local(cmap, k, cap), cmap.winner[k * cap:(k + 1) * cap],
            )
        bs, n, t = carry
    else:
        bs, n, t = colored_pass(
            cfg.max_colors,
            lambda c, k: ck.gs_contact_pass(c, k, cons, mode, inv_h, use_bias, ccolor, cmap),
            (bs, n, t),
        )
    return (bs, n, t, jimp)


def _joint_gs(st, colors, cfg, jcons, mode, h, inv_h, use_bias, solve_mouse=True, only_mouse=False):
    if not cfg.solve_joints:
        return st
    jcolor, jmap = colors[2], colors[3]
    bs, n, t, jimp = st
    if _jbucket(colors) is not None:
        cap = cfg.joint_bucket_cap
        carry = (bs, jimp)
        for k in range(cfg.joint_max_colors):
            carry = jk.solve_pass_bucketed(
                carry, k, cap, _cons_slice(jcons, k, cap), mode, h, inv_h, use_bias,
                _slot_local(jmap, k, cap), jmap.winner[k * cap:(k + 1) * cap],
                solve_mouse, only_mouse,
            )
        bs, jimp = carry
    else:
        bs, jimp = colored_pass(
            cfg.joint_max_colors,
            lambda c, k: jk.solve_pass(c, k, jcons, mode, h, inv_h, use_bias, jcolor, jmap, solve_mouse, only_mouse),
            (bs, jimp),
        )
    return (bs, n, t, jimp)


def _joint_warm(st, colors, cfg, jcons):
    if not cfg.solve_joints:
        return st
    jcolor, jmap = colors[2], colors[3]
    bs, n, t, jimp = st
    if _jbucket(colors) is not None:
        cap = cfg.joint_bucket_cap
        for k in range(cfg.joint_max_colors):
            bs = jk.warm_start_apply(
                bs, _cons_slice(jcons, k, cap), jk._imp_slice(jimp, k * cap, cap),
                _slot_local(jmap, k, cap),
            )
    else:
        bs = colored_pass(
            cfg.joint_max_colors,
            lambda c, k: jk.warm_start_pass(c, k, jcons, jimp, jmap),
            bs,
        )
    return (bs, n, t, jimp)


def _joint_ngs(st, colors, cfg, jcons):
    if not cfg.solve_joints:
        return st
    jcolor, jmap = colors[2], colors[3]
    bs, n, t, jimp = st
    if _jbucket(colors) is not None:
        cap = cfg.joint_bucket_cap
        for k in range(cfg.joint_max_colors):
            bs = jk.position_apply(bs, _cons_slice(jcons, k, cap), _slot_local(jmap, k, cap))
    else:
        bs = colored_pass(
            cfg.joint_max_colors,
            lambda c, k: jk.position_pass(c, k, jcons, jcolor, jmap),
            bs,
        )
    return (bs, n, t, jimp)


def _contact_ngs(st, colors, cfg, cons):
    if not cfg.solve_contacts:
        return st
    cmap = colors[1]
    bs, n, t, jimp = st
    if _bucket(colors) is not None:
        cap = cfg.contact_bucket_cap
        from .common import ngs_apply

        for k in range(cfg.max_colors):
            bs = ngs_apply(bs, _cons_slice(cons, k, cap), _slot_local(cmap, k, cap))
    else:
        bs = colored_pass(cfg.max_colors, lambda c, k: ngs_pass(c, cons, k, cmap), bs)
    return (bs, n, t, jimp)


def _init(bodies: Bodies):
    return pack_body_state(bodies.v, bodies.w, bodies.delta_pos, bodies.rot)


def _prep_contacts(bodies, contacts, colors, *, h, hertz, soft, warm_start):
    """prepare_contacts, permuted into color-major buckets when step.py
    appended a bucket table to `colors` (bucketed solve)."""
    cons, n, t = prepare_contacts(bodies, contacts, h=h, hertz=hertz, soft=soft, warm_start=warm_start)
    bucket = _bucket(colors)
    if bucket is not None:
        from .common import bucket_contacts

        cons, n, t = bucket_contacts(cons, n, t, bucket)
    return cons, n, t


def _prep_joints(bodies, joints, colors, *, h, hertz, soft, warm_start):
    """prepare_joints, bucketed when step.py appended a joint bucket table."""
    jcons, jimp = jk.prepare_joints(bodies, joints, h=h, hertz=hertz, soft=soft, warm_start=warm_start)
    jbucket = _jbucket(colors)
    if jbucket is not None:
        jcons, jimp = jk.bucket_joints(jcons, jimp, jbucket)
    return jcons, jimp


def _finish(bodies, contacts, joints, cons, jcons, st, bucket=None, jbucket=None):
    bs, n, t, jimp = st
    v, w, dp, rot = unpack_body_state(bs)
    bodies = finalize_positions(bodies, dp, rot, v, w)
    if bucket is not None:
        from .common import unbucket_impulses

        contacts = unbucket_impulses(contacts, cons, bucket, n, t)
    else:
        contacts = store_impulses(contacts, cons, n, t)
    if jbucket is not None:
        joints = jk.store_impulses_bucketed(joints, jcons, jbucket, jimp)
    else:
        joints = jk.store_impulses(joints, jcons, jimp)
    return bodies, contacts, joints


def solve_pgs(bodies, contacts, joints, colors, gravity, dt, cfg: SimConfig):
    """reference: src/solve_pgs.c:125-213 (box2d_lite style)."""
    h = dt
    inv_h = jnp.where(dt > 0, 1.0 / jnp.where(dt > 0, dt, 1.0), 0.0)
    bs = _init(bodies)
    bs = integrate_velocities_packed(bodies, bs, gravity, h)
    cons, n, t = _prep_contacts(bodies, contacts, colors, h=h, hertz=0.0, soft=False, warm_start=cfg.warm_start)
    jcons, jimp = _prep_joints(bodies, joints, colors, h=h, hertz=0.0, soft=False, warm_start=cfg.warm_start)
    st = (bs, n, t, jimp)
    if cfg.warm_start:
        st = (_warm_contacts(st[0], cons, n, t, cfg),) + st[1:]
        st = _joint_warm(st, colors, cfg, jcons)

    def it(_, st):
        st = _joint_gs(st, colors, cfg, jcons, "baumgarte", h, inv_h, True)
        st = _contact_gs(st, colors, cfg, cons, ck.PGS_BAUMGARTE, inv_h, True)
        return st

    st = sfori(cfg.iterations, it, st)
    st = (integrate_positions_packed(bodies, st[0], h),) + st[1:]
    return _finish(bodies, contacts, joints, cons, jcons, st, bucket=_bucket(colors), jbucket=_jbucket(colors))


def solve_pgs_ngs(bodies, contacts, joints, colors, gravity, dt, cfg: SimConfig):
    """reference: src/solve_pgs_ngs.c:149-255."""
    h = dt
    inv_h = jnp.where(dt > 0, 1.0 / jnp.where(dt > 0, dt, 1.0), 0.0)
    bs = _init(bodies)
    bs = integrate_velocities_packed(bodies, bs, gravity, h)
    cons, n, t = _prep_contacts(bodies, contacts, colors, h=h, hertz=0.0, soft=False, warm_start=cfg.warm_start)
    jcons, jimp = _prep_joints(bodies, joints, colors, h=h, hertz=0.0, soft=False, warm_start=cfg.warm_start)
    st = (bs, n, t, jimp)
    if cfg.warm_start:
        st = (_warm_contacts(st[0], cons, n, t, cfg),) + st[1:]
        st = _joint_warm(st, colors, cfg, jcons)

    def it(_, st):
        st = _joint_gs(st, colors, cfg, jcons, "rigid", h, inv_h, True)
        st = _contact_gs(st, colors, cfg, cons, ck.PGS_PLAIN, inv_h, True)
        return st

    st = sfori(cfg.iterations, it, st)
    st = (integrate_positions_packed(bodies, st[0], h),) + st[1:]

    def pos_it(_, st):
        st = _joint_ngs(st, colors, cfg, jcons)
        st = _contact_ngs(st, colors, cfg, cons)
        return st

    st = sfori(cfg.extra_iterations, pos_it, st)
    return _finish(bodies, contacts, joints, cons, jcons, st, bucket=_bucket(colors), jbucket=_jbucket(colors))


def solve_pgs_ngs_block(bodies, contacts, joints, colors, gravity, dt, cfg: SimConfig):
    """reference: src/solve_pgs_ngs_block.c:892-963 (the default solver)."""
    h = dt
    inv_h = jnp.where(dt > 0, 1.0 / jnp.where(dt > 0, dt, 1.0), 0.0)
    ccolor, cmap = colors[0], colors[1]
    bs = _init(bodies)
    bs = integrate_velocities_packed(bodies, bs, gravity, h)
    cons, n, t = _prep_contacts(bodies, contacts, colors, h=h, hertz=0.0, soft=False, warm_start=cfg.warm_start)
    # prepare_block is elementwise over cons rows, so its extras inherit the
    # bucketed layout when cons is bucketed
    vbias, kmat, bmass, use_block, pmask_eff = ck.prepare_block(cons, inv_h)
    jcons, jimp = _prep_joints(bodies, joints, colors, h=h, hertz=0.0, soft=False, warm_start=cfg.warm_start)
    st = (bs, n, t, jimp)
    # warm start is applied unconditionally inside solver creation
    # (block.c:281-319); impulses are zero when warm_start is off
    st = (_warm_contacts(st[0], cons, n, t, cfg, fixed_anchors=True),) + st[1:]
    st = _joint_warm(st, colors, cfg, jcons)

    def it(_, st):
        st = _joint_gs(st, colors, cfg, jcons, "rigid", h, inv_h, True)
        bs, n, t, jimp = st
        if not cfg.solve_contacts:
            pass
        elif _bucket(colors) is not None:
            cap = cfg.contact_bucket_cap
            for k in range(cfg.max_colors):
                o = k * cap
                sl = slice(o, o + cap)
                bs, n2, t2 = ck.block_velocity_pass(
                    (bs, n[sl], t[sl]), k, _cons_slice(cons, k, cap),
                    vbias[sl], kmat[sl], bmass[sl], use_block[sl], pmask_eff[sl],
                    None, None, direct=(_slot_local(cmap, k, cap), cmap.winner[sl]),
                )
                n = n.at[sl].set(n2)
                t = t.at[sl].set(t2)
        else:
            bs, n, t = colored_pass(
                cfg.max_colors,
                lambda c, k: ck.block_velocity_pass(c, k, cons, vbias, kmat, bmass, use_block, pmask_eff, ccolor, cmap),
                (bs, n, t),
            )
        return (bs, n, t, jimp)

    st = sfori(cfg.iterations, it, st)
    st = (integrate_positions_packed(bodies, st[0], h),) + st[1:]

    def pos_it(_, st):
        bs, n, t, jimp = st
        if not cfg.solve_contacts:
            pass
        elif _bucket(colors) is not None:
            cap = cfg.contact_bucket_cap
            for k in range(cfg.max_colors):
                sl = slice(k * cap, (k + 1) * cap)
                bs = ck.block_position_pass(
                    bs, k, _cons_slice(cons, k, cap), use_block[sl],
                    None, None, direct=(_slot_local(cmap, k, cap), cmap.winner[sl]),
                )
        else:
            bs = colored_pass(
                cfg.max_colors,
                lambda c, k: ck.block_position_pass(c, k, cons, use_block, ccolor, cmap),
                bs,
            )
        st = (bs, n, t, jimp)
        st = _joint_ngs(st, colors, cfg, jcons)
        return st

    st = sfori(cfg.extra_iterations, pos_it, st)
    return _finish(bodies, contacts, joints, cons, jcons, st, bucket=_bucket(colors), jbucket=_jbucket(colors))


def solve_pgs_soft(bodies, contacts, joints, colors, gravity, dt, cfg: SimConfig):
    """reference: src/solve_pgs_soft.c:127-242."""
    if cfg.use_pallas_solver:
        return _solve_pallas(bodies, contacts, joints, colors, gravity, dt, cfg,
                             mode=ck.PGS_SOFT, loop="pgs", fixed_warm=False,
                             hertz_factor=0.333, joint_hertz_factor=0.5,
                             joint_warm=cfg.warm_start)
    h = dt
    inv_h = jnp.where(dt > 0, 1.0 / jnp.where(dt > 0, dt, 1.0), 0.0)
    contact_hertz = jnp.minimum(CONTACT_HERTZ, 0.333 * inv_h)
    joint_hertz = jnp.minimum(JOINT_HERTZ, 0.5 * inv_h)
    bs = _init(bodies)
    bs = integrate_velocities_packed(bodies, bs, gravity, h)
    cons, n, t = _prep_contacts(bodies, contacts, colors, h=h, hertz=contact_hertz, soft=True, warm_start=cfg.warm_start)
    jcons, jimp = _prep_joints(bodies, joints, colors, h=h, hertz=joint_hertz, soft=True, warm_start=cfg.warm_start)
    st = (bs, n, t, jimp)
    if cfg.warm_start:
        st = (_warm_contacts(st[0], cons, n, t, cfg),) + st[1:]
        st = _joint_warm(st, colors, cfg, jcons)

    def it(_, st):
        st = _joint_gs(st, colors, cfg, jcons, "soft", h, inv_h, True)
        st = _contact_gs(st, colors, cfg, cons, ck.PGS_SOFT, inv_h, True)
        return st

    st = sfori(cfg.iterations, it, st)
    st = (integrate_positions_packed(bodies, st[0], h),) + st[1:]

    def relax_it(_, st):
        st = _joint_gs(st, colors, cfg, jcons, "soft", h, inv_h, False, solve_mouse=False)
        st = _contact_gs(st, colors, cfg, cons, ck.PGS_SOFT, inv_h, False)
        return st

    st = sfori(cfg.extra_iterations, relax_it, st)
    return _finish(bodies, contacts, joints, cons, jcons, st, bucket=_bucket(colors), jbucket=_jbucket(colors))


def solve_jacobi(bodies, contacts, joints, colors, gravity, dt, cfg: SimConfig):
    """reference: src/solve_jacobi.c:134-292. Contacts solved Jacobi (deltas
    accumulated, applied per iteration); joints stay Gauss-Seidel."""
    h = dt
    inv_h = jnp.where(dt > 0, 1.0 / jnp.where(dt > 0, dt, 1.0), 0.0)
    contact_hertz = jnp.minimum(CONTACT_HERTZ, 0.333 * inv_h)
    joint_hertz = jnp.minimum(JOINT_HERTZ, 0.5 * inv_h)
    bs = _init(bodies)
    bs = integrate_velocities_packed(bodies, bs, gravity, h)
    cons, n, t = prepare_contacts(bodies, contacts, h=h, hertz=contact_hertz, soft=True, warm_start=cfg.warm_start)
    jcons, jimp = _prep_joints(bodies, joints, colors, h=h, hertz=joint_hertz, soft=True, warm_start=cfg.warm_start)
    st = (bs, n, t, jimp)
    if cfg.warm_start:
        st = (_warm_contacts(st[0], cons, n, t, cfg),) + st[1:]
        st = _joint_warm(st, colors, cfg, jcons)

    def it_factory(use_bias):
        def it(_, st):
            st = _joint_gs(st, colors, cfg, jcons, "soft", h, inv_h, use_bias, solve_mouse=use_bias)
            bs, n, t, jimp = st
            if cfg.solve_contacts:
                bs, n, t = ck.jacobi_contact_pass(bs, cons, n, t, ck.JACOBI_SOFT, inv_h, use_bias)
            return (bs, n, t, jimp)

        return it

    st = sfori(cfg.iterations, it_factory(True), st)
    st = (integrate_positions_packed(bodies, st[0], h),) + st[1:]
    st = sfori(cfg.extra_iterations, it_factory(False), st)
    return _finish(bodies, contacts, joints, cons, jcons, st, bucket=_bucket(colors), jbucket=_jbucket(colors))


def _substep_soft(bodies, contacts, joints, colors, gravity, dt, cfg, mode, joint_hertz_factor, fixed_warm):
    """Shared skeleton of TGS_Soft (solve_tgs_soft.c:138-280) and SoftStep
    (solve_soft_step.c:182-311): prepare once, then per substep integrate
    velocities -> warm start -> biased solve -> integrate positions -> relax.
    """
    h = dt / cfg.iterations
    inv_h = jnp.where(dt > 0, cfg.iterations / jnp.where(dt > 0, dt, 1.0), 0.0)
    contact_hertz = jnp.minimum(CONTACT_HERTZ, 0.25 * inv_h)
    joint_hertz = jnp.minimum(JOINT_HERTZ, joint_hertz_factor * inv_h)

    bs = _init(bodies)
    cons, n, t = _prep_contacts(bodies, contacts, colors, h=h, hertz=contact_hertz, soft=True, warm_start=cfg.warm_start)
    jcons, jimp = _prep_joints(bodies, joints, colors, h=h, hertz=joint_hertz, soft=True, warm_start=True)
    st = (bs, n, t, jimp)

    def substep(_, st):
        bs, n, t, jimp = st
        bs = integrate_velocities_packed(bodies, bs, gravity, h)
        st = (bs, n, t, jimp)
        if cfg.warm_start:
            st = _joint_warm(st, colors, cfg, jcons)
            bs, n, t, jimp = st
            bs = _warm_contacts(bs, cons, n, t, cfg, fixed_anchors=fixed_warm)
            st = (bs, n, t, jimp)
        st = _joint_gs(st, colors, cfg, jcons, "soft", h, inv_h, True)
        st = _contact_gs(st, colors, cfg, cons, mode, inv_h, True)
        st = (integrate_positions_packed(bodies, st[0], h),) + st[1:]
        if cfg.extra_iterations > 0:
            st = _joint_gs(st, colors, cfg, jcons, "soft", h, inv_h, False, solve_mouse=False)
            st = _contact_gs(st, colors, cfg, cons, mode, inv_h, False)
        return st

    st = sfori(cfg.iterations, substep, st)
    return _finish(bodies, contacts, joints, cons, jcons, st, bucket=_bucket(colors), jbucket=_jbucket(colors))


def solve_tgs_soft(bodies, contacts, joints, colors, gravity, dt, cfg):
    """reference: src/solve_tgs_soft.c:138-280 (became Box2D v3's solver)."""
    if cfg.use_pallas_solver:
        return _solve_tgs_soft_pallas(bodies, contacts, joints, colors, gravity, dt, cfg)
    return _substep_soft(bodies, contacts, joints, colors, gravity, dt, cfg, ck.TGS_SOFT, 0.125, fixed_warm=False)


def _solve_pallas(bodies, contacts, joints, colors, gravity, dt, cfg, *,
                  mode, loop, fixed_warm, hertz_factor, joint_hertz_factor,
                  joint_warm=True):
    """Fused VMEM path (solvers/pallas_solver.py): the whole solver loop —
    soft contacts AND soft joints (revolute + mouse) — in one kernel."""
    import jax as _jax

    from .pallas_solver import fused_solve

    if loop == "substep":
        h = dt / cfg.iterations
        inv_h = jnp.where(dt > 0, cfg.iterations / jnp.where(dt > 0, dt, 1.0), 0.0)
    else:
        h = dt
        inv_h = jnp.where(dt > 0, 1.0 / jnp.where(dt > 0, dt, 1.0), 0.0)
    contact_hertz = jnp.minimum(CONTACT_HERTZ, hertz_factor * inv_h)
    joint_hertz = jnp.minimum(JOINT_HERTZ, joint_hertz_factor * inv_h)
    cons, n, t = prepare_contacts(bodies, contacts, h=h, hertz=contact_hertz, soft=True, warm_start=cfg.warm_start)
    jcons, jimp = jk.prepare_joints(bodies, joints, h=h, hertz=joint_hertz, soft=True, warm_start=joint_warm)
    bs0 = _init(bodies)
    ccolor, cmap, jcolor, jmap = colors[0], colors[1], colors[2], colors[3]
    interpret = _jax.default_backend() not in ("tpu", "axon")
    bs, n, t, jimp = fused_solve(
        bodies, bs0, n, t, cons, gravity, ccolor, cmap, h, inv_h, cfg,
        jcons, jimp, jcolor, jmap,
        interpret=interpret, mode=mode, loop=loop, fixed_warm=fixed_warm,
        relax_iters=cfg.extra_iterations,
    )
    return _finish(bodies, contacts, joints, cons, jcons, (bs, n, t, jimp))


def _solve_tgs_soft_pallas(bodies, contacts, joints, colors, gravity, dt, cfg):
    # joint prepare keeps stored impulses unconditionally in the substep
    # solvers (_substep_soft passes warm_start=True)
    return _solve_pallas(bodies, contacts, joints, colors, gravity, dt, cfg,
                         mode=ck.TGS_SOFT, loop="substep", fixed_warm=False,
                         hertz_factor=0.25, joint_hertz_factor=0.125)


def solve_soft_step(bodies, contacts, joints, colors, gravity, dt, cfg):
    """reference: src/solve_soft_step.c:182-311 (TGS_Soft with fixed anchors)."""
    if cfg.use_pallas_solver:
        return _solve_pallas(bodies, contacts, joints, colors, gravity, dt, cfg,
                             mode=ck.SOFT_STEP, loop="substep", fixed_warm=True,
                             hertz_factor=0.25, joint_hertz_factor=0.25)
    return _substep_soft(bodies, contacts, joints, colors, gravity, dt, cfg, ck.SOFT_STEP, 0.25, fixed_warm=True)


def solve_tgs_ngs(bodies, contacts, joints, colors, gravity, dt, cfg: SimConfig):
    """reference: src/solve_tgs_ngs.c:207-317."""
    h = dt / cfg.iterations
    inv_h = jnp.where(dt > 0, cfg.iterations / jnp.where(dt > 0, dt, 1.0), 0.0)
    bs = _init(bodies)
    cons, n, t = _prep_contacts(bodies, contacts, colors, h=h, hertz=0.0, soft=False, warm_start=cfg.warm_start)
    jcons, jimp = _prep_joints(bodies, joints, colors, h=h, hertz=0.0, soft=False, warm_start=cfg.warm_start)
    st = (bs, n, t, jimp)

    def substep(_, st):
        bs, n, t, jimp = st
        bs = integrate_velocities_packed(bodies, bs, gravity, h)
        st = (bs, n, t, jimp)
        if cfg.warm_start:
            st = _joint_warm(st, colors, cfg, jcons)
            bs, n, t, jimp = st
            bs = _warm_contacts(bs, cons, n, t, cfg)
            st = (bs, n, t, jimp)
        st = _joint_gs(st, colors, cfg, jcons, "rigid", h, inv_h, True)
        st = _contact_gs(st, colors, cfg, cons, ck.TGS_RIGID, inv_h, True)
        st = (integrate_positions_packed(bodies, st[0], h),) + st[1:]
        st = _joint_ngs(st, colors, cfg, jcons)
        st = _contact_ngs(st, colors, cfg, cons)
        return st

    st = sfori(cfg.iterations, substep, st)
    return _finish(bodies, contacts, joints, cons, jcons, st, bucket=_bucket(colors), jbucket=_jbucket(colors))


def solve_tgs_sticky(bodies, contacts, joints, colors, gravity, dt, cfg: SimConfig):
    """reference: src/solve_tgs_sticky.c:313-417. No warm starting; persistent
    friction anchors; relax iterations AFTER positions are finalized."""
    h = dt / cfg.iterations
    inv_h = jnp.where(dt > 0, cfg.iterations / jnp.where(dt > 0, dt, 1.0), 0.0)
    ccolor, cmap = colors[0], colors[1]
    bs = _init(bodies)
    # sticky has no warm starting for contacts (sticky.c:59-60)
    cons, n, t = _prep_contacts(bodies, contacts, colors, h=h, hertz=0.0, soft=False, warm_start=False)
    jcons, jimp = _prep_joints(bodies, joints, colors, h=h, hertz=0.0, soft=False, warm_start=False)
    lfa, lfb, tsep, stm, fric_store = ck.prepare_sticky(bodies.position, contacts, cons, bodies.rot)
    fric_persisted = jnp.ones_like(cons.active)

    def sticky_gs(st5, use_bias):
        if not cfg.solve_contacts:
            return st5
        bs, n, t, jimp, fp = st5
        bs, n, t, fp = colored_pass(
            cfg.max_colors,
            lambda c, k: ck.sticky_velocity_pass(c, k, cons, lfa, lfb, tsep, stm, inv_h, use_bias, ccolor, cmap),
            (bs, n, t, fp),
        )
        return (bs, n, t, jimp, fp)

    st = (bs, n, t, jimp, fric_persisted)

    def substep(_, st):
        bs, n, t, jimp, fp = st
        bs = integrate_velocities_packed(bodies, bs, gravity, h)
        st4 = (bs, n, t, jimp)
        st4 = _joint_gs(st4, colors, cfg, jcons, "baumgarte", h, inv_h, True)
        st = st4 + (fp,)
        st = sticky_gs(st, True)
        st = (integrate_positions_packed(bodies, st[0], h),) + st[1:]
        return st

    st = sfori(cfg.iterations, substep, st)

    # finalize positions, then relax with zeroed deltas (sticky.c:389-410)
    bs, n, t, jimp, fp = st
    v, w, dp, rot = unpack_body_state(bs)
    bodies_out = finalize_positions(bodies, dp, rot, v, w)
    bs = pack_body_state(v, w, jnp.zeros_like(dp), rot)
    st = (bs, n, t, jimp, fp)

    def relax(_, st):
        bs, n, t, jimp, fp = st
        st4 = (bs, n, t, jimp)
        st4 = _joint_gs(st4, colors, cfg, jcons, "baumgarte", h, inv_h, False)
        st = st4 + (fp,)
        return sticky_gs(st, False)

    st = sfori(cfg.extra_iterations, relax, st)
    bs, n, t, jimp, fp = st
    v, w, _, _ = unpack_body_state(bs)

    bodies_out = dataclasses.replace(bodies_out, v=v, w=w)
    contacts = store_impulses(contacts, cons, n, t)
    fa_n, fb_n, faa, fab = fric_store
    contacts = dataclasses.replace(
        contacts,
        friction_normal_a=fa_n, friction_normal_b=fb_n,
        friction_anchor_a=faa, friction_anchor_b=fab,
        friction_persisted=fp & cons.active,
    )
    if _jbucket(colors) is not None:
        joints = jk.store_impulses_bucketed(joints, jcons, _jbucket(colors), jimp)
    else:
        joints = jk.store_impulses(joints, jcons, jimp)
    return bodies_out, contacts, joints


def solve_xpbd(bodies, contacts, joints, colors, gravity, dt, cfg: SimConfig):
    """reference: src/solve_xpbd.c:342-530 (Mueller et al. 2020)."""
    h = dt / cfg.iterations
    inv_h = jnp.where(dt > 0, cfg.iterations / jnp.where(dt > 0, dt, 1.0), 0.0)
    ccolor, cmap, jcolor, jmap = colors[0], colors[1], colors[2], colors[3]
    bs = _init(bodies)
    cons, n, t = _prep_contacts(bodies, contacts, colors, h=h, hertz=0.0, soft=False, warm_start=False)
    jcons, jimp = _prep_joints(bodies, joints, colors, h=h, hertz=0.0, soft=False, warm_start=False)

    moving = bodies.alive & (bodies.type != 0)
    dyn = bodies.alive & (bodies.type == 2)

    def substep(_, st):
        bs, n, t, jimp = st
        # integrate velocities AND positions immediately (xpbd.c:408-449)
        bs = integrate_velocities_packed(bodies, bs, gravity, h)
        v, w, dp, rot = unpack_body_state(bs)
        rot0 = rot
        dp0 = dp
        dp = jnp.where(moving[:, None], dp + h * v, dp)
        rot = jnp.where(moving[:, None], m.integrate_rot(rot, h * w), rot)
        bs = pack_body_state(v, w, dp, rot)

        # joint position projection (+ mouse velocity solve, joint.c:450-465)
        if not cfg.solve_joints:
            pass
        elif _jbucket(colors) is not None:
            jcap = cfg.joint_bucket_cap
            for k in range(cfg.joint_max_colors):
                bs = jk.xpbd_apply(bs, _cons_slice(jcons, k, jcap), inv_h, _slot_local(jmap, k, jcap))
        else:
            bs = colored_pass(
                cfg.joint_max_colors,
                lambda c, k: jk.xpbd_pass(c, k, jcons, inv_h, jcolor, jmap),
                bs,
            )
        st4 = (bs, n, t, jimp)
        st4 = _joint_gs(st4, colors, cfg, jcons, "rigid", h, inv_h, True, solve_mouse=True, only_mouse=True)
        bs, n, t, jimp = st4

        # contact position projection
        if not cfg.solve_contacts:
            pass
        elif _bucket(colors) is not None:
            cap = cfg.contact_bucket_cap
            for k in range(cfg.max_colors):
                o = k * cap
                bs, n2, t2 = ck.xpbd_position_pass(
                    (bs, n[o:o + cap], t[o:o + cap]), k, _cons_slice(cons, k, cap), h,
                    None, None, direct=(_slot_local(cmap, k, cap), cmap.winner[o:o + cap]),
                )
                n = n.at[o:o + cap].set(n2)
                t = t.at[o:o + cap].set(t2)
        else:
            bs, n, t = colored_pass(
                cfg.max_colors,
                lambda c, k: ck.xpbd_position_pass(c, k, cons, h, ccolor, cmap),
                (bs, n, t),
            )

        # derive velocities (xpbd.c:465-489)
        v, w, dp, rot = unpack_body_state(bs)
        v = jnp.where(dyn[:, None], inv_h * (dp - dp0), v)
        w = jnp.where(dyn, m.compute_angular_velocity(rot0, rot, inv_h), w)
        bs = pack_body_state(v, w, dp, rot)

        # relax contact velocities
        if not cfg.solve_contacts:
            pass
        elif _bucket(colors) is not None:
            cap = cfg.contact_bucket_cap
            for k in range(cfg.max_colors):
                o = k * cap
                bs, n2, t2 = ck.xpbd_velocity_pass(
                    (bs, n[o:o + cap], t[o:o + cap]), k, _cons_slice(cons, k, cap), h, inv_h,
                    None, None, direct=(_slot_local(cmap, k, cap), cmap.winner[o:o + cap]),
                )
                n = n.at[o:o + cap].set(n2)
                t = t.at[o:o + cap].set(t2)
        else:
            bs, n, t = colored_pass(
                cfg.max_colors,
                lambda c, k: ck.xpbd_velocity_pass(c, k, cons, h, inv_h, ccolor, cmap),
                (bs, n, t),
            )
        return (bs, n, t, jimp)

    st = sfori(cfg.iterations, substep, (bs, n, t, jimp))
    bs, n, t, jimp = st
    v, w, dp, rot = unpack_body_state(bs)

    # finalize only dynamic bodies (xpbd.c:497-512)
    position = jnp.where(dyn[:, None], bodies.position + dp, bodies.position)
    origin = jnp.where(dyn[:, None], position - m.rotate(rot, bodies.local_center), bodies.origin)
    bodies_out = dataclasses.replace(
        bodies, position=position, origin=origin, rot=rot,
        delta_pos=jnp.zeros_like(dp), delta_pos0=jnp.zeros_like(dp),
        v=v, w=w, force=jnp.zeros_like(bodies.force), torque=jnp.zeros_like(bodies.torque),
    )
    # impulses stored scaled by inv_h for reporting only (xpbd.c:514-527)
    if _bucket(colors) is not None:
        from .common import unbucket_impulses

        contacts = unbucket_impulses(contacts, cons, _bucket(colors), n * inv_h, t * inv_h)
    else:
        contacts = store_impulses(contacts, cons, n * inv_h, t * inv_h)
    if _jbucket(colors) is not None:
        joints = jk.store_impulses_bucketed(joints, jcons, _jbucket(colors), jimp)
    else:
        joints = jk.store_impulses(joints, jcons, jimp)
    return bodies_out, contacts, joints


SOLVERS = {
    SolverType.JACOBI: solve_jacobi,
    SolverType.PGS: solve_pgs,
    SolverType.PGS_NGS: solve_pgs_ngs,
    SolverType.PGS_NGS_BLOCK: solve_pgs_ngs_block,
    SolverType.PGS_SOFT: solve_pgs_soft,
    SolverType.SOFT_STEP: solve_soft_step,
    SolverType.TGS_STICKY: solve_tgs_sticky,
    SolverType.TGS_NGS: solve_tgs_ngs,
    SolverType.TGS_SOFT: solve_tgs_soft,
    SolverType.XPBD: solve_xpbd,
}
