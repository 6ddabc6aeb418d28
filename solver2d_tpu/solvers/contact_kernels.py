"""Parametric contact velocity-solve kernels.

One core kernel covers the reference's per-solver contact sweeps — they differ
only in anchor handling, separation source, and bias model:

- PGS Baumgarte        (reference: src/solve_pgs.c:17-122)
- plain PGS            (reference: src/solve_pgs_ngs.c:16-124)
- PGS soft / Jacobi    (reference: src/solve_pgs_soft.c:16-125, solve_jacobi.c:21-132)
- SoftStep fixed-TGS   (reference: src/solve_soft_step.c:66-177)
- TGS soft             (reference: src/solve_tgs_soft.c:17-135)
- TGS rigid            (reference: src/solve_tgs_ngs.c:91-201)

Specialized kernels: 2x2 block LCP (src/solve_pgs_ngs_block.c), TGS sticky
(src/solve_tgs_sticky.c), XPBD (src/solve_xpbd.c).

Each pass is applied per color via `common.colored_pass`: gather body state,
solve all contacts of the color in parallel, scatter velocity deltas. The
Jacobi wrapper instead accumulates deltas for all contacts at once
(reference: src/solve_jacobi.c:126-131, applied at :233-245).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import (
    BAUMGARTE,
    LINEAR_SLOP,
    MAX_BAUMGARTE_VELOCITY,
    MAX_LINEAR_CORRECTION,
)
from ..ops import math2d as m
from ..ops.gather import tgather
from .common import ContactCons, gather_rows2


@dataclasses.dataclass(frozen=True)
class SolveMode:
    sep_from_delta: bool      # recompute separation from delta_pos/rot (TGS)
    current_vel_anchors: bool # rotate anchors each solve (TGS_Soft) vs rA0
    bias: str                 # 'none' | 'baumgarte' | 'soft' | 'spec_only'
    soft_clamp: float = 1.0   # scale on MAX_BAUMGARTE_VELOCITY for soft bias
    friction_first: bool = False
    speculation: bool = True  # False: skip sep>0 points and zero impulses


PGS_BAUMGARTE = SolveMode(False, False, "baumgarte")
PGS_PLAIN = SolveMode(False, False, "none", friction_first=True, speculation=False)
PGS_SOFT = SolveMode(False, False, "soft", soft_clamp=0.5)
JACOBI_SOFT = SolveMode(False, False, "soft", soft_clamp=1.0)
SOFT_STEP = SolveMode(True, False, "soft", soft_clamp=0.5)
TGS_SOFT = SolveMode(True, True, "soft", soft_clamp=1.0)
TGS_RIGID = SolveMode(True, True, "spec_only")


def _pt(x, j):
    """Per-point field access: rank-3 [C,2,...] arrays in the XLA path, or
    2-tuples of rank-2 arrays inside Pallas kernels (Mosaic cannot slice the
    minor dims of rank-3 tiles)."""
    return x[j] if isinstance(x, (tuple, list)) else x[:, j]


def solve_contact_core(cons: ContactCons, vA, wA, vB, wB, qA, qB, dcA, dcB, n_imp, t_imp, mode: SolveMode, inv_h, use_bias: bool):
    """Solve one contact's normal+friction constraints (vectorized [C]).

    Returns updated (vA, wA, vB, wB, n_imp, t_imp)."""
    mA, iA = cons.inv_mass_a, cons.inv_i_a
    mB, iB = cons.inv_mass_b, cons.inv_i_b
    normal = cons.normal
    tangent = m.right_perp(normal)

    def anchors(j):
        if mode.current_vel_anchors:
            return m.rotate(qA, _pt(cons.local_anchor_a, j)), m.rotate(qB, _pt(cons.local_anchor_b, j))
        return _pt(cons.r_a0, j), _pt(cons.r_b0, j)

    def current_sep(j):
        if not mode.sep_from_delta:
            return _pt(cons.separation, j)
        rsA = m.rotate(qA, _pt(cons.local_anchor_a, j))
        rsB = m.rotate(qB, _pt(cons.local_anchor_b, j))
        ds = (dcB - dcA) + (rsB - rsA)
        return (ds * normal).sum(-1) + _pt(cons.adjusted_separation, j)

    def normal_point(j, vA, wA, vB, wB):
        rA, rB = anchors(j)
        s = current_sep(j)

        spec = s > 0.0
        if mode.bias == "baumgarte":
            bias_pen = jnp.maximum(
                BAUMGARTE * inv_h * jnp.minimum(0.0, s + LINEAR_SLOP), -MAX_BAUMGARTE_VELOCITY
            )
            bias = jnp.where(spec, s * inv_h, bias_pen)
            mass_scale = jnp.ones_like(s)
            imp_scale = jnp.zeros_like(s)
        elif mode.bias == "soft":
            bias_pen = jnp.maximum(_pt(cons.bias_coef, j) * s, -mode.soft_clamp * MAX_BAUMGARTE_VELOCITY)
            if use_bias:
                bias = jnp.where(spec, s * inv_h, bias_pen)
                mass_scale = jnp.where(spec, 1.0, _pt(cons.mass_coef, j))
                imp_scale = jnp.where(spec, 0.0, _pt(cons.imp_coef, j))
            else:
                bias = jnp.where(spec, s * inv_h, 0.0)
                mass_scale = jnp.ones_like(s)
                imp_scale = jnp.zeros_like(s)
        elif mode.bias == "spec_only":
            bias = jnp.where(spec, s * inv_h, 0.0)
            mass_scale = jnp.ones_like(s)
            imp_scale = jnp.zeros_like(s)
        else:  # none
            bias = jnp.zeros_like(s)
            mass_scale = jnp.ones_like(s)
            imp_scale = jnp.zeros_like(s)

        vr = (vB + m.cross_sv(wB, rB)) - (vA + m.cross_sv(wA, rA))
        vn = (vr * normal).sum(-1)

        old = n_cols[j]
        impulse = -_pt(cons.normal_mass, j) * mass_scale * (vn + bias) - imp_scale * old
        new_total = jnp.maximum(old + impulse, 0.0)
        ok = _pt(cons.pmask, j)
        new_total = jnp.where(ok, new_total, old)
        d = new_total - old
        if not mode.speculation:
            # plain PGS zeroes the stored impulse for open points WITHOUT
            # un-applying it (solve_pgs_ngs.c:86-91 `continue`)
            new_total = jnp.where(spec & ok, 0.0, new_total)
            d = jnp.where(spec, 0.0, d)
        # column update (no .at scatter: must lower inside Pallas/Mosaic)
        n_cols[j] = new_total

        P = d[:, None] * normal
        vA = vA - mA[:, None] * P
        wA = wA - iA * m.cross(rA, P)
        vB = vB + mB[:, None] * P
        wB = wB + iB * m.cross(rB, P)
        return vA, wA, vB, wB

    def friction_point(j, vA, wA, vB, wB):
        rA, rB = anchors(j)
        vr = (vB + m.cross_sv(wB, rB)) - (vA + m.cross_sv(wA, rA))
        vt = (vr * tangent).sum(-1)
        lam = -_pt(cons.tangent_mass, j) * vt
        max_f = cons.friction * n_cols[j]
        old = t_cols[j]
        new_total = jnp.clip(old + lam, -max_f, max_f)
        ok = _pt(cons.pmask, j)
        new_total = jnp.where(ok, new_total, old)
        d = new_total - old
        if not mode.speculation:
            s = _pt(cons.separation, j)
            new_total = jnp.where((s > 0.0) & ok, 0.0, new_total)
            d = jnp.where(s > 0.0, 0.0, d)
        t_cols[j] = new_total

        P = d[:, None] * tangent
        vA = vA - mA[:, None] * P
        wA = wA - iA * m.cross(rA, P)
        vB = vB + mB[:, None] * P
        wB = wB + iB * m.cross(rB, P)
        return vA, wA, vB, wB

    n_cols = [n_imp[:, 0], n_imp[:, 1]]
    t_cols = [t_imp[:, 0], t_imp[:, 1]]
    if mode.friction_first:
        for j in range(2):
            vA, wA, vB, wB = friction_point(j, vA, wA, vB, wB)
        for j in range(2):
            vA, wA, vB, wB = normal_point(j, vA, wA, vB, wB)
    else:
        for j in range(2):
            vA, wA, vB, wB = normal_point(j, vA, wA, vB, wB)
        for j in range(2):
            vA, wA, vB, wB = friction_point(j, vA, wA, vB, wB)

    n_imp = jnp.stack(n_cols, axis=-1)
    t_imp = jnp.stack(t_cols, axis=-1)
    return vA, wA, vB, wB, n_imp, t_imp


def gs_contact_pass(carry, k, cons: ContactCons, mode: SolveMode, inv_h, use_bias, color, bmap):
    """One color's Gauss-Seidel contact pass on the packed [B,8] body state:
    two row-gathers in, one mapped row-gather out. carry = (bs, n_imp, t_imp)."""
    from .common import gather_apply, pack_rows, unpack_rows

    bs, n_imp, t_imp = carry
    ia, ib = cons.ia, cons.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA, wA, dcA, qA = unpack_rows(_ra)
    vB, wB, dcB, qB = unpack_rows(_rb)

    vA2, wA2, vB2, wB2, n2, t2 = solve_contact_core(
        cons, vA, wA, vB, wB, qA, qB, dcA, dcB, n_imp, t_imp, mode, inv_h, use_bias
    )
    upd = (color == k) & cons.active & bmap.winner
    outA = pack_rows(vA2, wA2, dcA, qA)
    outB = pack_rows(vB2, wB2, dcB, qB)
    (bs,) = gather_apply(bmap.slot[:, k], ia, (outA,), (outB,), (bs,))
    n_imp = jnp.where(upd[:, None], n2, n_imp)
    t_imp = jnp.where(upd[:, None], t2, t_imp)
    return (bs, n_imp, t_imp)


def gs_contact_pass_bucketed(carry, k, cap, cons_k: ContactCons, mode: SolveMode,
                             inv_h, use_bias, slot_local, winner_k):
    """Bucketed variant of gs_contact_pass: `cons_k` is color k's static
    bucket slice (`cap` rows, see ops/coloring.py:build_color_buckets), so
    the pass gathers/solves only ~C/max_colors rows instead of masking all C.
    The full bucketed impulse arrays ride the carry; only this color's
    static slice is read and written. slot_local: [B] index into the slice
    (bmap slot minus the bucket offset); winner_k: the slice of bmap.winner."""
    from .common import gather_apply, pack_rows, unpack_rows

    bs, n_imp, t_imp = carry
    o = k * cap
    n_k = n_imp[o:o + cap]
    t_k = t_imp[o:o + cap]
    ia, ib = cons_k.ia, cons_k.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA, wA, dcA, qA = unpack_rows(_ra)
    vB, wB, dcB, qB = unpack_rows(_rb)

    vA2, wA2, vB2, wB2, n2, t2 = solve_contact_core(
        cons_k, vA, wA, vB, wB, qA, qB, dcA, dcB, n_k, t_k, mode, inv_h, use_bias
    )
    upd = cons_k.active & winner_k
    outA = pack_rows(vA2, wA2, dcA, qA)
    outB = pack_rows(vB2, wB2, dcB, qB)
    (bs,) = gather_apply(slot_local, ia, (outA,), (outB,), (bs,))
    n_imp = n_imp.at[o:o + cap].set(jnp.where(upd[:, None], n2, n_k))
    t_imp = t_imp.at[o:o + cap].set(jnp.where(upd[:, None], t2, t_k))
    return (bs, n_imp, t_imp)


def jacobi_contact_pass(bs, cons: ContactCons, n_imp, t_imp, mode: SolveMode, inv_h, use_bias):
    """Jacobi: solve every contact against frozen velocities, accumulate
    per-body deltas, apply once (reference: src/solve_jacobi.c:21-132,233-245).
    Packed body state: two scatter-adds total."""
    from .common import unpack_rows

    ia, ib = cons.ia, cons.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA, wA, dcA, qA = unpack_rows(_ra)
    vB, wB, dcB, qB = unpack_rows(_rb)

    vA2, wA2, vB2, wB2, n2, t2 = solve_contact_core(
        cons, vA, wA, vB, wB, qA, qB, dcA, dcB, n_imp, t_imp, mode, inv_h, use_bias
    )
    upd = cons.active
    updn = upd[:, None]
    z2 = jnp.zeros((ia.shape[0], 2), bs.dtype)
    z1 = jnp.zeros((ia.shape[0], 1), bs.dtype)
    dA = jnp.concatenate([jnp.where(updn, vA2 - vA, 0.0), jnp.where(upd, wA2 - wA, 0.0)[:, None], z2, z2, z1], axis=-1)
    dB = jnp.concatenate([jnp.where(updn, vB2 - vB, 0.0), jnp.where(upd, wB2 - wB, 0.0)[:, None], z2, z2, z1], axis=-1)
    from ..ops.gather import tscatter_add

    bs = tscatter_add(bs, jnp.concatenate([ia, ib]), jnp.concatenate([dA, dB]))
    n_imp = jnp.where(updn, n2, n_imp)
    t_imp = jnp.where(updn, t2, t_imp)
    return bs, n_imp, t_imp


# ----------------------------------------------------------- 2x2 block solver

def prepare_block(cons: ContactCons, inv_dt):
    """Block-solver extras (reference: src/solve_pgs_ngs_block.c:135-279):
    per-point speculative velocity bias, the 2x2 normal K matrix and its
    inverse, and the condition-number demotion to 1 point.

    Returns (velocity_bias [C,2], k_mat [C,2,2], block_mass [C,2,2],
    use_block [C], pmask_eff [C,2])."""
    velocity_bias = -jnp.maximum(0.0, cons.separation * inv_dt)

    normal = cons.normal
    rn1A = m.cross(cons.r_a0[:, 0], normal)
    rn1B = m.cross(cons.r_b0[:, 0], normal)
    rn2A = m.cross(cons.r_a0[:, 1], normal)
    rn2B = m.cross(cons.r_b0[:, 1], normal)
    mAB = cons.inv_mass_a + cons.inv_mass_b
    iA, iB = cons.inv_i_a, cons.inv_i_b
    k11 = mAB + iA * rn1A**2 + iB * rn1B**2
    k22 = mAB + iA * rn2A**2 + iB * rn2B**2
    k12 = mAB + iA * rn1A * rn2A + iB * rn1B * rn2B
    k_mat = m.mat22(k11, k12, k12, k22)
    cond_ok = k11 * k11 < 1000.0 * (k11 * k22 - k12 * k12)  # block.c:260-267

    two = cons.pmask[:, 1]
    use_block = two & cond_ok
    # demoted constraints use only point 0 (block.c:268-273)
    pmask_eff = jnp.stack([cons.pmask[:, 0], use_block], axis=-1)
    block_mass = m.inverse22(k_mat)
    return velocity_bias, k_mat, block_mass, use_block, pmask_eff


def block_velocity_pass(carry, k, cons: ContactCons, velocity_bias, k_mat, block_mass, use_block, pmask_eff, color, bmap, direct=None):
    """One colored pass of s2BlockSolveVelocity (block.c:329-658): friction
    first, then either scalar normal (1 point) or the 2x2 LCP solved by total
    enumeration (Murty) — all four cases evaluated, first valid selected.

    direct=(slot_local, winner_k): bucketed mode — cons/extras/carry are
    color k's bucket slice and color/bmap are unused."""
    from .common import pack_rows, unpack_rows

    bs, n_imp, t_imp = carry
    ia, ib = cons.ia, cons.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA, wA, dcA_r, qA_r = unpack_rows(_ra)
    vB, wB, dcB_r, qB_r = unpack_rows(_rb)
    mA, iA = cons.inv_mass_a, cons.inv_i_a
    mB, iB = cons.inv_mass_b, cons.inv_i_b
    normal = cons.normal
    tangent = m.cross_vs(normal, 1.0)

    # friction (block.c:364-392)
    for j in range(2):
        rA, rB = cons.r_a0[:, j], cons.r_b0[:, j]
        vr = (vB + m.cross_sv(wB, rB)) - (vA + m.cross_sv(wA, rA))
        vt = (vr * tangent).sum(-1)
        lam = cons.tangent_mass[:, j] * (-vt)
        max_f = cons.friction * n_imp[:, j]
        old = t_imp[:, j]
        new = jnp.clip(old + lam, -max_f, max_f)
        new = jnp.where(pmask_eff[:, j], new, old)
        d = new - old
        t_imp = t_imp.at[:, j].set(new)
        P = d[:, None] * tangent
        vA = vA - mA[:, None] * P
        wA = wA - iA * m.cross(rA, P)
        vB = vB + mB[:, None] * P
        wB = wB + iB * m.cross(rB, P)

    # scalar normal for 1-point constraints (block.c:395-423)
    one_point = cons.pmask[:, 0] & ~use_block
    rA, rB = cons.r_a0[:, 0], cons.r_b0[:, 0]
    vr = (vB + m.cross_sv(wB, rB)) - (vA + m.cross_sv(wA, rA))
    vn = (vr * normal).sum(-1)
    lam = -cons.normal_mass[:, 0] * (vn - velocity_bias[:, 0])
    old0 = n_imp[:, 0]
    new0 = jnp.maximum(old0 + lam, 0.0)
    d0 = jnp.where(one_point, new0 - old0, 0.0)
    P = d0[:, None] * normal
    vA_s = vA - mA[:, None] * P
    wA_s = wA - iA * m.cross(rA, P)
    vB_s = vB + mB[:, None] * P
    wB_s = wB + iB * m.cross(rB, P)
    n0_s = jnp.where(one_point, new0, old0)

    # 2x2 block LCP (block.c:424-651)
    rA1, rB1 = cons.r_a0[:, 0], cons.r_b0[:, 0]
    rA2, rB2 = cons.r_a0[:, 1], cons.r_b0[:, 1]
    a_acc = n_imp  # accumulated [C,2]
    dv1 = (vB + m.cross_sv(wB, rB1)) - (vA + m.cross_sv(wA, rA1))
    dv2 = (vB + m.cross_sv(wB, rB2)) - (vA + m.cross_sv(wA, rA2))
    vn1 = (dv1 * normal).sum(-1)
    vn2 = (dv2 * normal).sum(-1)
    b = jnp.stack([vn1 - velocity_bias[:, 0], vn2 - velocity_bias[:, 1]], axis=-1)
    b = b - m.mul_mv(k_mat, a_acc)

    k11 = k_mat[:, 0, 0]
    k12 = k_mat[:, 0, 1]
    k21 = k_mat[:, 1, 0]
    k22 = k_mat[:, 1, 1]

    # Case 1: both active
    x1 = -m.mul_mv(block_mass, b)
    ok1 = (x1[:, 0] >= 0.0) & (x1[:, 1] >= 0.0)
    # Case 2: x2 = 0
    x2 = jnp.stack([-cons.normal_mass[:, 0] * b[:, 0], jnp.zeros_like(k11)], axis=-1)
    vn2_c2 = k21 * x2[:, 0] + b[:, 1]
    ok2 = (x2[:, 0] >= 0.0) & (vn2_c2 >= 0.0)
    # Case 3: x1 = 0
    x3 = jnp.stack([jnp.zeros_like(k11), -cons.normal_mass[:, 1] * b[:, 1]], axis=-1)
    vn1_c3 = k12 * x3[:, 1] + b[:, 0]
    ok3 = (x3[:, 1] >= 0.0) & (vn1_c3 >= 0.0)
    # Case 4: both zero
    ok4 = (b[:, 0] >= 0.0) & (b[:, 1] >= 0.0)

    x = jnp.where(
        ok1[:, None], x1,
        jnp.where(ok2[:, None], x2, jnp.where(ok3[:, None], x3, jnp.where(ok4[:, None], jnp.zeros_like(x1), a_acc))),
    )
    d_blk = x - a_acc  # zero when no case applies (block.c:648-649 "give up")
    P1 = d_blk[:, 0:1] * normal
    P2 = d_blk[:, 1:2] * normal
    blk = use_block
    vA_b = vA - mA[:, None] * (P1 + P2)
    wA_b = wA - iA * (m.cross(rA1, P1) + m.cross(rA2, P2))
    vB_b = vB + mB[:, None] * (P1 + P2)
    wB_b = wB + iB * (m.cross(rB1, P1) + m.cross(rB2, P2))

    vA = jnp.where(blk[:, None], vA_b, vA_s)
    wA = jnp.where(blk, wA_b, wA_s)
    vB = jnp.where(blk[:, None], vB_b, vB_s)
    wB = jnp.where(blk, wB_b, wB_s)
    n_imp_new = jnp.where(blk[:, None], x, jnp.stack([n0_s, n_imp[:, 1]], axis=-1))

    from .common import gather_apply

    if direct is None:
        slot = bmap.slot[:, k]
        upd = (color == k) & cons.active & bmap.winner
    else:
        slot = direct[0]
        upd = cons.active & direct[1]
    outA = pack_rows(vA, wA, dcA_r, qA_r)
    outB = pack_rows(vB, wB, dcB_r, qB_r)
    (bs,) = gather_apply(slot, ia, (outA,), (outB,), (bs,))
    n_imp = jnp.where(upd[:, None], n_imp_new, n_imp)
    t_imp = jnp.where(upd[:, None], t_imp, carry[2])
    return (bs, n_imp, t_imp)


def block_position_pass(carry, k, cons: ContactCons, use_block, color, bmap, direct=None):
    """s2BlockSolvePosition (block.c:679-890): block NGS for 2-point
    manifolds, scalar NGS otherwise. carry = packed bs.

    direct=(slot_local, winner_k): bucketed mode (see block_velocity_pass)."""
    from .common import pack_rows, unpack_rows

    bs = carry
    ia, ib = cons.ia, cons.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA_r, wA_r, dcA, qA = unpack_rows(_ra)
    vB_r, wB_r, dcB, qB = unpack_rows(_rb)
    mA, iA = cons.inv_mass_a, cons.inv_i_a
    mB, iB = cons.inv_mass_b, cons.inv_i_b
    normal = cons.normal
    slop = LINEAR_SLOP

    # ---- block path (2 points) ----
    rA1 = m.rotate(qA, cons.local_anchor_a[:, 0])
    rB1 = m.rotate(qB, cons.local_anchor_b[:, 0])
    rA2 = m.rotate(qA, cons.local_anchor_a[:, 1])
    rB2 = m.rotate(qB, cons.local_anchor_b[:, 1])
    dc = dcB - dcA
    s1 = ((dc + rB1 - rA1) * normal).sum(-1) + cons.adjusted_separation[:, 0]
    s2_ = ((dc + rB2 - rA2) * normal).sum(-1) + cons.adjusted_separation[:, 1]
    C1 = jnp.clip(BAUMGARTE * (s1 + slop), -MAX_LINEAR_CORRECTION, 0.0)
    C2 = jnp.clip(BAUMGARTE * (s2_ + slop), -MAX_LINEAR_CORRECTION, 0.0)
    bvec = jnp.stack([C1, C2], axis=-1)

    rn1A = m.cross(rA1, normal)
    rn1B = m.cross(rB1, normal)
    rn2A = m.cross(rA2, normal)
    rn2B = m.cross(rB2, normal)
    mAB = mA + mB
    k11 = mAB + iA * rn1A**2 + iB * rn1B**2
    k22 = mAB + iA * rn2A**2 + iB * rn2B**2
    k12 = mAB + iA * rn1A * rn2A + iB * rn1B * rn2B
    cond_ok = k11 * k11 < 10000.0 * (k11 * k22 - k12 * k12)  # block.c:747-754
    K = m.mat22(k11, k12, k12, k22)
    invK = m.inverse22(K)

    x1 = -m.mul_mv(invK, bvec)
    ok1 = (x1[:, 0] >= 0.0) & (x1[:, 1] >= 0.0)
    x2 = jnp.stack([-bvec[:, 0] / jnp.where(k11 != 0, k11, 1.0), jnp.zeros_like(k11)], axis=-1)
    ok2 = (x2[:, 0] >= 0.0) & (k12 * x2[:, 0] + bvec[:, 1] >= 0.0)
    x3 = jnp.stack([jnp.zeros_like(k11), -bvec[:, 1] / jnp.where(k22 != 0, k22, 1.0)], axis=-1)
    ok3 = (x3[:, 1] >= 0.0) & (k12 * x3[:, 1] + bvec[:, 0] >= 0.0)
    x = jnp.where(ok1[:, None], x1, jnp.where(ok2[:, None], x2, jnp.where(ok3[:, None], x3, 0.0)))

    P1 = x[:, 0:1] * normal
    P2 = x[:, 1:2] * normal
    dcA_b = dcA - mA[:, None] * (P1 + P2)
    qA_b = m.integrate_rot(qA, -iA * (m.cross(rA1, P1) + m.cross(rA2, P2)))
    dcB_b = dcB + mB[:, None] * (P1 + P2)
    qB_b = m.integrate_rot(qB, iB * (m.cross(rB1, P1) + m.cross(rB2, P2)))

    # ---- scalar path (1 point or degenerate) ----
    dcA_s, qA_s, dcB_s, qB_s = dcA, qA, dcB, qB
    for j in range(2):
        rA = m.rotate(qA_s, cons.local_anchor_a[:, j])
        rB = m.rotate(qB_s, cons.local_anchor_b[:, j])
        d = (dcB_s - dcA_s) + (rB - rA)
        sep = (d * normal).sum(-1) + cons.adjusted_separation[:, j]
        C = jnp.clip(BAUMGARTE * (sep + slop), -MAX_LINEAR_CORRECTION, 0.0)
        rnA = m.cross(rA, normal)
        rnB = m.cross(rB, normal)
        Ks = mAB + iA * rnA**2 + iB * rnB**2
        impulse = jnp.where(Ks > 0.0, -C / jnp.where(Ks > 0.0, Ks, 1.0), 0.0)
        impulse = jnp.where(cons.pmask[:, j], impulse, 0.0)
        P = impulse[:, None] * normal
        dcA_s = dcA_s - mA[:, None] * P
        qA_s = m.integrate_rot(qA_s, -iA * m.cross(rA, P))
        dcB_s = dcB_s + mB[:, None] * P
        qB_s = m.integrate_rot(qB_s, iB * m.cross(rB, P))

    blk = use_block & cond_ok
    dcA_n = jnp.where(blk[:, None], dcA_b, dcA_s)
    qA_n = jnp.where(blk[:, None], qA_b, qA_s)
    dcB_n = jnp.where(blk[:, None], dcB_b, dcB_s)
    qB_n = jnp.where(blk[:, None], qB_b, qB_s)

    from .common import gather_apply

    slot = bmap.slot[:, k] if direct is None else direct[0]
    outA = pack_rows(vA_r, wA_r, dcA_n, qA_n)
    outB = pack_rows(vB_r, wB_r, dcB_n, qB_n)
    (bs,) = gather_apply(slot, ia, (outA,), (outB,), (bs,))
    return bs


# ------------------------------------------------------------------ TGS sticky

def prepare_sticky(bodies_position, contacts, cons: ContactCons, rot):
    """Sticky friction-anchor confirmation/reset (reference:
    src/solve_tgs_sticky.c:19-165). Uses the manifold's persistent friction
    anchors if relative rotation and normal separation haven't invalidated
    them; otherwise resets them to the current contact anchors.

    Returns (local_fric_a [C,2,2] com-relative, local_fric_b, tangent_sep
    [C,2], sticky_tangent_mass [C,2], new friction fields for the contact
    store: fric_normal_a/b, fric_anchor_a/b [C,2,2] in body-origin frames)."""
    ia, ib = cons.ia, cons.ib
    qA, qB = tgather(rot, ia), tgather(rot, ib)
    cA, cB = tgather(bodies_position, ia), tgather(bodies_position, ib)
    mA, iA = cons.inv_mass_a, cons.inv_i_a
    mB, iB = cons.inv_mass_b, cons.inv_i_b
    normal = cons.normal
    tangent = m.right_perp(normal)

    # confirmation per point (sticky.c:88-135)
    normalA = m.rotate(qA[:, None, :], contacts.friction_normal_a)  # [C,2,2]
    normalB = m.rotate(qB[:, None, :], contacts.friction_normal_b)
    nn = (normalA * normalB).sum(-1)  # [C,2]
    rot_ok = nn >= 0.98

    # anchors are stored body-origin local; com-relative = anchor - localCenter.
    # localCenter is already folded into cons.local_anchor for the regular
    # anchors, so reuse that offset: (-localCenter) = local_anchor - anchor.
    offset_a = cons.local_anchor_a - contacts.anchor_a
    offset_b = cons.local_anchor_b - contacts.anchor_b
    lfa = contacts.friction_anchor_a + offset_a
    lfb = contacts.friction_anchor_b + offset_b

    rAf = m.rotate(qA[:, None, :], lfa)
    rBf = m.rotate(qB[:, None, :], lfb)
    world_offset = (cB - cA)[:, None, :] + (rBf - rAf)
    normal_sep = (world_offset * normalA).sum(-1)
    sep_ok = jnp.abs(normal_sep) <= 2.0 * LINEAR_SLOP

    confirmed = contacts.friction_persisted[:, None] & rot_ok & sep_ok
    all_confirmed = (confirmed | ~cons.pmask).all(axis=-1) & cons.active

    # reset values (sticky.c:137-161)
    lfa_reset = cons.local_anchor_a
    lfb_reset = cons.local_anchor_b
    new_fric_normal_a = jnp.where(
        all_confirmed[:, None, None], contacts.friction_normal_a,
        m.inv_rotate(qA[:, None, :], jnp.broadcast_to(normal[:, None, :], normalA.shape)),
    )
    new_fric_normal_b = jnp.where(
        all_confirmed[:, None, None], contacts.friction_normal_b,
        m.inv_rotate(qB[:, None, :], jnp.broadcast_to(normal[:, None, :], normalA.shape)),
    )
    new_fric_anchor_a = jnp.where(all_confirmed[:, None, None], contacts.friction_anchor_a, contacts.anchor_a)
    new_fric_anchor_b = jnp.where(all_confirmed[:, None, None], contacts.friction_anchor_b, contacts.anchor_b)

    lfa = jnp.where(all_confirmed[:, None, None], lfa, lfa_reset)
    lfb = jnp.where(all_confirmed[:, None, None], lfb, lfb_reset)

    # tangent separation + tangent mass at friction anchors
    rAf = m.rotate(qA[:, None, :], lfa)
    rBf = m.rotate(qB[:, None, :], lfb)
    tangent_sep = ((cB - cA)[:, None, :] * tangent[:, None, :]).sum(-1)
    rtA = m.cross(rAf, tangent[:, None, :])
    rtB = m.cross(rBf, tangent[:, None, :])
    k_t = mA[:, None] + mB[:, None] + iA[:, None] * rtA**2 + iB[:, None] * rtB**2
    tm = jnp.where(k_t > 0.0, 1.0 / jnp.where(k_t > 0.0, k_t, 1.0), 0.0)

    return lfa, lfb, tangent_sep, tm, (new_fric_normal_a, new_fric_normal_b, new_fric_anchor_a, new_fric_anchor_b)


def sticky_velocity_pass(carry, k, cons: ContactCons, lfa, lfb, tangent_sep, sticky_tm, inv_h, use_bias, color, bmap):
    """s2SolveContacts_TGS_Sticky (sticky.c:167-310): hard Baumgarte normal
    solve at current anchors, then sticky friction at persistent friction
    anchors with a tangent position bias; friction clamping invalidates
    persistence. carry = (bs, n_imp, t_imp, fric_persisted)."""
    from .common import pack_rows, unpack_rows

    bs, n_imp, t_imp, fric_persisted = carry
    ia, ib = cons.ia, cons.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA, wA, dcA, qA = unpack_rows(_ra)
    vB, wB, dcB, qB = unpack_rows(_rb)
    mA, iA = cons.inv_mass_a, cons.inv_i_a
    mB, iB = cons.inv_mass_b, cons.inv_i_b
    normal = cons.normal
    tangent = m.right_perp(normal)

    contact_baumgarte = 0.8
    friction_baumgarte = 0.5

    total_normal = jnp.zeros_like(cons.friction)
    for j in range(2):
        rA = m.rotate(qA, cons.local_anchor_a[:, j])
        rB = m.rotate(qB, cons.local_anchor_b[:, j])
        d = (dcB - dcA) + (rB - rA)
        s = (d * normal).sum(-1) + cons.adjusted_separation[:, j]
        bias = jnp.where(
            s > 0.0, s * inv_h,
            jnp.where(use_bias, jnp.maximum(-MAX_BAUMGARTE_VELOCITY, contact_baumgarte * s * inv_h), 0.0),
        )
        vr = (vB + m.cross_sv(wB, rB)) - (vA + m.cross_sv(wA, rA))
        vn = (vr * normal).sum(-1)
        old = n_imp[:, j]
        new = jnp.maximum(old + (-cons.normal_mass[:, j] * (vn + bias)), 0.0)
        new = jnp.where(cons.pmask[:, j], new, old)
        dimp = new - old
        n_imp = n_imp.at[:, j].set(new)
        total_normal = total_normal + jnp.where(cons.pmask[:, j], new, 0.0)
        P = dimp[:, None] * normal
        vA = vA - mA[:, None] * P
        wA = wA - iA * m.cross(rA, P)
        vB = vB + mB[:, None] * P
        wB = wB + iB * m.cross(rB, P)

    persisted = fric_persisted
    for j in range(2):
        rAf = m.rotate(qA, lfa[:, j])
        rBf = m.rotate(qB, lfb[:, j])
        d = (dcB - dcA) + (rBf - rAf)
        s = (d * tangent).sum(-1) + tangent_sep[:, j]
        bias = jnp.where(use_bias, friction_baumgarte * s * inv_h, 0.0)
        vr = (vB + m.cross_sv(wB, rBf)) - (vA + m.cross_sv(wA, rAf))
        vt = (vr * tangent).sum(-1)
        impulse = -sticky_tm[:, j] * (vt + bias)
        # max friction from average total normal impulse (sticky.c:274-277)
        max_f = 0.5 * cons.friction * total_normal
        old = t_imp[:, j]
        raw = old + impulse
        clamped = (raw < -max_f) | (raw > max_f)
        new = jnp.clip(raw, -max_f, max_f)
        new = jnp.where(cons.pmask[:, j], new, old)
        upd_j = (color == k) & cons.active & bmap.winner
        persisted = persisted & ~(clamped & cons.pmask[:, j] & upd_j)
        dimp = new - old
        t_imp = t_imp.at[:, j].set(new)
        P = dimp[:, None] * tangent
        vA = vA - mA[:, None] * P
        wA = wA - iA * m.cross(rAf, P)
        vB = vB + mB[:, None] * P
        wB = wB + iB * m.cross(rBf, P)

    from .common import gather_apply

    upd = (color == k) & cons.active & bmap.winner
    outA = pack_rows(vA, wA, dcA, qA)
    outB = pack_rows(vB, wB, dcB, qB)
    (bs,) = gather_apply(bmap.slot[:, k], ia, (outA,), (outB,), (bs,))
    n_imp = jnp.where(upd[:, None], n_imp, carry[1])
    t_imp = jnp.where(upd[:, None], t_imp, carry[2])
    return (bs, n_imp, t_imp, persisted)


# ------------------------------------------------------------------------ XPBD

def xpbd_position_pass(carry, k, cons: ContactCons, h, color, bmap, direct=None):
    """s2SolveContactPositions_XPBD (xpbd.c:88-216): non-penetration lambda in
    position space then static-friction projection. Impulses are overwritten
    (not accumulated) each call. carry = (bs, n_imp, t_imp).

    direct=(slot_local, winner_k): bucketed mode — cons/carry are color k's
    bucket slice and color/bmap are unused (see solvers/common.py)."""
    from .common import pack_rows, unpack_rows

    bs, n_imp, t_imp = carry
    ia, ib = cons.ia, cons.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA_r, wA_r, dcA, qA = unpack_rows(_ra)
    vB_r, wB_r, dcB, qB = unpack_rows(_rb)
    mA, iA = cons.inv_mass_a, cons.inv_i_a
    mB, iB = cons.inv_mass_b, cons.inv_i_b
    normal = cons.normal
    tangent = m.cross_vs(normal, 1.0)

    for j in range(2):
        rA = m.rotate(qA, cons.local_anchor_a[:, j])
        rB = m.rotate(qB, cons.local_anchor_b[:, j])
        drA = rA - cons.r_a0[:, j]
        drB = rB - cons.r_b0[:, j]
        ds = (dcB - dcA) + (drB - drA)
        C = (ds * normal).sum(-1) + cons.separation[:, j]
        open_ = C > 0.0
        C = jnp.maximum(-MAX_BAUMGARTE_VELOCITY * h, C)
        rnA = m.cross(rA, normal)
        rnB = m.cross(rB, normal)
        kA = mA + iA * rnA**2
        kB = mB + iB * rnB**2
        denom = kA + kB
        lam = jnp.where(denom > 0, -C / jnp.where(denom > 0, denom, 1.0), 0.0)
        lam = jnp.where(open_ | ~cons.pmask[:, j], 0.0, lam)
        n_imp = n_imp.at[:, j].set(jnp.where(cons.pmask[:, j], lam, n_imp[:, j]))
        P = lam[:, None] * normal
        dcA = dcA - mA[:, None] * P
        qA = m.integrate_rot(qA, -iA * m.cross(rA, P))
        dcB = dcB + mB[:, None] * P
        qB = m.integrate_rot(qB, iB * m.cross(rB, P))

    for j in range(2):
        rA = m.rotate(qA, cons.local_anchor_a[:, j])
        rB = m.rotate(qB, cons.local_anchor_b[:, j])
        drA = rA - cons.r_a0[:, j]
        drB = rB - cons.r_b0[:, j]
        dpv = (dcB - dcA) + (drB - drA)
        C = (dpv * tangent).sum(-1)
        rtA = m.cross(rA, tangent)
        rtB = m.cross(rB, tangent)
        kA = mA + iA * rtA**2
        kB = mB + iB * rtB**2
        denom = kA + kB
        lam = jnp.where(denom > 0, -C / jnp.where(denom > 0, denom, 1.0), 0.0)
        max_lam = cons.friction * n_imp[:, j]
        # static friction holds only inside the cone (xpbd.c:189-198)
        hold = (lam >= -max_lam) & (lam <= max_lam) & cons.pmask[:, j]
        lam = jnp.where(hold, lam, 0.0)
        t_imp = t_imp.at[:, j].set(jnp.where(cons.pmask[:, j], lam, t_imp[:, j]))
        P = lam[:, None] * tangent
        dcA = dcA - mA[:, None] * P
        qA = m.integrate_rot(qA, -iA * m.cross(rA, P))
        dcB = dcB + mB[:, None] * P
        qB = m.integrate_rot(qB, iB * m.cross(rB, P))

    from .common import gather_apply

    if direct is None:
        slot = bmap.slot[:, k]
        upd = (color == k) & cons.active & bmap.winner
    else:
        slot = direct[0]
        upd = cons.active & direct[1]
    updn = upd[:, None]
    outA = pack_rows(vA_r, wA_r, dcA, qA)
    outB = pack_rows(vB_r, wB_r, dcB, qB)
    (bs,) = gather_apply(slot, ia, (outA,), (outB,), (bs,))
    n_imp = jnp.where(updn, n_imp, carry[1])
    t_imp = jnp.where(updn, t_imp, carry[2])
    return (bs, n_imp, t_imp)


def xpbd_velocity_pass(carry, k, cons: ContactCons, h, inv_h, color, bmap, direct=None):
    """s2SolveContactVelocities_XPBD (xpbd.c:218-338): normal relaxation (only
    where a position lambda was applied) + kinetic friction via eq. 31 with
    the paper's unit fix. carry = (bs, n_imp, t_imp).

    direct: bucketed-mode override, as in xpbd_position_pass."""
    from .common import pack_rows, unpack_rows

    bs, n_imp, t_imp = carry
    ia, ib = cons.ia, cons.ib
    _ra, _rb = gather_rows2(bs, ia, ib)
    vA, wA, dcA_r, qA = unpack_rows(_ra)
    vB, wB, dcB_r, qB = unpack_rows(_rb)
    mA, iA = cons.inv_mass_a, cons.inv_i_a
    mB, iB = cons.inv_mass_b, cons.inv_i_b
    normal = cons.normal
    tangent = m.cross_vs(normal, 1.0)

    for j in range(2):
        rA = m.rotate(qA, cons.local_anchor_a[:, j])
        rB = m.rotate(qB, cons.local_anchor_b[:, j])
        vr = (vB + m.cross_sv(wB, rB)) - (vA + m.cross_sv(wA, rA))
        rnA = m.cross(rA, normal)
        rnB = m.cross(rB, normal)
        kA = mA + iA * rnA**2
        kB = mB + iB * rnB**2
        denom = kA + kB
        vn = (vr * normal).sum(-1)
        lam = jnp.where(denom > 0, -vn / jnp.where(denom > 0, denom, 1.0), 0.0)
        lam = jnp.where((n_imp[:, j] != 0.0) & cons.pmask[:, j], lam, 0.0)
        P = lam[:, None] * normal
        vA = vA - mA[:, None] * P
        wA = wA - iA * m.cross(rA, P)
        vB = vB + mB[:, None] * P
        wB = wB + iB * m.cross(rB, P)

    for j in range(2):
        rA = m.rotate(qA, cons.local_anchor_a[:, j])
        rB = m.rotate(qB, cons.local_anchor_b[:, j])
        vr = (vB + m.cross_sv(wB, rB)) - (vA + m.cross_sv(wA, rA))
        vt = (vr * tangent).sum(-1)
        rtA = m.cross(rA, tangent)
        rtB = m.cross(rB, tangent)
        kA = mA + iA * rtA**2
        kB = mB + iB * rtB**2
        denom = kA + kB
        max_f = cons.friction * n_imp[:, j]
        huf = (max_f * inv_h) * denom
        abs_vt = jnp.abs(vt)
        sign = jnp.where(abs_vt > 0, vt / jnp.where(abs_vt > 0, abs_vt, 1.0), 0.0)
        cdot = sign * jnp.minimum(huf, abs_vt)
        lam = jnp.where(denom > 0, -cdot / jnp.where(denom > 0, denom, 1.0), 0.0)
        lam = jnp.where((vt != 0.0) & cons.pmask[:, j], lam, 0.0)
        t_imp = t_imp.at[:, j].set(jnp.where((vt != 0.0) & cons.pmask[:, j], lam, t_imp[:, j]))
        P = lam[:, None] * tangent
        vA = vA - mA[:, None] * P
        wA = wA - iA * m.cross(rA, P)
        vB = vB + mB[:, None] * P
        wB = wB + iB * m.cross(rB, P)

    from .common import gather_apply

    if direct is None:
        slot = bmap.slot[:, k]
        upd = (color == k) & cons.active & bmap.winner
    else:
        slot = direct[0]
        upd = cons.active & direct[1]
    outA = pack_rows(vA, wA, dcA_r, qA)
    outB = pack_rows(vB, wB, dcB_r, qB)
    (bs,) = gather_apply(slot, ia, (outA,), (outB,), (bs,))
    t_imp = jnp.where(upd[:, None], t_imp, carry[2])
    return (bs, n_imp, t_imp)
