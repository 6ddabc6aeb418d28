"""Vectorized broadphase: sweep-and-prune pair finding + persistent contact table.

Replaces the reference's dynamic AABB trees + move buffer + pair hash set
(reference: src/dynamic_tree.c, src/broad_phase.c:160-367) — pointer-chasing,
callback-driven structures hostile to XLA — with:

1. fat-AABB maintenance with the same enlarge-on-escape hysteresis
   (reference: src/world.c:260-301, src/shape.c:48-67);
2. a sort-based sweep-and-prune along the axis of maximum extent variance,
   with a fixed candidate window per shape (overflow-flagged);
3. the same pair rules as s2PairQueryCallback (reference:
   src/broad_phase.c:166-258): no same-body pairs, filter check
   (src/contact.h:70-79), at least one dynamic body, joint-connected
   suppression (src/body.c:386-417);
4. a compaction + sort yielding a canonical key-sorted contact table, and a
   `searchsorted` match against the previous step's table that carries
   manifold/impulse/GJK-cache state across steps — the device-side analog of
   the persistent contact pool + pair set (src/contact.c:156-292).

Everything is fixed-shape; runs under jit/vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AABB_MARGIN, SPECULATIVE_DISTANCE, SimConfig
from .gather import tgather, tscatter_add, tscatter_max
from ..state import Contacts, Shapes

INT32_MAX = jnp.iinfo(jnp.int32).max


def update_fat_aabbs(shapes: Shapes, aabbs: jnp.ndarray, body_type: jnp.ndarray) -> jnp.ndarray:
    """Enlarge-on-escape hysteresis (reference: src/world.c:286-297).

    aabbs already include the speculative margin. Returns new fat AABBs."""
    fat = shapes.fat_aabb
    contained = (
        (fat[:, 0] <= aabbs[:, 0]) & (fat[:, 1] <= aabbs[:, 1])
        & (aabbs[:, 2] <= fat[:, 2]) & (aabbs[:, 3] <= fat[:, 3])
    )
    # static shapes get a smaller margin (reference: src/shape.c:58)
    is_static = body_type == 0
    margin = jnp.where(is_static, 0.0, AABB_MARGIN)
    grown = aabbs + jnp.stack([-margin, -margin, margin, margin], axis=-1)
    return jnp.where(contained[:, None], fat, grown)


class PairResult(NamedTuple):
    shape_a: jnp.ndarray  # i32 [C]
    shape_b: jnp.ndarray  # i32 [C]
    key: jnp.ndarray      # i32 [C] = a * max_shapes + b, INT32_MAX for empty
    valid: jnp.ndarray    # bool [C]
    count: jnp.ndarray    # i32 []
    overflow: jnp.ndarray # bool []


def find_pairs(shapes: Shapes, body_type: jnp.ndarray, jointed_keys: jnp.ndarray, config: SimConfig) -> PairResult:
    """Sweep-and-prune over fat AABBs.

    body_type: [S] BodyType of each shape's body.
    jointed_keys: sorted i32 [Jcap] canonical body-pair keys whose joints set
    collideConnected=False (INT32_MAX padding)."""
    S = config.max_shapes
    K = config.sap_window
    fat = shapes.fat_aabb
    alive = shapes.alive

    # Choose the sweep axis with the larger variance of AABB centers so e.g.
    # vertical stacks sort along y. (Axis choice only affects performance.)
    cx = 0.5 * (fat[:, 0] + fat[:, 2])
    cy = 0.5 * (fat[:, 1] + fat[:, 3])
    n_alive = jnp.maximum(alive.sum(), 1)
    mx = jnp.where(alive, cx, 0.0).sum() / n_alive
    my = jnp.where(alive, cy, 0.0).sum() / n_alive
    var_x = jnp.where(alive, (cx - mx) ** 2, 0.0).sum()
    var_y = jnp.where(alive, (cy - my) ** 2, 0.0).sum()
    axis = jnp.where(var_y > var_x, 1, 0)

    lo = jnp.where(axis == 0, fat[:, 0], fat[:, 1])
    hi = jnp.where(axis == 0, fat[:, 2], fat[:, 3])
    sort_key = jnp.where(alive, lo, jnp.inf)
    order = jnp.argsort(sort_key)  # [S]

    # two packed gathers supply every per-candidate field (see
    # _pack_shape_rows): rows in sorted order, then partner rows
    packed = _pack_shape_rows(shapes, body_type, jnp.zeros_like(alive))
    packed_s = tgather(packed, order)                               # [S,10]
    lo_s = tgather(lo, order)
    hi_s = jnp.where(axis == 0, packed_s[:, 2], packed_s[:, 3])

    # candidates: for rank r, partners at ranks r+1..r+K
    ranks = jnp.arange(S)
    partner_rank = ranks[:, None] + 1 + jnp.arange(K)[None, :]      # [S,K]
    in_range = partner_rank < S
    partner_rank_c = jnp.minimum(partner_rank, S - 1)

    a_idx = order[:, None] * jnp.ones((1, K), jnp.int32)             # [S,K]
    b_idx = tgather(order, partner_rank_c)                           # [S,K]

    rows_a = packed_s[:, None, :]
    rows_b = tgather(packed_s, partner_rank_c)                       # [S,K,10]

    # sweep overlap on the sort axis (partner lo from its packed fat lanes)
    lo_b = jnp.where(axis == 0, rows_b[..., 0], rows_b[..., 1])
    valid = in_range & (lo_b <= hi_s[:, None])

    # window overflow: the (K+1)-th successor still sweep-overlaps
    last_rank = ranks + 1 + K
    last_ok = last_rank < S
    last_lo = tgather(lo_s, jnp.minimum(last_rank, S - 1))
    window_overflow = jnp.any(last_ok & (last_lo <= hi_s) & (sort_key != jnp.inf))

    # pair rules incl. full AABB overlap (reference: src/broad_phase.c:166-258)
    rules_ok, _, _ = _pair_rules(rows_a, rows_b, jointed_keys, config.max_bodies)
    valid &= rules_ok

    # canonical order: a < b
    a_c = jnp.minimum(a_idx, b_idx)
    b_c = jnp.maximum(a_idx, b_idx)
    pair_key = jnp.where(valid, a_c * S + b_c, INT32_MAX)

    # compact to C slots, sorted by key (dedup impossible: each unordered pair
    # appears once in the window scheme)
    C = config.max_contacts
    flat_key = pair_key.reshape(-1)
    top_key, count = _compact_keys(flat_key, C)
    filled = top_key != INT32_MAX
    sa = jnp.where(filled, top_key // S, 0)
    sb = jnp.where(filled, top_key % S, 0)

    overflow = window_overflow | (count > C)
    return PairResult(sa, sb, top_key, filled, count, overflow)


def _compact_keys(flat_key: jnp.ndarray, C: int):
    """Compact the valid (!= INT32_MAX) entries of a large candidate-key array
    into C ascending-sorted slots (INT32_MAX padded). Returns (keys[C], count).

    cumsum positions + ONE flat scatter + a sort of just [C] — vs the old
    `top_k` over the full [S*(9M+G)] array, which lowers to a full sort per
    step and dominated broadphase time. On overflow (count > C) the first C
    candidates in flat order survive (the old code kept the C smallest keys;
    either way pairs drop and diag.pair_overflow is raised)."""
    vmask = flat_key != INT32_MAX
    count = vmask.sum()
    posn = jnp.cumsum(vmask) - 1
    cells = jnp.where(vmask & (posn < C), posn, C)
    tbl = jnp.zeros((C + 1,), jnp.int32)
    # positions are unique and dense, so scatter-add writes each slot once;
    # valid keys are >= 1 (a < b), so 0 marks "unwritten"
    tbl = tscatter_add(tbl, cells, jnp.where(vmask, flat_key, 0))
    keys = jnp.where(jnp.arange(C) < jnp.minimum(count, C), tbl[:C], INT32_MAX)
    return jnp.sort(keys), count


def match_contacts(old: Contacts, pairs: PairResult, shapes: Shapes, bodies_type: jnp.ndarray, body_of) -> Contacts:
    """Build this step's contact table, carrying persistent state from `old`.

    Equivalent to the reference's persistent contact pool: a pair that existed
    last step keeps its manifold impulses, friction anchors, and GJK cache
    (reference: src/contact.c:156-229 creation, :296-359 persistence)."""
    new_key = pairs.key
    old_key = old.key  # sorted, INT32_MAX padded

    # searchsorted via one sort of the concatenated keys (method='sort'):
    # the default scan method is a gather-bound binary search under vmap, and
    # a dense [C,C] compare-count materializes a 411 MB s32 intermediate at
    # 128 worlds x 896 contacts
    pos = jnp.searchsorted(old_key, new_key, method="sort")
    pos = jnp.minimum(pos, old_key.shape[0] - 1)

    # every carried field rides ONE packed row-gather (row-gathers have a
    # large fixed per-row cost on TPU; see CLAUDE.md)
    Cn = old_key.shape[0]

    def flat2(x):
        return x.reshape(Cn, -1).astype(jnp.float32) if x.dtype == jnp.float32 else _i2f(x.reshape(Cn, -1))

    # the sticky friction quartet is zero-width for every solver but
    # TGS_Sticky (state.py:Contacts) — 16 of 48 carry lanes saved otherwise
    sticky = old.friction_normal_a.shape[0] == Cn
    lanes = [
        old.normal, old.anchor_a, old.anchor_b, old.separation,
        old.normal_impulse, old.tangent_impulse,
    ]
    if sticky:
        lanes += [
            old.friction_normal_a, old.friction_normal_b,
            old.friction_anchor_a, old.friction_anchor_b,
        ]
    lanes += [
        old.point_id, old.point_count, old.cache_count,
        old.cache_index_a, old.cache_index_b,
        old.persisted,
    ]
    if sticky:
        lanes += [old.friction_persisted]
    lanes += [old.color, old_key, old.alive]
    packed = jnp.concatenate([flat2(x) for x in lanes], axis=-1)
    rows = tgather(packed, pos)

    offs = []
    o = 0
    for x in lanes:
        n = int(np.prod(x.shape[1:])) if x.ndim > 1 else 1
        offs.append((o, o + n))
        o += n
    it = iter(offs)
    L_NORMAL, L_AA, L_AB, L_SEP, L_NI, L_TI = (next(it) for _ in range(6))
    if sticky:
        L_FNA, L_FNB, L_FAA, L_FAB = (next(it) for _ in range(4))
    L_PID, L_PC, L_CC, L_CIA, L_CIB, L_PERS = (next(it) for _ in range(6))
    if sticky:
        L_FP = next(it)
    L_COLOR, L_KEY, L_ALIVE = (next(it) for _ in range(3))

    def fpart(span, shape=None):
        v = rows[:, span[0]:span[1]]
        return v if shape is None else v.reshape((Cn,) + shape)

    def ipart(span, shape=None):
        v = _f2i(rows[:, span[0]:span[1]])
        return v if shape is None else v.reshape((Cn,) + shape)

    found = (
        (ipart(L_KEY)[:, 0] == new_key)
        & (new_key != INT32_MAX)
        & (ipart(L_ALIVE)[:, 0] != 0)
    )

    def keep(val, default_val):
        f = found.reshape(found.shape + (1,) * (val.ndim - 1))
        return jnp.where(f, val, default_val)

    sa, sb = pairs.shape_a, pairs.shape_b
    # per-shape material: one packed gather per endpoint
    mat = jnp.stack([shapes.friction, shapes.restitution, _i2f(body_of)], axis=-1)
    mat_a = tgather(mat, sa)
    mat_b = tgather(mat, sb)
    friction = jnp.sqrt(mat_a[:, 0] * mat_b[:, 0])                 # contact.c:42-45
    restitution = jnp.maximum(mat_a[:, 1], mat_b[:, 1])            # contact.c:47-52

    return Contacts(
        key=new_key,
        shape_a=sa,
        shape_b=sb,
        body_a=_f2i(mat_a[:, 2]),
        body_b=_f2i(mat_b[:, 2]),
        friction=friction,
        restitution=restitution,
        normal=keep(fpart(L_NORMAL), 0.0),
        anchor_a=keep(fpart(L_AA, (2, 2)), 0.0),
        anchor_b=keep(fpart(L_AB, (2, 2)), 0.0),
        separation=keep(fpart(L_SEP), 0.0),
        normal_impulse=keep(fpart(L_NI), 0.0),
        tangent_impulse=keep(fpart(L_TI), 0.0),
        point_id=keep(ipart(L_PID), 0),
        persisted=keep(ipart(L_PERS) != 0, False),
        point_count=keep(ipart(L_PC)[:, 0], 0),
        friction_normal_a=keep(fpart(L_FNA, (2, 2)), 0.0) if sticky else old.friction_normal_a,
        friction_normal_b=keep(fpart(L_FNB, (2, 2)), 0.0) if sticky else old.friction_normal_b,
        friction_anchor_a=keep(fpart(L_FAA, (2, 2)), 0.0) if sticky else old.friction_anchor_a,
        friction_anchor_b=keep(fpart(L_FAB, (2, 2)), 0.0) if sticky else old.friction_anchor_b,
        friction_persisted=keep(ipart(L_FP)[:, 0] != 0, False) if sticky else old.friction_persisted,
        cache_count=keep(ipart(L_CC)[:, 0], 0),
        cache_index_a=keep(ipart(L_CIA), 0),
        cache_index_b=keep(ipart(L_CIB), 0),
        color=keep(ipart(L_COLOR)[:, 0], -1),
        alive=pairs.valid,
    )


def match_contacts_lane(old_batch: Contacts, pairs0: "PairResult", shapes0: Shapes,
                        bodies_type0: jnp.ndarray, body_of0) -> Contacts:
    """Lane-batched persistent matching for a lockstep world batch.

    In a lockstep batch (parallel.replicate_state contract, SimConfig.
    lane_solve) every world's pair-key set and slot assignment are identical
    — only the carried VALUES (manifolds, impulses, GJK caches) differ once
    worlds diverge in state. So the structure work runs ONCE on world 0
    (searchsorted over the old keys, slot layout, material mixing) and the
    per-world carry rides ONE wide-row gather: packed [C, W*28] rows with
    the shared position index. The per-world path (match_contacts above)
    pays the [C]-row gather W times.

    Divergence safety is handled by the caller (step.step_batch): worlds
    whose fat AABBs differ from world 0's get diag.pair_overflow raised —
    the exact condition under which world-0 pairing could differ from
    theirs. Reference analog: src/contact.c:296-359 persistence.
    """
    import dataclasses

    W = old_batch.key.shape[0]
    new_key = pairs0.key
    old_key0 = old_batch.key[0]
    Cn = old_key0.shape[0]
    pos = jnp.searchsorted(old_key0, new_key, method="sort")
    pos = jnp.minimum(pos, Cn - 1)

    # raw small-int/bool gathers have shown chip-only corruption in unvmapped
    # lane code (CLAUDE.md round-5 notes); transport via exact f32 instead.
    # keys reach max_shapes^2 < 2^24 only because INT32_MAX pads would not —
    # compare in key space after an exact clamp to the f32-safe sentinel.
    KSENT = jnp.float32(2 ** 24)
    okf = jnp.where(old_key0 == INT32_MAX, KSENT, old_key0.astype(jnp.float32))
    nkf = jnp.where(new_key == INT32_MAX, KSENT, new_key.astype(jnp.float32))
    found = (
        (tgather(okf, pos) == nkf)
        & (new_key != INT32_MAX)
        & (tgather(old_batch.alive[0].astype(jnp.float32), pos) > 0.5)
    )

    # sticky quartet is zero-width for the lane solvers (soft family)
    assert old_batch.friction_normal_a.shape[1] == 0, (
        "match_contacts_lane: sticky anchors not supported (lane solvers are the soft family)"
    )

    f32 = jnp.float32
    o = old_batch
    lanes = [
        o.normal,                      # 2
        o.anchor_a.reshape(W, Cn, 4),  # 4
        o.anchor_b.reshape(W, Cn, 4),  # 4
        o.separation,                  # 2
        o.normal_impulse,              # 2
        o.tangent_impulse,             # 2
        o.point_id.astype(f32),        # 2   (feature ids < 2^24: exact)
        o.persisted.astype(f32),       # 2
        o.point_count.astype(f32)[..., None],   # 1
        o.cache_count.astype(f32)[..., None],   # 1
        o.cache_index_a.astype(f32),   # 3
        o.cache_index_b.astype(f32),   # 3
    ]
    packed = jnp.concatenate([x.astype(f32) for x in lanes], axis=-1)  # [W, Cn, 28]
    L = packed.shape[-1]
    wide = jnp.moveaxis(packed, 0, 1).reshape(Cn, W * L)
    rows = tgather(wide, pos).reshape(Cn, W, L)
    rows = jnp.where(found[:, None, None], rows, 0.0)
    rows = jnp.moveaxis(rows, 1, 0)  # [W, Cn, L]

    def fpart(a, b, shape=None):
        v = rows[..., a:b]
        return v if shape is None else v.reshape((W, Cn) + shape)

    def ipart(a, b):
        return rows[..., a:b].astype(jnp.int32)

    # structure + material from world 0, broadcast
    sa, sb = pairs0.shape_a, pairs0.shape_b
    mat = jnp.stack([shapes0.friction, shapes0.restitution, _i2f(body_of0)], axis=-1)
    mat_a = tgather(mat, sa)
    mat_b = tgather(mat, sb)
    friction = jnp.sqrt(mat_a[:, 0] * mat_b[:, 0])
    restitution = jnp.maximum(mat_a[:, 1], mat_b[:, 1])
    color0 = jnp.where(
        found, tgather(o.color[0].astype(jnp.float32), pos).astype(jnp.int32), -1
    )

    def bc(x):
        return jnp.broadcast_to(x[None], (W,) + x.shape)

    return Contacts(
        key=bc(new_key),
        shape_a=bc(sa),
        shape_b=bc(sb),
        body_a=bc(_f2i(mat_a[:, 2])),
        body_b=bc(_f2i(mat_b[:, 2])),
        friction=bc(friction),
        restitution=bc(restitution),
        normal=fpart(0, 2),
        anchor_a=fpart(2, 6, (2, 2)),
        anchor_b=fpart(6, 10, (2, 2)),
        separation=fpart(10, 12),
        normal_impulse=fpart(12, 14),
        tangent_impulse=fpart(14, 16),
        point_id=ipart(16, 18),
        persisted=rows[..., 18:20] > 0.5,
        point_count=ipart(20, 21)[..., 0],
        friction_normal_a=o.friction_normal_a,
        friction_normal_b=o.friction_normal_b,
        friction_anchor_a=o.friction_anchor_a,
        friction_anchor_b=o.friction_anchor_b,
        friction_persisted=o.friction_persisted,
        cache_count=ipart(21, 22)[..., 0],
        cache_index_a=ipart(22, 25),
        cache_index_b=ipart(25, 28),
        color=bc(color0),
        alive=bc(pairs0.valid),
    )


def jointed_body_keys(joints, config: SimConfig) -> jnp.ndarray:
    """Sorted canonical body-pair keys for joints with collideConnected=False."""
    ba, bb = joints.body_a, joints.body_b
    key = jnp.minimum(ba, bb) * config.max_bodies + jnp.maximum(ba, bb)
    key = jnp.where(joints.alive & ~joints.collide_connected, key, INT32_MAX)
    return jnp.sort(key)


# --------------------------------------------------------- packed shape rows
#
# TPU row-gathers have a large fixed per-row cost (see CLAUDE.md), so all
# per-shape fields consulted per candidate pair are packed into ONE [S, 10]
# f32 matrix (int lanes bitcast) and gathered once per candidate set instead
# of once per field.
#
# lanes: [0:4] fat aabb | 4 body (i32) | 5 group (i32) | 6 mask (i32)
#        | 7 category (i32) | 8 flags (i32: 1=alive, 2=dynamic-body, 4=small)
#        | 9 extra (grid: cell hash as exact f32; sap: 0)

_F_BODY, _F_GROUP, _F_MASK, _F_CAT, _F_FLAGS, _F_EXTRA = 4, 5, 6, 7, 8, 9
_FL_ALIVE, _FL_DYN, _FL_SMALL = 1, 2, 4


# Int lanes ride f32 packs via the mantissa-bias trick, NOT a plain bitcast:
# a small int k bitcast to f32 is a DENORMAL (1 -> 1.4e-45), and the TPU
# flushes denormals to zero inside fused pack/gather pipelines (measured on
# v5e: stack+tgather and concat+tgather both zero every denormal lane, while
# a bare bitcast round-trip survives). Adding 0x4B000000 (the bit pattern of
# 2^23) first lands k in the mantissa of the NORMAL float 2^23 + k, which is
# FTZ-immune and bit-exact to transport; subtracting after the reverse
# bitcast recovers k exactly. Works for any |k| well clear of the wrap
# windows near ±0x4B000000 / ±0x35000000 — body/shape indices, counts,
# colors, flags, and pair keys (incl. the INT32_MAX sentinel, which maps to
# the normal float -8388607.5) all qualify. As a bonus, filter masks like
# 0xFFFFFFFF no longer transport as NaN bit patterns.
_I2F_BIAS = np.int32(0x4B000000)


def _i2f(x):
    return jax.lax.bitcast_convert_type(x.astype(jnp.int32) + _I2F_BIAS, jnp.float32)


def _f2i(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32) - _I2F_BIAS


def _pack_shape_rows(
    shapes: Shapes, body_type: jnp.ndarray, small: jnp.ndarray, extra: jnp.ndarray | None = None
) -> jnp.ndarray:
    """extra: optional f32 [S] payload for lane 9 (must be exactly
    representable — the grid packs its 23-bit cell hash via astype, which is
    FTZ-safe unlike a raw bitcast; see _I2F_BIAS)."""
    dyn = tgather(body_type, shapes.body) == 2
    flags = (
        shapes.alive.astype(jnp.int32) * _FL_ALIVE
        + dyn.astype(jnp.int32) * _FL_DYN
        + small.astype(jnp.int32) * _FL_SMALL
    )
    if extra is None:
        extra = jnp.zeros((shapes.fat_aabb.shape[0],), jnp.float32)
    return jnp.concatenate(
        [
            shapes.fat_aabb,
            _i2f(shapes.body)[:, None],
            _i2f(shapes.filter_group)[:, None],
            _i2f(shapes.filter_mask)[:, None],
            _i2f(shapes.filter_category)[:, None],
            _i2f(flags)[:, None],
            extra[:, None],
        ],
        axis=-1,
    )


def _pair_rules(rows_a, rows_b, jointed_keys, max_bodies: int):
    """Evaluate the s2PairQueryCallback rules (reference:
    src/broad_phase.c:166-258) on packed candidate rows. rows_a: [..., 10]
    (broadcastable against rows_b). Returns (valid mask, body_a, body_b)."""
    fa, fb = rows_a[..., 0:4], rows_b[..., 0:4]
    overlap = (
        (fa[..., 0] <= fb[..., 2]) & (fb[..., 0] <= fa[..., 2])
        & (fa[..., 1] <= fb[..., 3]) & (fb[..., 1] <= fa[..., 3])
    )
    body_a = _f2i(rows_a[..., _F_BODY])
    body_b = _f2i(rows_b[..., _F_BODY])
    flags_a = _f2i(rows_a[..., _F_FLAGS])
    flags_b = _f2i(rows_b[..., _F_FLAGS])
    valid = overlap & ((flags_a & flags_b & _FL_ALIVE) != 0)
    valid &= body_a != body_b
    # at least one dynamic
    valid &= ((flags_a | flags_b) & _FL_DYN) != 0
    # filters (reference: src/contact.h:70-79)
    ga = _f2i(rows_a[..., _F_GROUP])
    gb = _f2i(rows_b[..., _F_GROUP])
    same_group = (ga == gb) & (ga != 0)
    mask_ok = (
        ((_f2i(rows_a[..., _F_MASK]) & _f2i(rows_b[..., _F_CAT])) != 0)
        & ((_f2i(rows_a[..., _F_CAT]) & _f2i(rows_b[..., _F_MASK])) != 0)
    )
    valid &= jnp.where(same_group, ga > 0, mask_ok)
    # joint-connected suppression (reference: src/body.c:386-417)
    bkey = jnp.minimum(body_a, body_b) * max_bodies + jnp.maximum(body_a, body_b)
    valid &= ~(bkey[..., None] == jointed_keys).any(-1)
    return valid, body_a, body_b


# --------------------------------------------------------- hashed uniform grid

def _cell_hash(cx, cy):
    """Spatial hash of integer cell coords, masked to 23 bits so the value is
    exactly representable as f32 (astype transport in the packed rows —
    FTZ-safe, unlike a raw bitcast whose denormal patterns the TPU zeroes;
    see _I2F_BIAS). Collisions are harmless: they only merge far-apart cells
    into one bucket, adding candidates that the AABB test rejects — pairs are
    never missed because neighbors are looked up by hashing the neighbor's
    own coords (duplicate keys from a collision are dropped after
    compaction). At ~8k shapes and 2^23 buckets the expected extra-candidate
    load from masking is << 1 per scene."""
    h = cx * jnp.int32(-1640531527) + cy * jnp.int32(97143011)
    h = h ^ (h >> 13)
    return h & jnp.int32(0x7FFFFF)


def find_pairs_grid(shapes: Shapes, body_type: jnp.ndarray, jointed_keys: jnp.ndarray, config: SimConfig) -> PairResult:
    """Uniform-grid pair finding: shapes bin by fat-AABB center into
    `config.grid_cell`-sized cells (sorted by cell hash); each shape tests the
    <= cell_capacity occupants of the HALF neighborhood {self, E, NW, N, NE}
    (each unordered cell pair has exactly one of its two direction vectors in
    that set, so every pair is enumerated once, not twice). Shapes larger
    than a cell ("big": grounds, ramps, arena walls, giant boxes) live in a
    separate list of capacity max_big_shapes and are tested against
    everything.

    Scales to dense stacked scenes (pyramids) where sweep-and-prune windows
    blow up: a pyramid column overlaps O(base) shapes in x but only O(1) per
    cell."""
    S = config.max_shapes
    M = config.cell_capacity
    G = config.max_big_shapes
    cell = config.grid_cell
    fat = shapes.fat_aabb
    alive = shapes.alive

    w = fat[:, 2] - fat[:, 0]
    h = fat[:, 3] - fat[:, 1]
    big = alive & ((w > cell) | (h > cell))
    small = alive & ~big

    cx = jnp.floor(0.5 * (fat[:, 0] + fat[:, 2]) / cell).astype(jnp.int32)
    cy = jnp.floor(0.5 * (fat[:, 1] + fat[:, 3]) / cell).astype(jnp.int32)
    hashes = jnp.where(small, _cell_hash(cx, cy), INT32_MAX)

    order = jnp.argsort(hashes)          # small shapes sorted by cell hash
    sorted_hash = tgather(hashes, order)

    # HALF neighborhood: each unordered pair of distinct cells has exactly
    # one of its two direction vectors in {E, NW, N, NE}, so looking up only
    # these four neighbors (plus the own cell with an a<b tie-break) visits
    # every pair once instead of twice — 5M instead of 9M candidate columns
    # in the big packed gather below, and one [5S] sorted-search instead of
    # two [9S] ones.
    neighbor_offsets = [(0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]
    NO = len(neighbor_offsets)
    overflow = jnp.zeros((), bool)
    lanes = jnp.arange(M)
    nh_all = jnp.stack([_cell_hash(cx + dx, cy + dy) for dx, dy in neighbor_offsets])  # [NO,S]
    if S <= 1024:
        # compare-count searchsorted: [NO,S,S] elementwise is cheap at small
        # S (scan-mode binary search is gather-bound under vmap)
        lo = (sorted_hash[None, None, :] < nh_all[:, :, None]).sum(-1)   # [NO,S]
    else:
        # flagship scenes (Pyramid-100: S ~ 5k): [NO,S,S] compare-counts are
        # O(S^2) each; one sorted-search over [NO*S] replaces them
        lo = jnp.searchsorted(sorted_hash, nh_all.reshape(-1), side="left", method="sort").reshape(NO, S)
    # candidate validity comes from HASH EQUALITY (the packed rows carry each
    # shape's cell hash in the extra lane), not from an upper-bound search:
    # candidate j of lookup (o,s) is real iff its own hash equals the looked-
    # up neighbor hash. This kills the side="right" search and the counts.
    cand_rank = lo[:, :, None] + lanes[None, None, :]                    # [NO,S,M]
    pos = jnp.minimum(cand_rank, S - 1)
    in_range = cand_rank < S
    # cell-capacity overflow: the (M+1)-th occupant of some looked-up bucket
    # still matches the neighbor hash
    ovf_rank = lo + M
    ovf_hash = tgather(sorted_hash, jnp.minimum(ovf_rank, S - 1))
    overflow = overflow | jnp.any(small[None, :] & (ovf_rank < S) & (ovf_hash == nh_all))

    grid_cand = tgather(order, pos.transpose(1, 0, 2).reshape(S, NO * M))  # [S, NO*M]
    grid_valid = (in_range & small[None, :, None]).transpose(1, 0, 2).reshape(S, NO * M)

    # big-shape candidates: indices of big shapes, padded. One flat
    # max-scatter with non-big shapes routed to a sink slot (the old .set
    # formulation let non-big writers clobber slot G-1 when exactly G big
    # shapes existed).
    big_rank = jnp.cumsum(big) - 1
    big_tbl = jnp.zeros((G + 1,), jnp.int32)
    big_cells = jnp.where(big, jnp.minimum(big_rank, G - 1), G)
    big_tbl = tscatter_max(big_tbl, big_cells, jnp.arange(S, dtype=jnp.int32))
    big_idx = big_tbl[:G]
    big_slot_valid = jnp.arange(G) < jnp.minimum(big.sum(), G)
    overflow = overflow | (big.sum() > G)

    big_cand = jnp.broadcast_to(big_idx[None, :], (S, G))
    big_cand_valid = jnp.broadcast_to(big_slot_valid[None, :], (S, G)) & alive[:, None]

    idx = jnp.arange(S, dtype=jnp.int32)
    a_idx = jnp.broadcast_to(idx[:, None], (S, grid_cand.shape[1] + G))
    b_idx = jnp.concatenate([grid_cand, big_cand], axis=1)
    valid = jnp.concatenate([grid_valid, big_cand_valid], axis=1)

    # one packed gather supplies every per-candidate field (a-side rows are
    # the shapes themselves: no gather); the extra lane carries each shape's
    # 23-bit cell hash (exact as f32) for candidate validation
    packed = _pack_shape_rows(
        shapes, body_type, small,
        extra=jnp.where(small, hashes, -1).astype(jnp.float32),
    )
    rows_a = packed[:, None, :]                                   # [S,1,10]
    rows_b = tgather(packed, b_idx)                               # [S,NO*M+G,10]

    # candidate is real iff its own cell hash equals the looked-up neighbor
    # hash (dead / big / out-of-bucket slots can't match: their lane is -1)
    nh_f = jnp.broadcast_to(
        nh_all.astype(jnp.float32).T[:, :, None], (S, NO, M)
    ).reshape(S, NO * M)
    hash_ok = rows_b[:, : NO * M, _F_EXTRA] == nh_f
    # own-cell block (first M columns): a<b visits each in-cell pair once;
    # directional blocks already visit each cross-cell pair from one side
    half_ok = jnp.concatenate(
        [a_idx[:, :M] < b_idx[:, :M], jnp.ones((S, (NO - 1) * M), bool)], axis=1
    )
    # big-b columns: small-a keeps unconditionally (canonicalized below);
    # big-big dedups by a<b (every alive shape scans the big list, so the
    # other side sees the pair too); a==b is excluded by a<b
    big_ok = small[:, None] | (a_idx[:, NO * M :] < b_idx[:, NO * M :])
    valid &= jnp.concatenate([hash_ok & half_ok, big_ok], axis=1)

    rules_ok, _, _ = _pair_rules(rows_a, rows_b, jointed_keys, config.max_bodies)
    valid &= rules_ok

    a_c = jnp.minimum(a_idx, b_idx)
    b_c = jnp.maximum(a_idx, b_idx)
    pair_key = jnp.where(valid, a_c * S + b_c, INT32_MAX)

    C = config.max_contacts
    flat_key = pair_key.reshape(-1)
    top_key, count = _compact_keys(flat_key, C)
    # drop duplicates (possible only under a neighbor-cell hash collision):
    # keys are ascending after compaction, so duplicates are adjacent. Re-sort
    # after dropping so the table stays ascending — next step's match_contacts
    # searchsorted requires it (a [C] sort is cheap).
    dup = jnp.concatenate([jnp.zeros((1,), bool), top_key[1:] == top_key[:-1]])
    top_key = jnp.sort(jnp.where(dup, INT32_MAX, top_key))
    # shape indices decode from the key (S^2 < 2^31 is checked at freeze)
    filled = top_key != INT32_MAX
    sa = jnp.where(filled, top_key // S, 0)
    sb = jnp.where(filled, top_key % S, 0)
    overflow = overflow | (count > C)
    return PairResult(sa, sb, top_key, filled, count, overflow)
