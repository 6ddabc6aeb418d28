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

from ..config import AABB_MARGIN, SPECULATIVE_DISTANCE, SimConfig
from .gather import tgather
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

    lo_s = tgather(lo, order)
    hi_s = tgather(hi, order)
    fat_s = tgather(fat, order)

    # candidates: for rank r, partners at ranks r+1..r+K
    ranks = jnp.arange(S)
    partner_rank = ranks[:, None] + 1 + jnp.arange(K)[None, :]      # [S,K]
    in_range = partner_rank < S
    partner_rank_c = jnp.minimum(partner_rank, S - 1)

    a_idx = order[:, None] * jnp.ones((1, K), jnp.int32)             # [S,K]
    b_idx = tgather(order, partner_rank_c)                           # [S,K]

    # sweep overlap on the sort axis
    overlap_axis = tgather(lo_s, partner_rank_c) <= hi_s[:, None]
    # full AABB overlap
    fb = tgather(fat_s, partner_rank_c)                              # [S,K,4]
    fa = fat_s[:, None, :]
    overlap = (
        (fa[..., 0] <= fb[..., 2]) & (fb[..., 0] <= fa[..., 2])
        & (fa[..., 1] <= fb[..., 3]) & (fb[..., 1] <= fa[..., 3])
    )

    valid = in_range & overlap_axis & overlap
    valid &= tgather(alive, a_idx) & tgather(alive, b_idx)

    # window overflow: the (K+1)-th successor still sweep-overlaps
    last_rank = ranks + 1 + K
    last_ok = last_rank < S
    last_lo = tgather(lo_s, jnp.minimum(last_rank, S - 1))
    window_overflow = jnp.any(last_ok & (last_lo <= hi_s) & (sort_key != jnp.inf))

    # pair rules (reference: src/broad_phase.c:166-258)
    body_a = tgather(shapes.body, a_idx)
    body_b = tgather(shapes.body, b_idx)
    valid &= body_a != body_b
    # at least one dynamic
    valid &= (tgather(body_type, body_a) == 2) | (tgather(body_type, body_b) == 2)
    # filters (reference: src/contact.h:70-79)
    ga = tgather(shapes.filter_group, a_idx)
    gb = tgather(shapes.filter_group, b_idx)
    same_group = (ga == gb) & (ga != 0)
    mask_ok = (
        ((tgather(shapes.filter_mask, a_idx) & tgather(shapes.filter_category, b_idx)) != 0)
        & ((tgather(shapes.filter_category, a_idx) & tgather(shapes.filter_mask, b_idx)) != 0)
    )
    valid &= jnp.where(same_group, ga > 0, mask_ok)
    # joint-connected suppression (reference: src/body.c:386-417)
    bkey = jnp.minimum(body_a, body_b) * config.max_bodies + jnp.maximum(body_a, body_b)
    # membership test by direct comparison: the jointed list is tiny and
    # searchsorted's scan-mode binary search is gather-bound under vmap
    valid &= ~(bkey[..., None] == jointed_keys[None, None, :]).any(-1)

    # canonical order: a < b
    a_c = jnp.minimum(a_idx, b_idx)
    b_c = jnp.maximum(a_idx, b_idx)
    pair_key = jnp.where(valid, a_c * S + b_c, INT32_MAX)

    # compact to C slots, sorted by key (dedup impossible: each unordered pair
    # appears once in the window scheme)
    C = config.max_contacts
    flat_key = pair_key.reshape(-1)
    flat_a = a_c.reshape(-1)
    flat_b = b_c.reshape(-1)
    count = (flat_key != INT32_MAX).sum()

    top_key, top_pos = jax.lax.top_k(-flat_key, C)
    top_key = -top_key
    sa = jnp.where(top_key != INT32_MAX, tgather(flat_a, top_pos), 0)
    sb = jnp.where(top_key != INT32_MAX, tgather(flat_b, top_pos), 0)

    overflow = window_overflow | (count > C)
    return PairResult(sa, sb, top_key, top_key != INT32_MAX, count, overflow)


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
    found = (tgather(old_key, pos) == new_key) & (new_key != INT32_MAX) & tgather(old.alive, pos)

    def carry(old_arr, default_val):
        gathered = tgather(old_arr, pos)
        if gathered.ndim == 1:
            return jnp.where(found, gathered, default_val)
        return jnp.where(found.reshape(found.shape + (1,) * (gathered.ndim - 1)), gathered, default_val)

    sa, sb = pairs.shape_a, pairs.shape_b
    friction = jnp.sqrt(tgather(shapes.friction, sa) * tgather(shapes.friction, sb))          # contact.c:42-45
    restitution = jnp.maximum(tgather(shapes.restitution, sa), tgather(shapes.restitution, sb))  # contact.c:47-52

    C = new_key.shape[0]
    z2 = jnp.zeros((C, 2), jnp.float32)
    z22 = jnp.zeros((C, 2, 2), jnp.float32)

    return Contacts(
        key=new_key,
        shape_a=sa,
        shape_b=sb,
        body_a=tgather(body_of, sa),
        body_b=tgather(body_of, sb),
        friction=friction,
        restitution=restitution,
        normal=carry(old.normal, z2),
        anchor_a=carry(old.anchor_a, z22),
        anchor_b=carry(old.anchor_b, z22),
        separation=carry(old.separation, z2),
        normal_impulse=carry(old.normal_impulse, z2),
        tangent_impulse=carry(old.tangent_impulse, z2),
        point_id=carry(old.point_id, jnp.zeros((C, 2), jnp.int32)),
        persisted=carry(old.persisted, jnp.zeros((C, 2), bool)),
        point_count=carry(old.point_count, jnp.zeros((C,), jnp.int32)),
        friction_normal_a=carry(old.friction_normal_a, z22),
        friction_normal_b=carry(old.friction_normal_b, z22),
        friction_anchor_a=carry(old.friction_anchor_a, z22),
        friction_anchor_b=carry(old.friction_anchor_b, z22),
        friction_persisted=carry(old.friction_persisted, jnp.zeros((C,), bool)),
        cache_count=carry(old.cache_count, jnp.zeros((C,), jnp.int32)),
        cache_index_a=carry(old.cache_index_a, jnp.zeros((C, 3), jnp.int32)),
        cache_index_b=carry(old.cache_index_b, jnp.zeros((C, 3), jnp.int32)),
        alive=pairs.valid,
    )


def jointed_body_keys(joints, config: SimConfig) -> jnp.ndarray:
    """Sorted canonical body-pair keys for joints with collideConnected=False."""
    ba, bb = joints.body_a, joints.body_b
    key = jnp.minimum(ba, bb) * config.max_bodies + jnp.maximum(ba, bb)
    key = jnp.where(joints.alive & ~joints.collide_connected, key, INT32_MAX)
    return jnp.sort(key)


# --------------------------------------------------------- hashed uniform grid

def _cell_hash(cx, cy):
    """Spatial hash of integer cell coords. Collisions are harmless: they only
    merge far-apart cells into one bucket, adding candidates that the AABB
    test rejects — pairs are never missed because neighbors are looked up by
    hashing the neighbor's own coords."""
    h = cx * jnp.int32(-1640531527) + cy * jnp.int32(97143011)
    h = h ^ (h >> 13)
    return h


def find_pairs_grid(shapes: Shapes, body_type: jnp.ndarray, jointed_keys: jnp.ndarray, config: SimConfig) -> PairResult:
    """Uniform-grid pair finding: shapes bin by fat-AABB center into
    `config.grid_cell`-sized cells (sorted by cell hash); each shape tests the
    <= cell_capacity occupants of its 3x3 neighborhood. Shapes larger than a
    cell ("big": grounds, ramps, arena walls, giant boxes) live in a separate
    list of capacity max_big_shapes and are tested against everything.

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

    # per-shape candidate lists from the 3x3 neighborhood
    neighbor_offsets = [(-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]
    cand_list = []
    cand_valid = []
    overflow = jnp.zeros((), bool)
    lanes = jnp.arange(M)
    for dx, dy in neighbor_offsets:
        nh = _cell_hash(cx + dx, cy + dy)
        # compare-count searchsorted ([S,S] is small; scan-mode binary search
        # is gather-bound under vmap)
        lo = (sorted_hash[None, :] < nh[:, None]).sum(1)
        hi = (sorted_hash[None, :] <= nh[:, None]).sum(1)
        count = hi - lo
        overflow = overflow | jnp.any(small & (count > M))
        pos = jnp.minimum(lo[:, None] + lanes[None, :], S - 1)   # [S,M]
        cand = tgather(order, pos)
        valid = (lanes[None, :] < count[:, None]) & small[:, None]
        cand_list.append(cand)
        cand_valid.append(valid)

    grid_cand = jnp.concatenate(cand_list, axis=1)      # [S, 9M]
    grid_valid = jnp.concatenate(cand_valid, axis=1)

    # big-shape candidates: indices of big shapes, padded
    big_rank = jnp.cumsum(big) - 1
    big_idx = jnp.full((G,), 0, jnp.int32)
    big_idx = big_idx.at[jnp.where(big, jnp.minimum(big_rank, G - 1), G - 1)].set(
        jnp.arange(S, dtype=jnp.int32), mode="drop"
    )
    big_slot_valid = jnp.arange(G) < jnp.minimum(big.sum(), G)
    overflow = overflow | (big.sum() > G)

    big_cand = jnp.broadcast_to(big_idx[None, :], (S, G))
    big_cand_valid = jnp.broadcast_to(big_slot_valid[None, :], (S, G)) & alive[:, None]

    idx = jnp.arange(S, dtype=jnp.int32)
    a_idx = jnp.broadcast_to(idx[:, None], (S, grid_cand.shape[1] + G))
    b_idx = jnp.concatenate([grid_cand, big_cand], axis=1)
    valid = jnp.concatenate([grid_valid, big_cand_valid], axis=1)

    # keep each unordered pair once: grid-grid and big-big by a<b; small-a vs
    # big-b always kept from the small side (a may be > b), so canonicalize
    # below and drop a==b
    valid &= a_idx != b_idx
    small_a = tgather(small, a_idx)
    both_small = small_a & tgather(small, b_idx)
    both_big = tgather(big, a_idx) & tgather(big, b_idx)
    valid &= jnp.where(both_small | both_big, a_idx < b_idx, small_a)

    # AABB overlap
    fa = tgather(fat, a_idx)
    fb = tgather(fat, b_idx)
    valid &= (
        (fa[..., 0] <= fb[..., 2]) & (fb[..., 0] <= fa[..., 2])
        & (fa[..., 1] <= fb[..., 3]) & (fb[..., 1] <= fa[..., 3])
    )

    # pair rules (same as find_pairs)
    body_a = tgather(shapes.body, a_idx)
    body_b = tgather(shapes.body, b_idx)
    valid &= body_a != body_b
    valid &= (tgather(body_type, body_a) == 2) | (tgather(body_type, body_b) == 2)
    ga = tgather(shapes.filter_group, a_idx)
    gb = tgather(shapes.filter_group, b_idx)
    same_group = (ga == gb) & (ga != 0)
    mask_ok = (
        ((tgather(shapes.filter_mask, a_idx) & tgather(shapes.filter_category, b_idx)) != 0)
        & ((tgather(shapes.filter_category, a_idx) & tgather(shapes.filter_mask, b_idx)) != 0)
    )
    valid &= jnp.where(same_group, ga > 0, mask_ok)
    bkey = jnp.minimum(body_a, body_b) * config.max_bodies + jnp.maximum(body_a, body_b)
    valid &= ~(bkey[..., None] == jointed_keys[None, None, :]).any(-1)

    a_c = jnp.minimum(a_idx, b_idx)
    b_c = jnp.maximum(a_idx, b_idx)
    pair_key = jnp.where(valid, a_c * S + b_c, INT32_MAX)

    C = config.max_contacts
    flat_key = pair_key.reshape(-1)
    flat_a = a_c.reshape(-1)
    flat_b = b_c.reshape(-1)
    count = (flat_key != INT32_MAX).sum()

    top_key, top_pos = jax.lax.top_k(-flat_key, C)
    top_key = -top_key
    # drop duplicates (possible only under a 3x3-neighbor hash collision):
    # keys are ascending after top_k, so duplicates are adjacent
    dup = jnp.concatenate([jnp.zeros((1,), bool), top_key[1:] == top_key[:-1]])
    top_key = jnp.where(dup, INT32_MAX, top_key)
    sa = jnp.where(top_key != INT32_MAX, tgather(flat_a, top_pos), 0)
    sb = jnp.where(top_key != INT32_MAX, tgather(flat_b, top_pos), 0)
    overflow = overflow | (count > C)
    return PairResult(sa, sb, top_key, top_key != INT32_MAX, count, overflow)
