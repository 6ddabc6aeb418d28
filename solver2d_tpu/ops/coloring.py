"""Greedy graph coloring of the constraint graph, on device.

The reference solves constraints with *sequential* Gauss-Seidel sweeps whose
ordering is fixed by contact creation order (reference: src/contact.c:21-38);
its `B2_GRAPH_COLOR` flag (src/world.h:12) signals the intended parallel
design that this module makes real: constraints are partitioned into colors
such that no two constraints in a color share a *dynamic* body; each GS
iteration then becomes a loop over colors where every color solves all its
constraints in parallel with disjoint scatter-writes (equivalent to a
sequential sweep in some order within the iteration).

Static/kinematic bodies are excluded from the conflict graph (their
velocities never change), which bounds the needed color count by the
dynamic-constraint degree — e.g. a ground body touching hundreds of boxes
does not serialize.

Algorithm: per color, a few rounds of deterministic Luby-style maximal-
independent-set selection with *hashed* priorities (a Knuth multiplicative
hash of the constraint index — unique, reproducible, and crucially not
index-ordered: plain min-index selection degenerates to one constraint per
color on chains like Bridge/Ball&Chain). Constraints still uncolored after
max_colors-1 colors land in the final bucket, which may have conflicts
(scatter-add there is effectively a Jacobi fallback); the count is reported
in diagnostics so scenes can raise max_colors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gather import tgather, tscatter_add, tscatter_max

INT32_MAX = jnp.iinfo(jnp.int32).max


def _hash_priority(idx):
    """INJECTIVE deterministic pseudo-random priority per index: a Knuth
    multiplicative hash reduced mod 2^31. Odd multipliers are invertible mod
    any power of two, so distinct indices always get distinct priorities —
    a priority collision between two constraints sharing a body would let
    both claim the same (body, color) cell forever (sticky constraint drop)."""
    h = idx * jnp.int32(-1640531527)  # 2654435761 wrapped
    return jnp.bitwise_and(h, jnp.int32(0x7FFFFFFF))


def color_graph(body_a, body_b, active, dynamic_mask, num_bodies: int, max_colors: int, inner_rounds: int = 4):
    """Returns (color i32 [N] in [0, max_colors), overflow count).

    body_a/body_b: i32 [N] endpoints; active: bool [N];
    dynamic_mask: bool [B]."""
    N = body_a.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    pri = _hash_priority(idx)

    dyn_a = tgather(dynamic_mask, body_a)
    dyn_b = tgather(dynamic_mask, body_b)
    # non-dynamic endpoints point at a dummy sink slot
    slot_a = jnp.where(dyn_a, body_a, num_bodies)
    slot_b = jnp.where(dyn_b, body_b, num_bodies)

    # Dense incidence [B+1, N]: body row b is a dynamic endpoint of
    # constraint c; the sink row stays all-False. Built once, then every MIS
    # round is two masked reductions over it — batched scatters (the
    # .at[].min/.max formulation) are ~1.6 ms each under vmap on TPU, and
    # the scan below would need 5 per round.
    rows = jnp.arange(num_bodies + 1, dtype=jnp.int32)[:, None]
    inc = ((slot_a[None, :] == rows) | (slot_b[None, :] == rows)) & (rows < num_bodies)
    # Pin the incidence matrix: without the barrier XLA's cheap-producer
    # duplication rematerializes the [B+1, N] build (iota+compare+or+and)
    # inside every unrolled MIS round — ~1000 huge-tensor ops and tens of GB
    # of HBM traffic per step at 128 worlds (seen directly in optimized HLO).
    inc = jax.lax.optimization_barrier(inc)

    def one_color(uncolored, _):
        used0 = jnp.zeros((num_bodies + 1,), bool)
        sel0 = jnp.zeros((N,), bool)

        def inner(carry, _):
            used, selected = carry
            elig = uncolored & active & ~selected & ~tgather(used, slot_a) & ~tgather(used, slot_b)
            cand_pri = jnp.where(elig, pri, INT32_MAX)
            owner = jnp.where(inc, cand_pri[None, :], INT32_MAX).min(axis=1)  # [B+1]
            win = elig & (~dyn_a | (tgather(owner, slot_a) == pri)) & (~dyn_b | (tgather(owner, slot_b) == pri))
            selected = selected | win
            used = used | (inc & win[None, :]).any(axis=1)
            return (used, selected), None

        carry = (used0, sel0)
        for _r in range(inner_rounds):   # unrolled: while-loop trips are ~ms on TPU
            carry, _ = inner(carry, None)
        (_, selected) = carry
        return uncolored & ~selected, selected

    uncolored0 = jnp.ones((N,), bool)
    uncolored = uncolored0
    sels = []
    for _c in range(max_colors - 1):     # unrolled (see above)
        uncolored, sel = one_color(uncolored, None)
        sels.append(sel)
    selected_rounds = jnp.stack(sels)
    # selected_rounds: [max_colors-1, N]; each constraint in <= 1 round
    rounds = jnp.arange(max_colors - 1, dtype=jnp.int32)
    sel_color = jnp.where(selected_rounds, rounds[:, None], max_colors - 1).min(axis=0)
    color = jnp.where(active, sel_color, max_colors - 1)
    overflow = (uncolored & active).sum()
    return color, overflow


def assign_colors(carried, body_a, body_b, active, dynamic_mask, num_bodies: int,
                  max_colors: int, rounds: int = 8, bucket_cap: int = 0):
    """Persistent incremental coloring: validate colors carried from the
    previous step, then color the (few) new constraints with Jones-Plassmann
    first-fit rounds using hashed-priority conflict resolution.

    The key economics: constraints persist across steps (the contact table is
    persistent, joints are long-lived), so in steady state every carried color
    is already a valid proper coloring and the validation pass is the whole
    cost — no MIS iteration over a [B, N] incidence matrix. Only newly created
    constraints (carried == -1) run the proposal rounds. Chain pathologies are
    avoided the same way as `color_graph` (hashed priorities), and stragglers
    that stay uncolored after `rounds` simply retry next step (skipped and
    counted in diagnostics for the one step).

    The validation pass also self-heals: if an external edit (checkpoint
    surgery, body re-typing via utils/runtime) breaks the disjointness
    invariant, the losing constraint drops to -1 and recolors.

    carried: i32 [N] previous color or -1; returns (color i32 [N] with -1 for
    uncolored, overflow i32 count). Requires max_colors <= 30 (bitmask).

    bucket_cap > 0 makes new assignments CAPACITY-AWARE for the bucketed
    solve (see build_color_buckets): a color whose current population is at
    or above the cap is masked out of the free set, so first-fit spreads new
    constraints into colors with bucket space (a balanced coloring). Carried
    colors are not evicted by capacity — build_color_buckets drops the
    over-cap tail to -1 and they re-enter here the next step."""
    assert max_colors <= 30, "assign_colors packs colors into an i32 bitmask"
    N = body_a.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    pri = _hash_priority(idx)

    dyn_a = tgather(dynamic_mask, body_a)
    dyn_b = tgather(dynamic_mask, body_b)
    slot_a = jnp.where(dyn_a, body_a, num_bodies)
    slot_b = jnp.where(dyn_b, body_b, num_bodies)

    # Out-of-range carried colors (checkpoint saved under a larger
    # max_colors, external state surgery) must drop to -1 and recolor:
    # otherwise body*max_colors + c aliases another body's cell and
    # 1 << color is undefined for color >= 31.
    color = jnp.where(active & (carried >= 0) & (carried < max_colors), carried, -1)
    full_mask = jnp.int32((1 << max_colors) - 1)
    tbl_size = (num_bodies + 1) * max_colors

    slots_ab = jnp.concatenate([slot_a, slot_b])

    def validate(color):
        """Drop to -1 any colored constraint that doesn't own its (body,
        color) cell at both dynamic endpoints (priority-max wins). One
        concatenated scatter + one concatenated gather."""
        colored = active & (color >= 0)
        c = jnp.maximum(color, 0)
        claim = jnp.where(colored, pri, -1)
        tbl = jnp.full((tbl_size + 1,), -1, jnp.int32)
        cells = jnp.where(jnp.concatenate([colored, colored]), slots_ab * max_colors + jnp.concatenate([c, c]), tbl_size)
        tbl = tscatter_max(tbl, cells, jnp.concatenate([claim, claim]))
        got = tgather(tbl, cells)
        own = (~dyn_a | (got[:N] == pri)) & (~dyn_b | (got[N:] == pri))
        return jnp.where(colored & ~own, -1, color), colored & own

    # One mandatory validate establishes the invariant "every colored lane
    # owns its cells" (and self-heals external corruption); then first-fit
    # rounds run in a lax.while_loop that exits as soon as nothing is
    # uncolored. In steady state (persistent contact table, no new
    # constraints) that is ZERO rounds — measured 34.9 -> ~5 ms/step at 64
    # worlds x 211 bodies, where the old unconditionally-unrolled 8 rounds
    # were the largest non-solver stage. Only steps that actually create
    # constraints pay rounds, and only as many as conflicts require.
    color, _ = validate(color)

    def round_cond(carry):
        color, r = carry
        return (r < rounds) & (active & (color < 0)).any()

    def round_body(carry):
        color, r = carry
        ok = active & (color >= 0)
        # used-color bitmask per body; surviving colors are distinct per body
        # (the validate invariant), so scatter-add == bitwise OR
        bit = jnp.where(ok, jnp.int32(1) << jnp.maximum(color, 0), 0)
        used = jnp.zeros((num_bodies + 1,), jnp.int32)
        ok2 = jnp.concatenate([ok, ok])
        used = tscatter_add(used, jnp.where(ok2, slots_ab, num_bodies), jnp.concatenate([bit, bit]))
        rows = tgather(used, slots_ab)
        free = ~(jnp.where(dyn_a, rows[:N], 0) | jnp.where(dyn_b, rows[N:], 0)) & full_mask
        if bucket_cap > 0:
            # mask colors whose population already fills their solve bucket
            cnt = jnp.zeros((max_colors + 1,), jnp.int32)
            cnt = tscatter_add(cnt, jnp.where(ok, color, max_colors), jnp.ones((N,), jnp.int32))
            full_colors = (
                jnp.where(cnt[:max_colors] >= bucket_cap,
                          jnp.int32(1) << jnp.arange(max_colors, dtype=jnp.int32), 0)
            ).sum()
            free = free & ~full_colors
        lowbit = free & -free
        # log2 of a power of two <= 2^30 is exact in f32
        newc = jnp.log2(jnp.maximum(lowbit, 1).astype(jnp.float32)).astype(jnp.int32)
        propose = active & (color < 0) & (free != 0)
        color = jnp.where(propose, newc, color)
        # re-validate: resolves conflicts among simultaneous proposals
        # (losers drop back to -1 and retry with an updated free mask);
        # idempotent on already-validated lanes
        color, _ = validate(color)
        return color, r + 1

    color, _ = jax.lax.while_loop(round_cond, round_body, (color, jnp.int32(0)))
    overflow = (active & (color < 0)).sum()
    return color, overflow


def build_body_map(body_a, body_b, color, active, write_a, write_b, num_bodies: int, max_colors: int):
    """Per-body constraint lookup table: slot[b, k] = index of the (single)
    color-k constraint that writes body b, or -1.

    This is the key to scatter-free Gauss-Seidel on TPU: within a color every
    dynamic body is touched by at most one constraint, so the velocity update
    can be applied by a dense GATHER over bodies (fast, vectorized) instead of
    a scatter over constraints (slow on TPU). One scatter builds the table per
    step; every colored solve pass then only gathers.

    The final color bucket may hold conflicting (overflow) constraints; there
    last-writer-wins, so callers apply that bucket with the scatter path.

    write_a/write_b: bool [N], whether the constraint writes that endpoint
    (dynamic body; mouse joints never write body A).

    One flat max-scatter (tscatter semantics clamp rather than drop, so dead
    lanes route to an explicit sink cell; conflicting writers resolve to the
    max index, and `make_body_map` derives the winner from the same table)."""
    N = body_a.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    c = jnp.clip(color, 0, max_colors - 1)
    sink = num_bodies * max_colors
    cell_a = jnp.where(write_a & active, body_a * max_colors + c, sink)
    cell_b = jnp.where(write_b & active, body_b * max_colors + c, sink)
    slot = jnp.full((num_bodies * max_colors + 1,), -1, jnp.int32)
    slot = tscatter_max(slot, jnp.concatenate([cell_a, cell_b]), jnp.concatenate([idx, idx]))
    return slot[: num_bodies * max_colors].reshape(num_bodies, max_colors)


def build_color_buckets(color, active, max_colors: int, cap: int):
    """Color-major bucket table for the bucketed Gauss-Seidel solve.

    Returns (bucket i32 [max_colors*cap], new_color i32 [N], dropped i32 []):
    bucket[k*cap + r] = index of the r-th color-k constraint (or -1). Each
    unrolled solve phase then statically slices ITS bucket and processes only
    ~N/max_colors rows instead of masking all N — the dense path re-solves
    every constraint once per color, so bucketing removes the max_colors x
    redundancy in both math and row-gather traffic.

    Constraints beyond a color's cap are dropped for this step (skipped like
    color overflow, reference analog: skipped constraints simply don't solve)
    and their color is reset to -1 in new_color so the capacity-aware
    incremental coloring reassigns them into a color with space next step.
    """
    N = color.shape[0]
    K = max_colors
    idx = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(active & (color >= 0), jnp.clip(color, 0, K - 1), K).astype(jnp.int32)
    order = jnp.argsort(key * jnp.int32(N) + idx).astype(jnp.int32)
    skey = tgather(key, order)
    starts = jnp.searchsorted(skey, jnp.arange(K, dtype=jnp.int32), side="left").astype(jnp.int32)
    rank = idx - tgather(starts, jnp.clip(skey, 0, K - 1))
    ok = (skey < K) & (rank < cap)
    cell = jnp.where(ok, jnp.clip(skey, 0, K - 1) * cap + rank, K * cap)
    table = jnp.full((K * cap + 1,), -1, jnp.int32)
    table = tscatter_max(table, cell, jnp.where(ok, order, -1))
    bucket = table[: K * cap]

    dropped_sorted = (skey < K) & ~ok
    drop_tbl = jnp.zeros((N,), jnp.int32)
    drop_tbl = tscatter_max(drop_tbl, order, dropped_sorted.astype(jnp.int32))
    new_color = jnp.where(drop_tbl > 0, -1, color)
    return bucket, new_color, dropped_sorted.sum().astype(jnp.int32)
