"""Greedy graph coloring of the constraint graph, on device.

The reference solves constraints with *sequential* Gauss-Seidel sweeps whose
ordering is fixed by contact creation order (reference: src/contact.c:21-38);
its `B2_GRAPH_COLOR` flag (src/world.h:12) signals the intended parallel
design that this module makes real: constraints are partitioned into colors
such that no two constraints in a color share a *dynamic* body; each GS
iteration then becomes a loop over colors where every color solves all its
constraints in parallel with disjoint scatter-writes (bitwise-equal to some
sequential ordering within the iteration).

Static/kinematic bodies are excluded from the conflict graph (their velocities
never change), which bounds the needed color count by the dynamic-contact
degree — e.g. a ground body touching hundreds of boxes does not serialize.

Deterministic: selection is by constraint index priority (min-index wins via
scatter-min), so coloring is reproducible run to run. Constraints left over
after max_colors-1 rounds land in the final bucket, which may have conflicts
(scatter-add there makes it effectively Jacobi); the count is reported in
diagnostics so scenes can raise max_colors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max


def color_graph(body_a, body_b, active, dynamic_mask, num_bodies: int, max_colors: int):
    """Returns color i32 [N] in [0, max_colors); inactive constraints get
    max_colors-1. Also returns overflow count (active constraints that
    couldn't get a conflict-free color).

    body_a/body_b: i32 [N] endpoints; active: bool [N];
    dynamic_mask: bool [B] whether each body is dynamic."""
    N = body_a.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)

    dyn_a = dynamic_mask[body_a]
    dyn_b = dynamic_mask[body_b]

    def round_fn(carry, _):
        color, uncolored = carry
        cand = uncolored & active
        cand_idx = jnp.where(cand, idx, INT32_MAX)

        # min constraint index per dynamic body endpoint (slot num_bodies is a
        # dummy sink for non-dynamic endpoints)
        owner = jnp.full((num_bodies + 1,), INT32_MAX, jnp.int32)
        owner = owner.at[jnp.where(dyn_a, body_a, num_bodies)].min(
            jnp.where(dyn_a, cand_idx, INT32_MAX)
        )
        owner = owner.at[jnp.where(dyn_b, body_b, num_bodies)].min(
            jnp.where(dyn_b, cand_idx, INT32_MAX)
        )

        win_a = ~dyn_a | (owner[body_a] == idx)
        win_b = ~dyn_b | (owner[body_b] == idx)
        selected = cand & win_a & win_b
        return (color, uncolored & ~selected), selected

    init = (jnp.zeros((N,), jnp.int32), jnp.ones((N,), bool))
    (_, uncolored), selected_rounds = jax.lax.scan(
        round_fn, init, None, length=max_colors - 1
    )
    # selected_rounds: [max_colors-1, N]
    color = jnp.full((N,), max_colors - 1, jnp.int32)
    rounds = jnp.arange(max_colors - 1, dtype=jnp.int32)
    # each constraint selected in at most one round
    sel_color = jnp.where(selected_rounds, rounds[:, None], max_colors - 1).min(axis=0)
    color = jnp.where(active, sel_color, max_colors - 1)
    overflow = (uncolored & active).sum()
    return color, overflow
