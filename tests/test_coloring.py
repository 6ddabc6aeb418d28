import jax
import jax.numpy as jnp
import numpy as np

from solver2d_tpu.ops.coloring import assign_colors, color_graph
from solver2d_tpu.utils.checks import check_color_disjointness
import pytest

pytestmark = pytest.mark.fast


def run(body_a, body_b, n_bodies, max_colors=16, dynamic=None, active=None):
    body_a = jnp.asarray(body_a, jnp.int32)
    body_b = jnp.asarray(body_b, jnp.int32)
    n = body_a.shape[0]
    active = jnp.ones((n,), bool) if active is None else jnp.asarray(active)
    dynamic = jnp.ones((n_bodies,), bool) if dynamic is None else jnp.asarray(dynamic)
    color, overflow = jax.jit(color_graph, static_argnums=(4, 5))(
        body_a, body_b, active, dynamic, n_bodies, max_colors
    )
    assert check_color_disjointness(body_a, body_b, color, active, dynamic, max_colors)
    return np.asarray(color), int(overflow)


def test_chain_colors_in_two():
    """A 40-link chain (Bridge/Ball&Chain topology) must color in few colors,
    not one-per-constraint (the min-index pathological case)."""
    n = 40
    body_a = np.arange(n)
    body_b = np.arange(n) + 1
    color, overflow = run(body_a, body_b, n + 1)
    assert overflow == 0
    assert color.max() <= 6


def test_star_with_static_hub():
    """Ground body with 100 contacts: static hub must not serialize."""
    n = 100
    body_a = np.zeros(n, int)  # ground
    body_b = np.arange(1, n + 1)
    dynamic = np.ones(n + 1, bool)
    dynamic[0] = False
    color, overflow = run(body_a, body_b, n + 1, dynamic=dynamic)
    assert overflow == 0
    assert color.max() == 0  # all in one color


def test_grid_graph():
    """Joint-grid-like lattice (degree <= 4 per body)."""
    k = 12
    edges = []
    for i in range(k):
        for j in range(k):
            n = i * k + j
            if j + 1 < k:
                edges.append((n, n + j + 1 - j))  # right: n, n+1
            if i + 1 < k:
                edges.append((n, n + k))
    body_a = np.array([e[0] for e in edges])
    body_b = np.array([e[1] for e in edges])
    color, overflow = run(body_a, body_b, k * k)
    assert overflow == 0
    assert color.max() <= 10


def test_dense_star_overflows_to_last_bucket():
    """All constraints share one dynamic body -> only one per color fits;
    leftovers land in the final bucket and are counted."""
    n = 30
    body_a = np.zeros(n, int)
    body_b = np.arange(1, n + 1)
    color, overflow = run(body_a, body_b, n + 1, max_colors=8)
    assert overflow == n - 7


# ------------------------------------- persistent incremental coloring

def run_assign(carried, body_a, body_b, n_bodies, max_colors=16, dynamic=None, active=None, rounds=8):
    body_a = jnp.asarray(body_a, jnp.int32)
    body_b = jnp.asarray(body_b, jnp.int32)
    n = body_a.shape[0]
    carried = jnp.asarray(carried, jnp.int32)
    active = jnp.ones((n,), bool) if active is None else jnp.asarray(active)
    dynamic = jnp.ones((n_bodies,), bool) if dynamic is None else jnp.asarray(dynamic)
    color, overflow = jax.jit(assign_colors, static_argnums=(5, 6, 7))(
        carried, body_a, body_b, active, dynamic, n_bodies, max_colors, rounds
    )
    return np.asarray(color), int(overflow)


def _check_proper(body_a, body_b, color, dynamic):
    """No two colored constraints share a dynamic body within a color."""
    seen = set()
    for c in range(len(color)):
        if color[c] < 0:
            continue
        for b in (body_a[c], body_b[c]):
            if dynamic[b]:
                assert (b, color[c]) not in seen, (b, color[c])
                seen.add((b, color[c]))


def test_assign_cold_start_chain():
    n = 160  # Bridge-sized chain
    body_a = np.arange(n)
    body_b = np.arange(n) + 1
    color, overflow = run_assign(np.full(n, -1), body_a, body_b, n + 1)
    dynamic = np.ones(n + 1, bool)
    _check_proper(body_a, body_b, color, dynamic)
    assert overflow <= n // 8  # cold start may leave stragglers for one step
    # a second step (carrying colors) must finish the job
    color2, overflow2 = run_assign(color, body_a, body_b, n + 1)
    _check_proper(body_a, body_b, color2, dynamic)
    assert overflow2 == 0
    # carried colors are stable
    color3, _ = run_assign(color2, body_a, body_b, n + 1)
    assert (color3 == color2).all()


def test_assign_self_heals_conflicts():
    """Deliberately corrupted carried colors (all equal) must re-separate."""
    n = 40
    body_a = np.arange(n)
    body_b = np.arange(n) + 1
    color, overflow = run_assign(np.zeros(n), body_a, body_b, n + 1)
    _check_proper(body_a, body_b, color, np.ones(n + 1, bool))
    color2, overflow2 = run_assign(color, body_a, body_b, n + 1)
    assert overflow2 == 0


def test_assign_static_hub_one_color():
    n = 100
    body_a = np.zeros(n, int)
    body_b = np.arange(1, n + 1)
    dynamic = np.ones(n + 1, bool)
    dynamic[0] = False
    color, overflow = run_assign(np.full(n, -1), body_a, body_b, n + 1, dynamic=dynamic)
    assert overflow == 0
    assert (color == 0).all()  # static hub: first-fit picks color 0 for all


def test_assign_respects_max_colors():
    n = 30
    body_a = np.zeros(n, int)
    body_b = np.arange(1, n + 1)
    color, overflow = run_assign(np.full(n, -1), body_a, body_b, n + 1, max_colors=8)
    _check_proper(body_a, body_b, color, np.ones(n + 1, bool))
    assert (color < 8).all()
    assert overflow == n - 8  # 8 colorable, rest retry next step


def test_assign_clamps_out_of_range_carried():
    """Carried colors >= max_colors (e.g. a checkpoint saved under a larger
    max_colors) must drop to -1 and recolor — not alias another body's
    validation cell or feed 1 << color with color >= 31 (ADVICE r1)."""
    n = 20
    body_a = np.arange(n)
    body_b = np.arange(n) + 1
    carried = np.full(n, -1)
    carried[::2] = 29          # valid under max_colors=30, invalid under 8
    carried[1::2] = 64         # way out of range (1 << 64 is UB in int32)
    color, overflow = run_assign(carried, body_a, body_b, n + 1, max_colors=8)
    _check_proper(body_a, body_b, color, np.ones(n + 1, bool))
    assert overflow == 0
    assert (color >= 0).all() and (color < 8).all()


def test_hash_priority_injective():
    """Priorities must be unique: a collision between two constraints sharing
    a body lets both own a (body,color) cell forever (ADVICE r1)."""
    from solver2d_tpu.ops.coloring import _hash_priority

    idx = jnp.arange(1 << 18, dtype=jnp.int32)
    pri = np.asarray(_hash_priority(idx))
    assert pri.min() >= 0
    assert len(np.unique(pri)) == len(pri)
