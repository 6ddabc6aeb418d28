import jax
import jax.numpy as jnp
import numpy as np

from solver2d_tpu.ops.coloring import color_graph
from solver2d_tpu.utils.checks import check_color_disjointness


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
