"""Fast batched row-gather.

The whole pipeline is written per-world and lifted with `vmap`. JAX's
default batching rule for `table[idx]` produces an XLA gather with operand
batching dims, which the TPU backend executes catastrophically slowly
(measured on v5e: 73.5 s vs 0.16 s for the same [128 x 896 <- 128 x 216]
row-gather expressed as a single flat gather — a ~450x difference; see
CLAUDE.md). `tgather` is a drop-in replacement for `table[idx]` whose
custom vmap rule flattens every batch axis into the row axis, so any
depth of vmap nesting lowers to ONE unbatched row-gather that XLA's TPU
backend handles on the fast path.

Semantics match jnp integer indexing: negative indices wrap, out-of-range
indices clamp.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.custom_batching import custom_vmap


def _norm(idx, n):
    """jnp-indexing semantics: wrap negatives, clamp out-of-range."""
    idx = jnp.where(idx < 0, idx + n, idx)
    return jnp.clip(idx, 0, n - 1)


@custom_vmap
def tgather(table, idx):
    """`table[idx]` along axis 0. table: [N, ...]; idx: int array of any
    rank; returns idx.shape + table.shape[1:]."""
    return jnp.take(table, _norm(idx, table.shape[0]), axis=0)


@tgather.def_vmap
def _tgather_vmap(axis_size, in_batched, table, idx):
    table_b, idx_b = in_batched
    w = axis_size
    if idx_b and not table_b:
        # shared table: a plain gather with a bigger index array
        return tgather(table, idx), True
    # batched table: fold the batch axis into the row axis and offset the
    # indices, recursing so deeper vmap levels flatten the same way
    n = table.shape[1]
    flat = table.reshape((w * n,) + table.shape[2:])
    if idx_b:
        off = (jnp.arange(w) * n).reshape((w,) + (1,) * (idx.ndim - 1))
    else:
        off = (jnp.arange(w) * n).reshape((w,) + (1,) * idx.ndim)
        idx = idx[None]
    return tgather(flat, _norm(idx, n) + off), True
