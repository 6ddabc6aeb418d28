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


# ------------------------------------------------------------- flat scatters
#
# XLA's batched-scatter path on TPU has the same fixed-cost pathology as
# batched gathers (the original MIS coloring measured ~1.6 ms per vmapped
# .at[].max at 128 worlds). These wrappers fold every vmap batch axis into
# the row axis so any nesting depth lowers to ONE unbatched 1-D scatter.
#
# Semantics: `target.at[idx].op(vals)` with a RANK-1 idx whose entries must
# be in [0, rows) — out-of-range indices are clamped (not dropped), unlike
# plain .at[], so callers must route dead lanes to an in-range sink slot.


def _make_tscatter(op: str):
    from jax.custom_batching import custom_vmap as _cv

    @_cv
    def tscatter(target, idx, vals):
        return getattr(target.at[_norm(idx, target.shape[0])], op)(vals)

    @tscatter.def_vmap
    def _rule(axis_size, in_batched, target, idx, vals):
        tb, ib, vb = in_batched
        w = axis_size
        n = target.shape[1] if tb else target.shape[0]
        t = target if tb else jnp.broadcast_to(target[None], (w,) + target.shape)
        idx_b = idx if ib else jnp.broadcast_to(idx[None], (w,) + idx.shape)
        vals_b = vals if vb else jnp.broadcast_to(vals[None], (w,) + vals.shape)
        flat_t = t.reshape((w * n,) + t.shape[2:])
        off = (jnp.arange(w, dtype=jnp.int32) * n)[:, None]
        idx_flat = (_norm(idx_b, n) + off).reshape(-1)
        vals_flat = vals_b.reshape((w * vals_b.shape[1],) + vals_b.shape[2:])
        out = tscatter(flat_t, idx_flat, vals_flat)
        return out.reshape(t.shape), True

    tscatter.__name__ = f"tscatter_{op}"
    return tscatter


tscatter_add = _make_tscatter("add")
tscatter_max = _make_tscatter("max")
# last-writer-wins set; callers must guarantee idx uniqueness (modulo the
# sink row) for deterministic results
tscatter_set = _make_tscatter("set")
