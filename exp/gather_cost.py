"""Cost model for the solve inner loop's data movement on the real chip.

Theory (round-5): TPU row-gathers cost ~constant per ROW (independent of row
width up to ~dozens of lanes), so the per-color-phase `gather_apply` [B]-row
gather dominates the solve at north-star scale and scales linearly with
worlds — explaining BOTH the solve floor (VERDICT r4 #1) and the flat batch
scaling (#2). This probe measures, vmapped over W worlds:

  gather  R x K    row-gather of R rows width K from a [B, K] table
  scatset R x K    tscatter_set of R rows into a [B, K] table
  scatadd R x K    tscatter_add of R rows into a [B, K] table
  onehot  apply    build one-hot E [R, B] bf16 from indices + E^T @ vals
                   (precision HIGHEST) — the MXU replacement for scatter
  onehot  gather   E_sel @ table — the MXU replacement for gather

Shapes mirror the north-star solve: B=1960 bodies, R in {660, 1320, 1960}
(bucketed color size C_b, 2*C_b endpoint rows, full body count), K in
{8, 17}, W=64. Each measurement is a chained lax.scan (memoization-safe).

Usage: python exp/gather_cost.py [quick]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

W = 64
B = 1960
ITERS = 20

key = jax.random.PRNGKey(0)
kk = jax.random.split(key, 8)
table = jax.random.normal(kk[0], (W, B, 32), jnp.float32)
all_idx = jax.random.randint(kk[1], (W, 4096), 0, B, jnp.int32)


def timeit(name, fn, *args):
    fn = jax.jit(fn)
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = time.perf_counter() - t0
    per = dt * 1e3 / ITERS
    print(f"{name:>28}: {per:8.3f} ms/op  ({per*1e6/W:7.1f} ns/world)", flush=True)
    return per


def chain(op):
    """Chained scan: feed a scalar derived from the output back into the
    input so XLA cannot hoist or memoize the op."""

    def run(t, idx):
        def body(c, _):
            out = op(c, idx)
            salt = out.reshape(-1)[0] * 1e-12
            return c + salt, None

        out, _ = jax.lax.scan(body, t, None, length=ITERS)
        return out

    return run


def main():
    quick = "quick" in sys.argv
    rows_list = [660, 1320, 1960] if not quick else [1320]
    widths = [8, 17] if not quick else [8]

    from solver2d_tpu.ops.gather import tgather, tscatter_add, tscatter_set

    for R in rows_list:
        for K in widths:
            idx = all_idx[:, :R]
            t = table[:, :, :K]

            def g_op(tab, ix):
                return jax.vmap(tgather)(tab, ix)

            timeit(f"gather  {R:5d}x{K:2d}", chain(g_op), t, idx)

            vals = jax.random.normal(kk[2], (W, R, K), jnp.float32)

            def ss_op(tab, ix):
                return jax.vmap(tscatter_set)(tab, ix, vals)

            timeit(f"scatset {R:5d}x{K:2d}", chain(ss_op), t, idx)

            def sa_op(tab, ix):
                return jax.vmap(tscatter_add)(tab, ix, vals)

            timeit(f"scatadd {R:5d}x{K:2d}", chain(sa_op), t, idx)

    # one-hot MXU replacements at the apply shape (R=1320 endpoint rows)
    R, K = 1320, 8
    idx = all_idx[:, :R]
    vals = jax.random.normal(kk[3], (W, R, K), jnp.float32)
    t8 = table[:, :, :K]

    def onehot_apply(tab, ix):
        # E [R, B] bf16 built per call (iota compare); bs_new = E^T @ vals
        # with HIGHEST (bitwise-exact one-hot dots, exp/mosaic_probe.py)
        def one(tab1, ix1, v1):
            e = (ix1[:, None] == jnp.arange(B, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
            upd = jax.lax.dot_general(
                e, v1.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            written = (e.sum(axis=0) > 0).astype(jnp.float32)[:, None]
            return tab1 * (1 - written) + upd

        return jax.vmap(one)(tab, ix, vals)

    timeit(f"onehot-apply {R}->B", chain(onehot_apply), t8, idx)

    def onehot_gather(tab, ix):
        def one(tab1, ix1):
            e = (ix1[:, None] == jnp.arange(B, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                e, tab1.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

        return jax.vmap(one)(tab, ix)

    timeit(f"onehot-gather {R}x{K}", chain(onehot_gather), t8, idx)

    # THE lane-batch candidates: ONE shared index set, worlds in the LANE
    # dim — table [B, W*K], gather R rows of width W*K. If per-row cost is
    # width-independent (theory), this beats the flattened per-world gather
    # ([W*R] rows of width K) by ~W x and is the round-5 solve design.
    for R in rows_list:
        for K in widths:
            idx1 = all_idx[0, :R]  # shared across worlds
            wide = jax.random.normal(kk[4], (B, W * K), jnp.float32)

            def lane_g(tab, ix):
                return tgather(tab, ix)

            timeit(f"lane-gather {R:5d}x{W}*{K}", chain(lane_g), wide, idx1)

            lvals = jax.random.normal(kk[5], (R, W * K), jnp.float32)

            def lane_ss(tab, ix):
                return tscatter_set(tab, ix, lvals)

            timeit(f"lane-scatset {R:5d}x{W}*{K}", chain(lane_ss), wide, idx1)

            def lane_sa(tab, ix):
                return tscatter_add(tab, ix, lvals)

            timeit(f"lane-scatadd {R:5d}x{W}*{K}", chain(lane_sa), wide, idx1)

    # f32 one-hot variants (no bf16 rounding question at all)
    def onehot_gather_f32(tab, ix):
        def one(tab1, ix1):
            e = (ix1[:, None] == jnp.arange(B, dtype=jnp.int32)[None, :]).astype(jnp.float32)
            return jax.lax.dot_general(
                e, tab1, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )

        return jax.vmap(one)(tab, ix)

    timeit(f"onehot-gather-f32 {R}x{K}", chain(onehot_gather_f32), t8, idx)


if __name__ == "__main__":
    main()
