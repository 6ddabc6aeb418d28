"""Fused narrowphase kernel: the whole GJK + manifold pipeline for a world's
contact table in one Pallas program.

Inputs arrive lane-major (rows = fields, lanes = contacts; see
`narrow_lanes.py`). The kernel slices field rows, runs `collide_lanes`
(identical math to the vmapped `manifold.collide` XLA path), and writes two
packed outputs. A grid over contact blocks bounds VMEM for single-huge-world
scenes (Pyramid-100); under vmap the batching rule prepends a worlds grid
dimension exactly like solvers/pallas_solver.py.

Row layouts (must match update_manifolds' packing):
  geomT  [34, C] f32: vx[0:8] vy[8:16] nx[16:24] ny[24:32] count[32] radius[33]
         (count stored as f32 — exact for <= 8 — and cast in-kernel)
  poseT  [4, C]  f32: px py rot_s rot_c
  cacheT [7, C]  i32: cache_count ia0 ia1 ia2 ib0 ib1 ib2
  foutT  [12, C] f32: normal xy, anchorA p0 xy p1 xy, anchorB p0 xy p1 xy, sep0, sep1
  ioutT  [5, C]  i32: pid0 pid1 point_count cache_count (packed ia/ib in cache layout below)
  coutT  [7, C]  i32: cache_count ia0 ia1 ia2 ib0 ib1 ib2 (next step's GJK cache)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .narrow_lanes import collide_lanes


def _kernel(gaT_ref, gbT_ref, paT_ref, pbT_ref, cacheT_ref, fout_ref, iout_ref, cout_ref, *, gjk_iters):
    gaT = gaT_ref[...]
    gbT = gbT_ref[...]
    paT = paT_ref[...]
    pbT = pbT_ref[...]
    cch = cacheT_ref[...]

    def unpack_geom(g):
        return (
            g[0:8], g[8:16], g[16:24], g[24:32],
            g[32:33].astype(jnp.int32), g[33:34],
        )

    vax, vay, nax, nay, ca, ra = unpack_geom(gaT)
    vbx, vby, nbx, nby, cb, rb = unpack_geom(gbT)

    res = collide_lanes(
        vax, vay, nax, nay, ca, ra,
        vbx, vby, nbx, nby, cb, rb,
        paT[0:1], paT[1:2], paT[2:3], paT[3:4],
        pbT[0:1], pbT[1:2], pbT[2:3], pbT[3:4],
        cch[0:1],
        (cch[1:2], cch[2:3], cch[3:4]),
        (cch[4:5], cch[5:6], cch[6:7]),
        gjk_iters=gjk_iters,
    )

    fout_ref[...] = jnp.concatenate(
        [
            res.normal_x, res.normal_y,
            res.a0x, res.a0y, res.a1x, res.a1y,
            res.b0x, res.b0y, res.b1x, res.b1y,
            res.sep0, res.sep1,
        ],
        axis=0,
    )
    iout_ref[...] = jnp.concatenate([res.pid0, res.pid1, res.count], axis=0)
    cout_ref[...] = jnp.concatenate(
        [res.cache_count, res.ia[0], res.ia[1], res.ia[2], res.ib[0], res.ib[1], res.ib[2]], axis=0
    )


def _block_lanes(C: int) -> int:
    """Largest contact-block size: whole table if small, else a 128-multiple
    divisor (~2k lanes keeps the block under ~1 MB VMEM per live row set)."""
    if C <= 4096:
        return C
    for bn in (4096, 2048, 1024, 512, 256, 128):
        if C % bn == 0:
            return bn
    return C


def collide_lanes_pallas(gaT, gbT, paT, pbT, cacheT, gjk_iters: int, interpret: bool = False):
    """gaT/gbT: [34,C] f32; paT/pbT: [4,C] f32; cacheT: [7,C] i32.
    Returns (foutT [12,C] f32, ioutT [3,C] i32, coutT [7,C] i32)."""
    C = gaT.shape[-1]
    BN = _block_lanes(C)
    grid = (C // BN,)

    def lane_spec(rows):
        return pl.BlockSpec((rows, BN), lambda i: (0, i))

    return pl.pallas_call(
        partial(_kernel, gjk_iters=gjk_iters),
        grid=grid,
        in_specs=[lane_spec(34), lane_spec(34), lane_spec(4), lane_spec(4), lane_spec(7)],
        out_specs=(lane_spec(12), lane_spec(3), lane_spec(7)),
        out_shape=(
            jax.ShapeDtypeStruct((12, C), jnp.float32),
            jax.ShapeDtypeStruct((3, C), jnp.int32),
            jax.ShapeDtypeStruct((7, C), jnp.int32),
        ),
        interpret=interpret,
    )(gaT, gbT, paT, pbT, cacheT)


def collide_lanes_xla(gaT, gbT, paT, pbT, cacheT, gjk_iters: int):
    """Same contract as collide_lanes_pallas but plain XLA (CPU/tests)."""
    def unpack_geom(g):
        return (
            g[0:8], g[8:16], g[16:24], g[24:32],
            g[32:33].astype(jnp.int32), g[33:34],
        )

    vax, vay, nax, nay, ca, ra = unpack_geom(gaT)
    vbx, vby, nbx, nby, cb, rb = unpack_geom(gbT)
    res = collide_lanes(
        vax, vay, nax, nay, ca, ra,
        vbx, vby, nbx, nby, cb, rb,
        paT[0:1], paT[1:2], paT[2:3], paT[3:4],
        pbT[0:1], pbT[1:2], pbT[2:3], pbT[3:4],
        cacheT[0:1], (cacheT[1:2], cacheT[2:3], cacheT[3:4]),
        (cacheT[4:5], cacheT[5:6], cacheT[6:7]),
        gjk_iters=gjk_iters,
    )
    fout = jnp.concatenate(
        [
            res.normal_x, res.normal_y,
            res.a0x, res.a0y, res.a1x, res.a1y,
            res.b0x, res.b0y, res.b1x, res.b1y,
            res.sep0, res.sep1,
        ],
        axis=0,
    )
    iout = jnp.concatenate([res.pid0, res.pid1, res.count], axis=0)
    cout = jnp.concatenate(
        [res.cache_count, res.ia[0], res.ia[1], res.ia[2], res.ib[0], res.ib[1], res.ib[2]], axis=0
    )
    return fout, iout, cout
