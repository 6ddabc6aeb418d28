"""Lane-major narrowphase (ops/narrow_lanes.py) vs the vmapped
manifold.collide path: identical math, float-exact agreement.

The lanes rewrite is what the fused Pallas narrowphase kernel runs
(ops/narrow_pallas.py), so exact agreement here pins the TPU kernel to the
oracle-validated XLA path (reference semantics: src/manifold.c:509-650)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solver2d_tpu.ops import manifold
from solver2d_tpu.ops.geometry import box, capsule, circle, polygon
from solver2d_tpu.ops.narrow_pallas import collide_lanes_pallas, collide_lanes_xla

pytestmark = pytest.mark.fast

GJK_ITERS = 10


def _random_batch(n, seed=0):
    rng = np.random.RandomState(seed)
    geoms = []
    for _ in range(n):
        k = rng.randint(4)
        if k == 0:
            geoms.append(circle(rng.uniform(-0.3, 0.3, 2), rng.uniform(0.2, 1.0)))
        elif k == 1:
            geoms.append(capsule(rng.uniform(-1, 0, 2), rng.uniform(0, 1, 2), rng.uniform(0.1, 0.5)))
        elif k == 2:
            geoms.append(box(rng.uniform(0.2, 1.0), rng.uniform(0.2, 1.0)))
        else:
            geoms.append(polygon(rng.uniform(-1, 1, (rng.randint(3, 9), 2))))

    def pack(gs):
        return (
            jnp.stack([jnp.asarray(g.verts) for g in gs]),
            jnp.stack([jnp.asarray(g.normals) for g in gs]),
            jnp.asarray([g.count for g in gs], jnp.int32),
            jnp.asarray([g.radius for g in gs], jnp.float32),
        )

    ga = pack(geoms)
    gb = pack(geoms[::-1])

    def pose(seed2):
        r = np.random.RandomState(seed2)
        p = r.uniform(-1.2, 1.2, (n, 2)).astype(np.float32)
        ang = r.uniform(-np.pi, np.pi, n)
        q = np.stack([np.sin(ang), np.cos(ang)], -1).astype(np.float32)
        return jnp.asarray(p), jnp.asarray(q)

    pa, qa = pose(seed + 1)
    pb, qb = pose(seed + 2)
    cc = jnp.zeros((n,), jnp.int32)
    cia = jnp.zeros((n, 3), jnp.int32)
    cib = jnp.zeros((n, 3), jnp.int32)
    return ga, gb, pa, qa, pb, qb, cc, cia, cib


def _lanes_inputs(ga, gb, pa, qa, pb, qb, cc, cia, cib):
    def geomT(g):
        v, nrm, cnt, rad = g
        return jnp.concatenate(
            [v[:, :, 0], v[:, :, 1], nrm[:, :, 0], nrm[:, :, 1],
             cnt[:, None].astype(jnp.float32), rad[:, None]],
            axis=-1,
        ).T

    paT = jnp.concatenate([pa, qa], -1).T
    pbT = jnp.concatenate([pb, qb], -1).T
    cacheT = jnp.concatenate([cc[:, None], cia, cib], -1).T
    return geomT(ga), geomT(gb), paT, pbT, cacheT


def _ref(ga, gb, pa, qa, pb, qb, cc, cia, cib):
    return jax.jit(jax.vmap(partial(manifold.collide, gjk_iters=GJK_ITERS)))(
        ga[0], ga[1], ga[2], ga[3], gb[0], gb[1], gb[2], gb[3],
        pa, qa, pb, qb, cc, cia, cib,
    )


def _assert_match(ref, fout, iout, cout):
    cnt_ref = np.asarray(ref.point_count)
    np.testing.assert_array_equal(cnt_ref, np.asarray(iout[2]))
    m1 = cnt_ref >= 1
    m2 = cnt_ref >= 2
    pm = np.stack([m1, m2], 1)

    def masked_eq(a, b, mask):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_array_equal(np.where(mask, a, 0), np.where(mask, b, 0))

    masked_eq(ref.normal, fout[0:2].T, m1[:, None])
    aa = np.stack([np.asarray(fout[2:4].T), np.asarray(fout[4:6].T)], 1)
    ab = np.stack([np.asarray(fout[6:8].T), np.asarray(fout[8:10].T)], 1)
    masked_eq(ref.anchor_a, aa, pm[:, :, None])
    masked_eq(ref.anchor_b, ab, pm[:, :, None])
    masked_eq(ref.separation, fout[10:12].T, pm)
    masked_eq(ref.point_id, iout[0:2].T, pm)
    np.testing.assert_array_equal(np.asarray(ref.cache_count), np.asarray(cout[0]))
    np.testing.assert_array_equal(np.asarray(ref.cache_ia), np.asarray(cout[1:4].T))
    np.testing.assert_array_equal(np.asarray(ref.cache_ib), np.asarray(cout[4:7].T))


def test_lanes_matches_xla_random_pairs():
    # 64 pairs, same lane count as the warm-cache test below, so both tests
    # share ONE compiled program per path (the 1-core box pays minutes per
    # distinct batch shape; 64 random pairs still cover all 10 type pairs)
    args = _random_batch(64, seed=3)
    ref = _ref(*args)
    lanes = _lanes_inputs(*args)
    fout, iout, cout = jax.jit(partial(collide_lanes_xla, gjk_iters=GJK_ITERS))(*lanes)
    _assert_match(ref, fout, iout, cout)


def test_lanes_matches_xla_warm_cache():
    """Second collide with the first call's GJK cache (warm-start path)."""
    args = _random_batch(64, seed=7)
    ref1 = _ref(*args)
    ga, gb, pa, qa, pb, qb, _, _, _ = args
    args2 = (ga, gb, pa, qa, pb, qb, ref1.cache_count, ref1.cache_ia, ref1.cache_ib)
    ref2 = _ref(*args2)
    lanes = _lanes_inputs(*args2)
    fout, iout, cout = jax.jit(partial(collide_lanes_xla, gjk_iters=GJK_ITERS))(*lanes)
    _assert_match(ref2, fout, iout, cout)


def test_pallas_interpret_matches_xla():
    """The Pallas kernel (interpret mode on CPU) agrees with both paths.

    16 pairs, not 64: interpret mode executes the kernel per-op on the host
    and its runtime scales with the lane count — at 64 pairs this test alone
    pushed the file past the suite's 4h timeout on the 1-core box
    (TESTLOG_r04 rc=124); 16 pairs still covers all four geometry kinds."""
    args = _random_batch(16, seed=11)
    ref = _ref(*args)
    lanes = _lanes_inputs(*args)
    fout, iout, cout = jax.jit(
        partial(collide_lanes_pallas, gjk_iters=GJK_ITERS, interpret=True)
    )(*lanes)
    _assert_match(ref, fout, iout, cout)


def test_step_with_lanes_narrowphase_matches_xla():
    """Full step with narrowphase='lanes' equals narrowphase='xla'.

    PGS, not TGS_SOFT: the narrowphase runs identically under every solver
    and the PGS step program compiles in a fraction of the TGS_SOFT time on
    this 1-core box (TESTLOG_r04: this file timed out at 4h; the two step
    compiles here were the second-largest cost after the interpret test)."""
    from solver2d_tpu.config import SolverType
    from solver2d_tpu.models.contact_scenes import pyramid_world
    from solver2d_tpu.step import step

    w, _ = pyramid_world(SolverType.PGS, base_count=4)
    state, cfg = w.freeze(max_colors=6, gjk_iters=GJK_ITERS)
    f_xla = jax.jit(partial(step, config=cfg.replace(narrowphase="xla")))
    f_lan = jax.jit(partial(step, config=cfg.replace(narrowphase="lanes")))
    sx, sl = state, state
    for _ in range(20):
        sx = f_xla(sx, 1 / 60)
        sl = f_lan(sl, 1 / 60)
    np.testing.assert_allclose(
        np.asarray(sx.bodies.position), np.asarray(sl.bodies.position), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(sx.contacts.point_count), np.asarray(sl.contacts.point_count)
    )
