"""Quick equivalence check: ops/narrow_lanes vs vmapped manifold.collide.

Random rounded-polygon/circle pairs in random poses, both paths, compare all
outputs. Run on CPU: PYTHONPATH=/root/repo:$PYTHONPATH JAX... (conftest-style
override below)."""
import os
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

if os.environ.get("S2_CHECK_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

_t0 = time.time()


def _mark(msg):
    print(f"[{time.time() - _t0:7.1f}s] {msg}", flush=True)

from functools import partial

import jax.numpy as jnp
import numpy as np

from solver2d_tpu.ops import manifold
from solver2d_tpu.ops.geometry import polygon, circle, capsule
from solver2d_tpu.ops.narrow_pallas import collide_lanes_xla

rng = np.random.RandomState(0)
N = 256

geoms = []
for i in range(N):
    k = rng.randint(3)
    if k == 0:
        geoms.append(circle((0, 0), rng.uniform(0.2, 1.0)))
    elif k == 1:
        geoms.append(capsule(rng.uniform(-1, 0, 2), rng.uniform(0, 1, 2), rng.uniform(0.1, 0.5)))
    else:
        pts = rng.uniform(-1, 1, (rng.randint(3, 9), 2))
        geoms.append(polygon(pts))

def pack(gs):
    verts = np.stack([g.verts for g in gs])
    normals = np.stack([g.normals for g in gs])
    counts = np.array([g.count for g in gs], np.int32)
    radii = np.array([g.radius for g in gs], np.float32)
    return verts, normals, counts, radii

ga = pack(geoms)
gb = pack(geoms[::-1])

def rand_pose(n):
    p = rng.uniform(-1.5, 1.5, (n, 2)).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, n)
    q = np.stack([np.sin(ang), np.cos(ang)], -1).astype(np.float32)
    return p, q

pa, qa = rand_pose(N)
pb, qb = rand_pose(N)
cc = np.zeros(N, np.int32)
cia = np.zeros((N, 3), np.int32)
cib = np.zeros((N, 3), np.int32)

GJK_ITERS = 10

_mark(f"devices: {jax.devices()}")
_mark("compiling reference (vmapped manifold.collide)...")
ref = jax.jit(jax.vmap(partial(manifold.collide, gjk_iters=GJK_ITERS)))(
    ga[0], ga[1], ga[2], ga[3], gb[0], gb[1], gb[2], gb[3],
    pa, qa, pb, qb, cc, cia, cib,
)
ref = jax.tree.map(np.asarray, ref)
_mark("reference done")

gaT = jnp.concatenate(
    [ga[0][:, :, 0], ga[0][:, :, 1], ga[1][:, :, 0], ga[1][:, :, 1],
     ga[2][:, None].astype(jnp.float32), ga[3][:, None]], axis=-1).T
gbT = jnp.concatenate(
    [gb[0][:, :, 0], gb[0][:, :, 1], gb[1][:, :, 0], gb[1][:, :, 1],
     gb[2][:, None].astype(jnp.float32), gb[3][:, None]], axis=-1).T
paT = jnp.concatenate([pa, qa], -1).T
pbT = jnp.concatenate([pb, qb], -1).T
cacheT = jnp.concatenate([cc[:, None], cia, cib], -1).T

_mark("compiling lanes (collide_lanes_xla)...")
fout, iout, cout = jax.jit(partial(collide_lanes_xla, gjk_iters=GJK_ITERS))(gaT, gbT, paT, pbT, cacheT)
fout, iout, cout = np.asarray(fout), np.asarray(iout), np.asarray(cout)
_mark("lanes done")

def cmp(name, a, b, tol=0.0, mask=None):
    a, b = np.asarray(a), np.asarray(b)
    if mask is not None:
        a = np.where(mask, a, 0)
        b = np.where(mask, b, 0)
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    bad = d > tol
    print(f"{name:12s} maxdiff={d.max():.3e} bad={bad.sum()}/{d.size}")
    return bad.sum()

cnt_ref = np.asarray(ref.point_count)
cnt_lan = np.asarray(iout[2])
bad = 0
bad += cmp("count", cnt_ref, cnt_lan)
m1 = (cnt_ref >= 1)
m2 = (cnt_ref >= 2)
bad += cmp("normal", ref.normal, np.asarray(fout[0:2].T), 0, m1[:, None])
aa = np.stack([np.asarray(fout[2:4].T), np.asarray(fout[4:6].T)], 1)
ab = np.stack([np.asarray(fout[6:8].T), np.asarray(fout[8:10].T)], 1)
pm = np.stack([m1, m2], 1)
bad += cmp("anchor_a", ref.anchor_a, aa, 0, pm[:, :, None])
bad += cmp("anchor_b", ref.anchor_b, ab, 0, pm[:, :, None])
bad += cmp("sep", ref.separation, np.asarray(fout[10:12].T), 0, pm)
bad += cmp("pid", ref.point_id, np.asarray(iout[0:2].T), 0, pm)
bad += cmp("cache_count", ref.cache_count, np.asarray(cout[0]))
bad += cmp("cache_ia", ref.cache_ia, np.asarray(cout[1:4].T))
bad += cmp("cache_ib", ref.cache_ib, np.asarray(cout[4:7].T))
print("OK" if bad == 0 else f"FAIL ({bad} mismatches)")

# ---- detail dump for mismatching pairs -------------------------------------
nrm_l = np.asarray(fout[0:2].T)
sep_l = np.asarray(fout[10:12].T)
pid_l = np.asarray(iout[0:2].T)
mism = np.nonzero(
    (np.where(m1[:, None], np.abs(np.asarray(ref.normal) - nrm_l), 0) > 0).any(-1)
    | (np.where(pm, np.asarray(ref.point_id) != pid_l, False)).any(-1)
)[0]
for i in mism[:8]:
    print(f"--- pair {i}: ca={ga[2][i]} ra={ga[3][i]:.3f} cb={gb[2][i]} rb={gb[3][i]:.3f}")
    print(f"    cache_count={np.asarray(ref.cache_count)[i]} count={cnt_ref[i]}")
    print(f"    ref  n={np.asarray(ref.normal)[i]} sep={np.asarray(ref.separation)[i]} pid={np.asarray(ref.point_id)[i]}")
    print(f"    lane n={nrm_l[i]} sep={sep_l[i]} pid={pid_l[i]}")

# ---- precision hypothesis: ref with highest matmul precision ----------------
with jax.default_matmul_precision("highest"):
    ref_hi = jax.jit(jax.vmap(partial(manifold.collide, gjk_iters=GJK_ITERS)))(
        ga[0], ga[1], ga[2], ga[3], gb[0], gb[1], gb[2], gb[3],
        pa, qa, pb, qb, cc, cia, cib,
    )
    ref_hi = jax.tree.map(np.asarray, ref_hi)
_mark("highest-precision reference done")
bad_hi = 0
bad_hi += cmp("hi:count", ref_hi.point_count, cnt_lan)
bad_hi += cmp("hi:normal", ref_hi.normal, nrm_l, 0, m1[:, None])
bad_hi += cmp("hi:sep", ref_hi.separation, sep_l, 0, pm)
bad_hi += cmp("hi:pid", ref_hi.point_id, pid_l, 0, pm)
print("HI-PRECISION " + ("OK" if bad_hi == 0 else f"FAIL ({bad_hi})"))
