"""Find the exact contact rows where narrowphase='lanes' disagrees with 'xla'
on the step-0 pyramid contact table, and dump their inputs/outputs."""
import os
import time

import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

if os.environ.get("S2_CHECK_PLATFORM", "tpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp

from solver2d_tpu.config import SolverType
from solver2d_tpu.models.contact_scenes import pyramid_world
from solver2d_tpu.ops import broadphase
from solver2d_tpu.ops.gather import tgather
from solver2d_tpu.step import update_manifolds

_t0 = time.time()
w, ids = pyramid_world(SolverType.TGS_SOFT, base_count=6)
state, cfg = w.freeze(max_colors=8, gjk_iters=10)


def table_and_manifolds(state):
    shapes = state.shapes
    bodies = state.bodies
    jointed = broadphase.jointed_body_keys(state.joints, cfg)
    pairs = broadphase.find_pairs_grid(shapes, bodies.type, jointed, cfg)
    contacts = broadphase.match_contacts(state.contacts, pairs, shapes, bodies.type, shapes.body)
    out_x = update_manifolds(state, contacts, gjk_iters=10, impl="xla")
    out_l = update_manifolds(state, contacts, gjk_iters=10, impl="lanes")
    return contacts, out_x, out_l


print(f"[{time.time()-_t0:6.1f}s] compiling...", flush=True)
contacts, out_x, out_l = jax.jit(table_and_manifolds)(state)
contacts = jax.tree.map(np.asarray, contacts)
out_x = jax.tree.map(np.asarray, out_x)
out_l = jax.tree.map(np.asarray, out_l)
print(f"[{time.time()-_t0:6.1f}s] done", flush=True)

alive = contacts.alive
mism = np.nonzero(alive & (out_x.point_count != out_l.point_count))[0]
print(f"alive={alive.sum()} count-mismatches={len(mism)}")

sv = np.asarray(state.shapes.verts)
sc = np.asarray(state.shapes.count)
sr = np.asarray(state.shapes.radius)
pos = np.asarray(state.bodies.origin)
rot = np.asarray(state.bodies.rot)

for i in mism[:10]:
    sa, sb = int(contacts.shape_a[i]), int(contacts.shape_b[i])
    ba, bb = int(contacts.body_a[i]), int(contacts.body_b[i])
    print(f"--- row {i}: shapes {sa}->{sb} bodies {ba}->{bb}")
    print(f"    counts {sc[sa]},{sc[sb]} radii {sr[sa]:.3f},{sr[sb]:.3f}")
    print(f"    pa={pos[ba]} qa={rot[ba]} pb={pos[bb]} qb={rot[bb]}")
    print(f"    verts_a={sv[sa][:sc[sa]].tolist()}")
    print(f"    verts_b={sv[sb][:sc[sb]].tolist()}")
    print(f"    shapes.body[sa]={np.asarray(state.shapes.body)[sa]} shapes.body[sb]={np.asarray(state.shapes.body)[sb]} shape_alive={np.asarray(state.shapes.alive)[sa]},{np.asarray(state.shapes.alive)[sb]}")
    print(f"    cache_in cnt={contacts.cache_count[i]} ia={contacts.cache_index_a[i]} ib={contacts.cache_index_b[i]}")
    print(f"    xla : count={out_x.point_count[i]} sep={out_x.separation[i]} n={out_x.normal[i]} cache={out_x.cache_count[i]},{out_x.cache_index_a[i]},{out_x.cache_index_b[i]}")
    print(f"    lane: count={out_l.point_count[i]} sep={out_l.separation[i]} n={out_l.normal[i]} cache={out_l.cache_count[i]},{out_l.cache_index_a[i]},{out_l.cache_index_b[i]}")

# also dump a couple of healthy rows for reference
ok = np.nonzero(alive & (out_x.point_count == out_l.point_count) & (out_x.point_count > 0))[0]
print(f"matching touching rows: {len(ok)}")
