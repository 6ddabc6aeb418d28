"""Does the TPU flush bitcast-int denormals through pack/gather pipelines?

Tests the exact transport patterns used by match_contacts (stack+tgather) and
update_manifolds' geom pack (concat+tgather), plus the pyramid contact table's
actual body indices on chip."""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from solver2d_tpu.ops.broadphase import _f2i, _i2f
from solver2d_tpu.ops.gather import tgather

_t0 = time.time()
print(f"devices: {jax.devices()}", flush=True)

# --- micro 1: bare bitcast round-trip -----------------------------------
@jax.jit
def rt_bare(x):
    return _f2i(_i2f(x))

x = jnp.arange(16, dtype=jnp.int32)
print("bare roundtrip:", np.asarray(rt_bare(x)), flush=True)

# --- micro 2: stack + gather (match_contacts mat pattern) ----------------
@jax.jit
def rt_stack(fr, re, body, idx):
    mat = jnp.stack([fr, re, _i2f(body)], axis=-1)
    rows = tgather(mat, idx)
    return _f2i(rows[:, 2])

S = 16
fr = jnp.full((S,), 0.6)
re = jnp.zeros((S,))
body = jnp.arange(S, dtype=jnp.int32)
idx = jnp.arange(S, dtype=jnp.int32)
print("stack+gather roundtrip:", np.asarray(rt_stack(fr, re, body, idx)), flush=True)

# --- micro 3: concat + gather + slice (geom pack pattern) ----------------
@jax.jit
def rt_concat(verts, count, radius, idx):
    geom = jnp.concatenate([verts, _i2f(count)[:, None], radius[:, None]], axis=-1)
    g = tgather(geom, idx)
    return _f2i(g[:, -2])

verts = jnp.ones((S, 32))
count = jnp.full((S,), 4, jnp.int32)
radius = jnp.zeros((S,))
print("concat+gather roundtrip:", np.asarray(rt_concat(verts, count, radius, idx)), flush=True)

# --- micro 4: with sqrt arithmetic mixed in (match_contacts exact shape) --
@jax.jit
def rt_mixed(fr, re, body, idx):
    mat = jnp.stack([fr, re, _i2f(body)], axis=-1)
    a = tgather(mat, idx)
    b = tgather(mat, idx[::-1])
    friction = jnp.sqrt(a[:, 0] * b[:, 0])
    return friction, _f2i(a[:, 2]), _f2i(b[:, 2])

f, ba, bb = rt_mixed(fr, re, body, idx)
print("mixed: friction[0]=", float(f[0]), "ba=", np.asarray(ba), "bb=", np.asarray(bb), flush=True)

# --- the real contact table on chip --------------------------------------
from solver2d_tpu.config import SolverType
from solver2d_tpu.models.contact_scenes import pyramid_world
from solver2d_tpu.ops import broadphase

w, ids = pyramid_world(SolverType.TGS_SOFT, base_count=6)
state, cfg = w.freeze(max_colors=8, gjk_iters=10)


@jax.jit
def table(state):
    shapes = state.shapes
    bodies = state.bodies
    jointed = broadphase.jointed_body_keys(state.joints, cfg)
    pairs = broadphase.find_pairs_grid(shapes, bodies.type, jointed, cfg)
    return broadphase.match_contacts(state.contacts, pairs, shapes, bodies.type, shapes.body)


print(f"[{time.time()-_t0:6.1f}s] compiling table...", flush=True)
contacts = jax.tree.map(np.asarray, table(state))
print(f"[{time.time()-_t0:6.1f}s] done", flush=True)
alive = contacts.alive
sb_body = np.asarray(state.shapes.body)
rows = np.nonzero(alive)[0]
bad = 0
for i in rows:
    want_a, want_b = sb_body[contacts.shape_a[i]], sb_body[contacts.shape_b[i]]
    if contacts.body_a[i] != want_a or contacts.body_b[i] != want_b:
        bad += 1
        if bad <= 8:
            print(f"row {i}: shapes {contacts.shape_a[i]}->{contacts.shape_b[i]} "
                  f"body {contacts.body_a[i]},{contacts.body_b[i]} want {want_a},{want_b}")
print(f"alive={alive.sum()} body-transport bad rows={bad}")
