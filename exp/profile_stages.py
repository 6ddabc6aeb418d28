"""Stage-level timing on the real chip: full step vs broadphase / narrowphase
/ coloring / solver in isolation, each as a chained scan (memoization-safe).

Usage: python exp/profile_stages.py [stage ...]
Stages: full broad narrow color solve  (default: all)
Env: S2_PROF_WORLDS (64), S2_PROF_BASE (20), S2_PROF_ITERS (10)
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from solver2d_tpu.config import SolverType
from solver2d_tpu.models.contact_scenes import pyramid_world
from solver2d_tpu.parallel import replicate_state
from solver2d_tpu.step import step, update_manifolds
from solver2d_tpu.ops import broadphase, coloring
from solver2d_tpu.solvers.loops import SOLVERS
from solver2d_tpu.solvers.common import make_body_map

WORLDS = int(os.environ.get("S2_PROF_WORLDS", "64"))
BASE = int(os.environ.get("S2_PROF_BASE", "20"))
ITERS = int(os.environ.get("S2_PROF_ITERS", "10"))
NARROW = os.environ.get("S2_PROF_NARROW", "lanes")
COLORS = int(os.environ.get("S2_PROF_COLORS", "12"))
BUCKET = int(os.environ.get("S2_PROF_BUCKET", "0"))  # -1 auto

w, ids = pyramid_world(SolverType.TGS_SOFT, base_count=BASE)
state, cfg = w.freeze(
    max_contacts=((4 * len(ids) + 127) // 128) * 128,
    max_colors=COLORS,
    gjk_iters=10,
    narrowphase=NARROW,
    contact_bucket_cap=BUCKET,
    solve_joints=os.environ.get("S2_PROF_NOJOINTS", "0") != "1",
)
print(f"bodies={len(ids)+1} max_bodies={cfg.max_bodies} max_contacts={cfg.max_contacts} "
      f"max_shapes={cfg.max_shapes} worlds={WORLDS}", flush=True)

batch = replicate_state(state, WORLDS)

# settle 10 steps so the contact table is populated like mid-run
vstep = jax.vmap(partial(step, config=cfg), in_axes=(0, None))


@jax.jit
def settle(b):
    def body(s, _):
        return vstep(s, jnp.float32(1 / 60)), None
    out, _ = jax.lax.scan(body, b, None, length=10)
    return out


batch = settle(batch)
batch = settle(batch)
_ = np.asarray(batch.diag.step_id)
print("settled", flush=True)


def timeit(name, fn, arg):
    fn = jax.jit(fn)
    out = fn(arg)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    out = fn(arg)  # second call: stable layouts
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(arg)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = time.perf_counter() - t0
    print(f"{name:>10}: {dt*1000/ITERS:8.2f} ms/iter  ({dt:.3f}s / {ITERS})", flush=True)


def full_fn(b):
    def body(s, _):
        return vstep(s, jnp.float32(1 / 60)), None
    out, _ = jax.lax.scan(body, b, None, length=ITERS)
    return out


# stage isolations: carry must depend on stage output. We thread a scalar
# "salt" derived from the output into a body field so XLA can't hoist.

def broad_fn(b):
    shapes, btype = b.shapes, b.bodies.type
    jointed = jax.vmap(partial(broadphase.jointed_body_keys, config=cfg))(b.joints)

    def one(shapes):
        if cfg.broadphase == "grid":
            return broadphase.find_pairs_grid(shapes, btype[0], jointed[0], cfg)
        return broadphase.find_pairs(shapes, btype[0], jointed[0], cfg)

    def body(s, _):
        pairs = jax.vmap(lambda sh: one(sh))(s)
        import dataclasses
        salt = (pairs.count.astype(jnp.float32) * 1e-12).reshape(-1, *([1] * (s.fat_aabb.ndim - 1)))
        return dataclasses.replace(s, fat_aabb=s.fat_aabb + salt), pairs.count

    out, _ = jax.lax.scan(body, shapes, None, length=ITERS)
    return out


def narrow_fn(b):
    def body(carry, _):
        st, contacts = carry
        c2 = jax.vmap(partial(update_manifolds, gjk_iters=cfg.gjk_iters, impl=cfg.narrowphase))(st, contacts)
        import dataclasses
        salt = (c2.separation.sum(axis=(1, 2)) * 1e-12)[:, None, None]
        st2 = dataclasses.replace(
            st, bodies=dataclasses.replace(st.bodies, origin=st.bodies.origin + salt)
        )
        return (st2, c2), None

    (st, c), _ = jax.lax.scan(body, (b, b.contacts), None, length=ITERS)
    return c


def color_fn(b):
    dyn = (b.bodies.type == 2) & b.bodies.alive
    touching = b.contacts.alive & (b.contacts.point_count > 0)

    def one(ba, bb, t, d):
        col, ovf = coloring.color_graph(ba, bb, t, d, cfg.max_bodies, cfg.max_colors)
        cmap = make_body_map(ba, bb, col, t, d, cfg.max_bodies, cfg.max_colors)
        return col, ovf, cmap

    def body(carry, _):
        ba, bb = carry
        col, ovf, cmap = jax.vmap(one)(ba, bb, touching, dyn)
        salt = (col.sum(-1) * 0).astype(jnp.int32)[:, None]
        return (ba + salt, bb), ovf

    out, _ = jax.lax.scan(body, (b.contacts.body_a, b.contacts.body_b), None, length=ITERS)
    return out


def colorinc_fn(b):
    """Steady-state incremental coloring (the production default): carried
    colors validate + body map, no MIS rounds."""
    dyn = (b.bodies.type == 2) & b.bodies.alive
    touching = b.contacts.alive & (b.contacts.point_count > 0)

    def one(carried, ba, bb, t, d):
        col, ovf = coloring.assign_colors(
            carried, ba, bb, t, d, cfg.max_bodies, cfg.max_colors, rounds=cfg.color_rounds
        )
        cmap = make_body_map(ba, bb, col, t & (col >= 0), d, cfg.max_bodies, cfg.max_colors)
        return col, ovf, cmap

    def body(carry, _):
        carried = carry
        col, ovf, cmap = jax.vmap(one)(carried, b.contacts.body_a, b.contacts.body_b, touching, dyn)
        return col, ovf

    out, _ = jax.lax.scan(body, b.contacts.color, None, length=ITERS)
    return out


def solve_fn(b):
    dyn = (b.bodies.type == 2) & b.bodies.alive
    touching = b.contacts.alive & (b.contacts.point_count > 0)

    def mk_colors(ba, bb, ja, jb, jal, jt, d):
        cc, _ = coloring.color_graph(ba, bb, touching[0], d, cfg.max_bodies, cfg.max_colors)
        jc, _ = coloring.color_graph(ja, jb, jal, d, cfg.max_bodies, cfg.joint_max_colors)
        cm = make_body_map(ba, bb, cc, touching[0], d, cfg.max_bodies, cfg.max_colors)
        jm = make_body_map(ja, jb, jc, jal, d, cfg.max_bodies, cfg.joint_max_colors, write_a_extra=jt != 1)
        return cc, cm, jc, jm

    colors = jax.vmap(mk_colors)(
        b.contacts.body_a, b.contacts.body_b,
        b.joints.body_a, b.joints.body_b, b.joints.alive, b.joints.type, dyn,
    )
    solver = SOLVERS[cfg.solver]

    def one(bodies, contacts, joints, colors, gravity):
        return solver(bodies, contacts, joints, colors, gravity, jnp.float32(1 / 60), cfg)

    def body(carry, _):
        bodies = carry
        nb, nc, nj = jax.vmap(one)(bodies, b.contacts, b.joints, colors, b.gravity)
        return nb, None

    out, _ = jax.lax.scan(body, b.bodies, None, length=ITERS)
    return out


def lanesolve_fn(b):
    """The lane-batched solve in isolation (structure build + solve), on the
    settled batch. S2_PROF_NOJOINTS=1 required (lane covers contacts only)."""
    from solver2d_tpu.solvers.lane_solve import build_lane_structure, lane_solve

    lane_cfg = cfg.replace(lane_solve=True, solve_joints=False)
    dyn0 = (b.bodies.type[0] == 2) & b.bodies.alive[0]

    def body(carry, _):
        bodies = carry
        struct = build_lane_structure(b.contacts, dyn0, lane_cfg)
        nb, _, _ = lane_solve(bodies, b.contacts, struct, b.gravity[0],
                              jnp.float32(1 / 60), lane_cfg)
        return nb, None

    out, _ = jax.lax.scan(body, b.bodies, None, length=ITERS)
    return out


def lanefull_fn(b):
    """Full step_batch with the lane solve."""
    from solver2d_tpu.step import step_batch

    lane_cfg = cfg.replace(lane_solve=True, solve_joints=False)

    def body(s, _):
        return step_batch(s, jnp.float32(1 / 60), lane_cfg), None

    out, _ = jax.lax.scan(body, b, None, length=ITERS)
    return out


def lanebuild_fn(b):
    """build_lane_structure alone (coloring + buckets + body map, 1x)."""
    from solver2d_tpu.solvers.lane_solve import build_lane_structure

    lane_cfg = cfg.replace(lane_solve=True, solve_joints=False)
    dyn0 = (b.bodies.type[0] == 2) & b.bodies.alive[0]

    def body(carry, _):
        struct = build_lane_structure(b.contacts, dyn0, lane_cfg)
        salt = (struct.slot.sum() * 0 + carry).astype(jnp.int32)
        return salt + struct.shared_overflow, struct.winner.sum()

    out, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
    return out


def match_fn(b):
    """broadphase.find_pairs + match_contacts (stage 1) in isolation."""
    import dataclasses

    def one(state):
        shapes, bodies = state.shapes, state.bodies
        jointed = broadphase.jointed_body_keys(state.joints, cfg)
        pairs = broadphase.find_pairs_grid(shapes, bodies.type, jointed, cfg)
        return broadphase.match_contacts(state.contacts, pairs, shapes, bodies.type, shapes.body)

    def body(s, _):
        c = jax.vmap(one)(s)
        salt = (c.separation.sum(axis=(1, 2)) * 1e-12)[:, None, None]
        s2 = dataclasses.replace(
            s, bodies=dataclasses.replace(s.bodies, origin=s.bodies.origin + salt)
        )
        return s2, None

    out, _ = jax.lax.scan(body, b, None, length=ITERS)
    return out


def aabbs_fn(b):
    """Stage 4 AABB + fat-AABB update in isolation."""
    import dataclasses

    from solver2d_tpu.ops.geometry import compute_aabbs
    from solver2d_tpu.ops.gather import tgather
    from solver2d_tpu.config import SPECULATIVE_DISTANCE

    def one(state):
        shapes, bodies = state.shapes, state.bodies
        sbt = jnp.where(shapes.alive, tgather(bodies.type, shapes.body), 0)
        new_pose = jnp.concatenate([bodies.origin, bodies.rot], axis=-1)
        sp = tgather(new_pose, shapes.body)
        aabbs = compute_aabbs(shapes.verts, shapes.normals, shapes.count,
                              shapes.radius, sp[:, 0:2], sp[:, 2:4])
        aabbs = aabbs + jnp.array([-1.0, -1.0, 1.0, 1.0], jnp.float32) * SPECULATIVE_DISTANCE
        return broadphase.update_fat_aabbs(shapes, aabbs, sbt)

    def body(s, _):
        fat = jax.vmap(one)(s)
        salt = (fat.sum(axis=(1, 2)) * 1e-12)[:, None, None]
        import dataclasses as dc
        return dc.replace(s, bodies=dc.replace(s.bodies, origin=s.bodies.origin + salt)), None

    out, _ = jax.lax.scan(body, b, None, length=ITERS)
    return out


STAGES = {
    "full": full_fn,
    "broad": broad_fn,
    "narrow": narrow_fn,
    "color": color_fn,
    "colorinc": colorinc_fn,
    "solve": solve_fn,
    "lanesolve": lanesolve_fn,
    "lanefull": lanefull_fn,
    "lanebuild": lanebuild_fn,
    "match": match_fn,
    "aabbs": aabbs_fn,
}

names = sys.argv[1:] or list(STAGES)
for name in names:
    timeit(name, STAGES[name], batch)
