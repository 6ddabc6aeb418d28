"""The world step: one pure jitted function State -> State.

Pipeline mirror of s2World_Step (reference: src/world.c:120-306):

1. broadphase pair update + persistent contact matching  (Stage 1)
2. batched narrowphase with warm-start id matching       (Stage 3a)
3. constraint graph coloring (contacts + joints)
4. solver dispatch (static on SimConfig.solver)          (Stage 3c)
5. transform/AABB/fat-AABB update + diagnostics          (Stage 4)

(The reference's Stage 2, tree rebuild, has no analog: sweep-and-prune
re-sorts every step.)

`make_step(config)` returns a jitted step(state, dt) specialized for the
config; vmap/pjit wrappers live in `parallel/`.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .config import SPECULATIVE_DISTANCE, SimConfig
from .ops import broadphase, coloring, manifold
from .ops import math2d as m
from .ops.gather import tgather
from .ops.geometry import compute_aabbs
from .solvers.loops import SOLVERS
from .state import Contacts, Diagnostics, State


def update_manifolds(state: State, contacts: Contacts, gjk_iters: int = 20, impl: str = "xla") -> Contacts:
    """Batched narrowphase over the contact table + warm-start id matching
    (reference: src/contact.c:296-359).

    All per-shape geometry rides ONE packed row-gather per endpoint (and one
    per endpoint body pose): TPU row-gathers have a large fixed per-row cost,
    so 12 field gathers become 4 (see CLAUDE.md).

    impl: 'xla' = vmapped per-pair manifold.collide; 'lanes'/'pallas' = the
    lane-major rewrite (ops/narrow_lanes.py) in plain XLA or as one fused
    Pallas program per world."""
    shapes = state.shapes
    bodies = state.bodies
    sa, sb = contacts.shape_a, contacts.shape_b
    S = shapes.verts.shape[0]
    C = sa.shape[0]

    pose = jnp.concatenate([bodies.origin, bodies.rot], axis=-1)
    pa, pb = tgather(pose, contacts.body_a), tgather(pose, contacts.body_b)

    if impl == "xla":
        geom = jnp.concatenate(
            [
                shapes.verts.reshape(S, 16),
                shapes.normals.reshape(S, 16),
                broadphase._i2f(shapes.count)[:, None],
                shapes.radius[:, None],
            ],
            axis=-1,
        )
        ga, gb = tgather(geom, sa), tgather(geom, sb)
        out = jax.vmap(partial(manifold.collide, gjk_iters=gjk_iters))(
            ga[:, 0:16].reshape(C, 8, 2), ga[:, 16:32].reshape(C, 8, 2),
            broadphase._f2i(ga[:, 32]), ga[:, 33],
            gb[:, 0:16].reshape(C, 8, 2), gb[:, 16:32].reshape(C, 8, 2),
            broadphase._f2i(gb[:, 32]), gb[:, 33],
            pa[:, 0:2], pa[:, 2:4],
            pb[:, 0:2], pb[:, 2:4],
            contacts.cache_count, contacts.cache_index_a, contacts.cache_index_b,
        )
    else:
        from .ops.narrow_pallas import collide_lanes_pallas, collide_lanes_xla

        # lane-major geometry pack: vx(8) vy(8) nx(8) ny(8) count radius
        geom = jnp.concatenate(
            [
                shapes.verts[:, :, 0], shapes.verts[:, :, 1],
                shapes.normals[:, :, 0], shapes.normals[:, :, 1],
                shapes.count[:, None].astype(jnp.float32),
                shapes.radius[:, None],
            ],
            axis=-1,
        )
        ga, gb = tgather(geom, sa), tgather(geom, sb)
        cache = jnp.concatenate(
            [contacts.cache_count[:, None], contacts.cache_index_a, contacts.cache_index_b], axis=-1
        )
        fn = collide_lanes_pallas if impl == "pallas" else collide_lanes_xla
        fout, iout, cout = fn(ga.T, gb.T, pa.T, pb.T, cache.T, gjk_iters)
        out = manifold.ManifoldOut(
            normal=fout[0:2].T,
            anchor_a=jnp.stack([fout[2:4].T, fout[4:6].T], axis=1),
            anchor_b=jnp.stack([fout[6:8].T, fout[8:10].T], axis=1),
            separation=fout[10:12].T,
            point_id=iout[0:2].T,
            point_count=iout[2],
            cache_count=cout[0],
            cache_ia=cout[1:4].T,
            cache_ib=cout[4:7].T,
        )

    return _apply_manifolds(contacts, out)


def _apply_manifolds(contacts: Contacts, out) -> Contacts:
    """Elementwise back half of the narrowphase: warm-start id matching +
    manifold table update (reference: src/contact.c:328-358). Shared by the
    per-world path above and the lane-batched path (vmapped there)."""
    C = contacts.point_id.shape[0]
    alive = contacts.alive
    new_count = jnp.where(alive, out.point_count, 0)

    # old->new point id matching for impulse transfer (contact.c:328-358)
    old_ids = contacts.point_id          # [C,2]
    old_pmask = jnp.arange(2)[None, :] < contacts.point_count[:, None]
    new_ids = out.point_id
    new_pmask = jnp.arange(2)[None, :] < new_count[:, None]

    # match[i,j] = new point i matches old point j
    eq = (new_ids[:, :, None] == old_ids[:, None, :]) & old_pmask[:, None, :] & new_pmask[:, :, None]
    matched = eq.any(-1)
    # index of matching old point (first match)
    old_j = jnp.argmax(eq, axis=-1)  # [C,2]

    def take(old_arr):  # old_arr [C,2]; old_j in {0,1}: select, don't gather
        return jnp.where(old_j == 0, old_arr[:, 0:1], old_arr[:, 1:2])

    n_imp = jnp.where(matched, take(contacts.normal_impulse), 0.0)
    t_imp = jnp.where(matched, take(contacts.tangent_impulse), 0.0)

    def take2(old_arr):  # [C,2,2] fields
        return jnp.where(old_j[:, :, None] == 0, old_arr[:, 0:1, :], old_arr[:, 1:2, :])

    # sticky friction anchors are zero-width for every solver but TGS_Sticky
    # (state.py:Contacts); the shape check is static under jit
    if contacts.friction_normal_a.shape[0] == C:
        fna = jnp.where(matched[..., None], take2(contacts.friction_normal_a), contacts.friction_normal_a)
        fnb = jnp.where(matched[..., None], take2(contacts.friction_normal_b), contacts.friction_normal_b)
        faa = jnp.where(matched[..., None], take2(contacts.friction_anchor_a), contacts.friction_anchor_a)
        fab = jnp.where(matched[..., None], take2(contacts.friction_anchor_b), contacts.friction_anchor_b)
        friction_persisted = (
            (new_count == contacts.point_count)
            & (matched | ~new_pmask).all(-1)
            & alive
        )
    else:
        fna, fnb = contacts.friction_normal_a, contacts.friction_normal_b
        faa, fab = contacts.friction_anchor_a, contacts.friction_anchor_b
        friction_persisted = contacts.friction_persisted

    return dataclasses.replace(
        contacts,
        normal=jnp.where(alive[:, None], out.normal, contacts.normal),
        anchor_a=jnp.where(alive[:, None, None], out.anchor_a, contacts.anchor_a),
        anchor_b=jnp.where(alive[:, None, None], out.anchor_b, contacts.anchor_b),
        separation=jnp.where(alive[:, None], out.separation, contacts.separation),
        normal_impulse=n_imp,
        tangent_impulse=t_imp,
        point_id=jnp.where(alive[:, None], new_ids, contacts.point_id),
        persisted=matched,
        point_count=new_count,
        friction_normal_a=fna, friction_normal_b=fnb,
        friction_anchor_a=faa, friction_anchor_b=fab,
        friction_persisted=friction_persisted,
        cache_count=jnp.where(alive, out.cache_count, contacts.cache_count),
        cache_index_a=jnp.where(alive[:, None], out.cache_ia, contacts.cache_index_a),
        cache_index_b=jnp.where(alive[:, None], out.cache_ib, contacts.cache_index_b),
    )


def update_manifolds_lane(batch: State, contacts: Contacts, config: SimConfig) -> Contacts:
    """Lane-batched narrowphase front-end for a lockstep batch: shape
    geometry is static and identical across worlds (gathered ONCE from world
    0), poses differ per world but the pair indices are shared (from
    match_contacts_lane), so the pose rows ride one wide-row gather instead
    of W [2C]-row gathers. The collide math itself stays vmapped per world
    (ops/narrow_lanes.py lane-major kernel), as does the id-matching core."""
    from functools import partial as _partial

    from .ops.narrow_pallas import collide_lanes_xla

    assert config.narrowphase == "lanes", "lane path uses the lane-major narrowphase"
    W = batch.bodies.type.shape[0]
    s0_shapes = jax.tree_util.tree_map(lambda x: x[0], batch.shapes)
    sa, sb = contacts.shape_a[0], contacts.shape_b[0]
    ba, bb = contacts.body_a[0], contacts.body_b[0]
    C = sa.shape[0]

    geom = jnp.concatenate(
        [
            s0_shapes.verts[:, :, 0], s0_shapes.verts[:, :, 1],
            s0_shapes.normals[:, :, 0], s0_shapes.normals[:, :, 1],
            s0_shapes.count[:, None].astype(jnp.float32),
            s0_shapes.radius[:, None],
        ],
        axis=-1,
    )
    gr = tgather(geom, jnp.concatenate([sa, sb]))
    ga, gb = gr[:C], gr[C:]

    pose = jnp.concatenate([batch.bodies.origin, batch.bodies.rot], axis=-1)  # [W, B, 4]
    pose_wide = jnp.moveaxis(pose, 0, 1).reshape(-1, W * 4)
    prows = tgather(pose_wide, jnp.concatenate([ba, bb])).reshape(2 * C, W, 4)
    pa = jnp.moveaxis(prows[:C], 1, 0)  # [W, C, 4]
    pb = jnp.moveaxis(prows[C:], 1, 0)

    cache = jnp.concatenate(
        [contacts.cache_count[..., None], contacts.cache_index_a, contacts.cache_index_b],
        axis=-1,
    )  # [W, C, 7]

    def one(pa_w, pb_w, cache_w):
        fout, iout, cout = collide_lanes_xla(ga.T, gb.T, pa_w.T, pb_w.T, cache_w.T, config.gjk_iters)
        return manifold.ManifoldOut(
            normal=fout[0:2].T,
            anchor_a=jnp.stack([fout[2:4].T, fout[4:6].T], axis=1),
            anchor_b=jnp.stack([fout[6:8].T, fout[8:10].T], axis=1),
            separation=fout[10:12].T,
            point_id=iout[0:2].T,
            point_count=iout[2],
            cache_count=cout[0],
            cache_ia=cout[1:4].T,
            cache_ib=cout[4:7].T,
        )

    out = jax.vmap(one)(pa, pb, cache)
    return jax.vmap(_apply_manifolds)(contacts, out)


def _pre_solve(state: State, config: SimConfig):
    """Stages 1-3a: broadphase pair update, persistent matching, narrowphase.
    Returns (contacts, pairs, shape_body_type)."""
    shapes = state.shapes
    bodies = state.bodies

    # Stage 1: pair update using last step's fat AABBs
    shape_body_type = jnp.where(shapes.alive, tgather(bodies.type, shapes.body), 0)
    jointed = broadphase.jointed_body_keys(state.joints, config)
    if config.broadphase == "grid":
        pairs = broadphase.find_pairs_grid(shapes, bodies.type, jointed, config)
    else:
        pairs = broadphase.find_pairs(shapes, bodies.type, jointed, config)
    contacts = broadphase.match_contacts(state.contacts, pairs, shapes, bodies.type, shapes.body)

    # Stage 3a: narrowphase. Statically skipped with config.solve_contacts
    # off: on a contact-free scene the table is all-dead and update_manifolds
    # is an exact no-op on it — but the masked GJK/clip math still costs (the
    # Joint Grid scene paid ~250 ms/step of narrowphase over dead slots).
    # Broadphase + matching above still run, so diag.pair_count reveals pairs
    # appearing in a scene that wrongly opted in.
    if config.solve_contacts:
        contacts = update_manifolds(
            state, contacts, gjk_iters=config.gjk_iters, impl=config.narrowphase
        )
    return contacts, pairs, shape_body_type


def _post_solve(state: State, new_bodies, contacts, joints, pairs, shape_body_type,
                touching, c_overflow, j_overflow, config: SimConfig) -> State:
    """Stage 4: AABB + fat-AABB hysteresis update, diagnostics, new State."""
    shapes = state.shapes
    new_pose = jnp.concatenate([new_bodies.origin, new_bodies.rot], axis=-1)
    shape_pose = tgather(new_pose, shapes.body)
    aabbs = compute_aabbs(
        shapes.verts, shapes.normals, shapes.count, shapes.radius,
        shape_pose[:, 0:2], shape_pose[:, 2:4],
    )
    aabbs = aabbs + jnp.array([-1.0, -1.0, 1.0, 1.0], jnp.float32) * SPECULATIVE_DISTANCE
    fat = broadphase.update_fat_aabbs(shapes, aabbs, shape_body_type)
    new_shapes = dataclasses.replace(shapes, aabb=aabbs, fat_aabb=fat)

    pen = jnp.where(
        touching[:, None] & (jnp.arange(2)[None, :] < contacts.point_count[:, None]),
        -contacts.separation, 0.0,
    )
    diag = Diagnostics(
        contact_count=touching.sum().astype(jnp.int32),
        pair_count=pairs.count.astype(jnp.int32),
        pair_overflow=pairs.overflow,
        color_overflow=c_overflow.astype(jnp.int32) + j_overflow.astype(jnp.int32),
        max_penetration=pen.max(),
        step_id=state.diag.step_id + 1,
    )

    return State(
        bodies=new_bodies,
        shapes=new_shapes,
        contacts=contacts,
        joints=joints,
        gravity=state.gravity,
        diag=diag,
    )


def step(state: State, dt, config: SimConfig) -> State:
    """One simulation step. `config` must be static under jit."""
    shapes = state.shapes
    bodies = state.bodies

    contacts, pairs, shape_body_type = _pre_solve(state, config)

    # coloring (contacts and joints separately; they solve in separate
    # passes) + the scatter-free body maps (see ops/coloring.py)
    from .solvers.common import make_body_map

    dyn_mask = (bodies.type == 2) & bodies.alive
    touching = contacts.alive & (contacts.point_count > 0)
    joints_in = state.joints
    # color-bucketed solve (see ops/coloring.py:build_color_buckets): only
    # for solvers whose contact sweeps run the shared gs/ngs passes, and only
    # with incremental coloring (capacity-aware assignment keeps colors
    # within the bucket cap)
    from .config import BUCKETABLE_SOLVERS

    bucketed = (
        config.contact_bucket_cap > 0
        and config.solver in BUCKETABLE_SOLVERS
        and config.incremental_coloring
        and not config.use_pallas_solver
        and config.solve_contacts
    )
    jbucketed = (
        config.joint_bucket_cap > 0
        and config.incremental_coloring
        and not config.use_pallas_solver
        and config.solve_joints
    )
    if not config.solve_contacts:
        # contact phases statically skipped (config.solve_contacts): no
        # contact coloring, no body map — inert placeholders keep the solver
        # signatures uniform (mirror of the solve_joints skip below)
        ccolor = contacts.color
        c_overflow = jnp.int32(0)
        c_active = jnp.zeros_like(touching)
        if config.solve_joints:
            if config.incremental_coloring:
                jcolor, j_overflow = coloring.assign_colors(
                    joints_in.color, joints_in.body_a, joints_in.body_b,
                    joints_in.alive, dyn_mask, config.max_bodies,
                    config.joint_max_colors, rounds=config.color_rounds,
                    bucket_cap=config.joint_bucket_cap if jbucketed else 0,
                )
                joints_in = dataclasses.replace(joints_in, color=jcolor)
                j_active = joints_in.alive & (jcolor >= 0)
            else:
                jcolor, j_overflow = coloring.color_graph(
                    joints_in.body_a, joints_in.body_b, joints_in.alive, dyn_mask,
                    config.max_bodies, config.joint_max_colors,
                )
                j_active = joints_in.alive
    elif config.incremental_coloring:
        # persistent colors ride the contact table / joint state; only new
        # constraints pay coloring rounds (ops/coloring.py:assign_colors)
        ccolor, c_overflow = coloring.assign_colors(
            contacts.color, contacts.body_a, contacts.body_b, touching, dyn_mask,
            config.max_bodies, config.max_colors, rounds=config.color_rounds,
            bucket_cap=config.contact_bucket_cap if bucketed else 0,
        )
        contacts = dataclasses.replace(contacts, color=ccolor)
        c_active = touching & (ccolor >= 0)
        if config.solve_joints:
            jcolor, j_overflow = coloring.assign_colors(
                joints_in.color, joints_in.body_a, joints_in.body_b, joints_in.alive,
                dyn_mask, config.max_bodies, config.joint_max_colors,
                rounds=config.color_rounds,
                bucket_cap=config.joint_bucket_cap if jbucketed else 0,
            )
            joints_in = dataclasses.replace(joints_in, color=jcolor)
            j_active = joints_in.alive & (jcolor >= 0)
    else:
        ccolor, c_overflow = coloring.color_graph(
            contacts.body_a, contacts.body_b, touching, dyn_mask, config.max_bodies, config.max_colors
        )
        c_active = touching
        if config.solve_joints:
            jcolor, j_overflow = coloring.color_graph(
                joints_in.body_a, joints_in.body_b, joints_in.alive, dyn_mask,
                config.max_bodies, config.joint_max_colors,
            )
            j_active = joints_in.alive
    if not config.solve_joints:
        # joint phases are statically skipped (config.solve_joints): no
        # coloring, no body-map scatter — just inert placeholders so the
        # solver signatures stay uniform
        jcolor = joints_in.color
        j_overflow = jnp.int32(0)
        j_active = jnp.zeros_like(joints_in.alive)
    if bucketed:
        cap = config.contact_bucket_cap
        bucket, ccolor, bucket_drop = coloring.build_color_buckets(
            ccolor, c_active, config.max_colors, cap
        )
        contacts = dataclasses.replace(contacts, color=ccolor)
        bi = jnp.maximum(bucket, 0)
        active_b = tgather(c_active, bi) & (bucket >= 0)
        color_b = jnp.repeat(
            jnp.arange(config.max_colors, dtype=jnp.int32), cap, total_repeat_length=config.max_colors * cap
        )
        cmap = make_body_map(
            tgather(contacts.body_a, bi), tgather(contacts.body_b, bi),
            color_b, active_b, dyn_mask, config.max_bodies, config.max_colors,
        )
        c_overflow = c_overflow + bucket_drop + (active_b & ~cmap.winner).sum()
    elif not config.solve_contacts:
        from .solvers.common import BodyMap

        cmap = BodyMap(
            slot=jnp.full((config.max_bodies, config.max_colors), -1, jnp.int32),
            winner=jnp.zeros((config.max_contacts,), bool),
        )
    else:
        cmap = make_body_map(
            contacts.body_a, contacts.body_b, ccolor, c_active, dyn_mask,
            config.max_bodies, config.max_colors,
        )
        c_overflow = c_overflow + (c_active & ~cmap.winner).sum()
    if jbucketed:
        jcap = config.joint_bucket_cap
        jbucket, jcolor, jbucket_drop = coloring.build_color_buckets(
            jcolor, j_active, config.joint_max_colors, jcap
        )
        joints_in = dataclasses.replace(joints_in, color=jcolor)
        jbi = jnp.maximum(jbucket, 0)
        jactive_b = tgather(j_active, jbi) & (jbucket >= 0)
        jcolor_b = jnp.repeat(
            jnp.arange(config.joint_max_colors, dtype=jnp.int32), jcap,
            total_repeat_length=config.joint_max_colors * jcap,
        )
        jmap = make_body_map(
            tgather(joints_in.body_a, jbi), tgather(joints_in.body_b, jbi),
            jcolor_b, jactive_b, dyn_mask, config.max_bodies, config.joint_max_colors,
            write_a_extra=tgather(joints_in.type, jbi) != 1,
        )
        j_overflow = j_overflow + jbucket_drop + (jactive_b & ~jmap.winner).sum()
    elif not config.solve_joints:
        from .solvers.common import BodyMap

        jmap = BodyMap(
            slot=jnp.full((config.max_bodies, config.joint_max_colors), -1, jnp.int32),
            winner=jnp.zeros((config.max_joints,), bool),
        )
    else:
        jmap = make_body_map(
            joints_in.body_a, joints_in.body_b, jcolor, j_active, dyn_mask,
            config.max_bodies, config.joint_max_colors,
            write_a_extra=joints_in.type != 1,  # mouse joints never write body A
        )
    if bucketed or jbucketed:
        colors = (ccolor, cmap, jcolor, jmap,
                  bucket if bucketed else None,
                  jbucket if jbucketed else None)
    else:
        colors = (ccolor, cmap, jcolor, jmap)

    # Stage 3c: solve
    solver_fn = SOLVERS[config.solver]
    new_bodies, contacts, joints = solver_fn(
        bodies, contacts, joints_in, colors, state.gravity, jnp.float32(dt), config
    )

    return _post_solve(
        state, new_bodies, contacts, joints, pairs, shape_body_type,
        touching, c_overflow, j_overflow, config,
    )


def step_batch(batch: State, dt, config: SimConfig) -> State:
    """One step of a [W, ...] world batch.

    With config.lane_solve: broadphase/narrowphase/stage-4 run vmapped per
    world as usual, but coloring + the contact solve run ONCE in the
    lane-batched layout (solvers/lane_solve.py) — shared world-0 constraint
    structure, worlds in the minor dim, so solve-phase row-gather cost stops
    scaling with the batch size. Otherwise identical to vmap(step)."""
    if not config.lane_solve:
        return jax.vmap(lambda s: step(s, dt, config))(batch)

    from .solvers.lane_solve import build_lane_structure, lane_solve

    # Stages 1-3a in lane form: pairing + persistent matching run ONCE on
    # world 0 (a lockstep batch's pair sets and slot layouts are identical;
    # only carried values differ), the per-world carry rides one wide-row
    # gather (broadphase.match_contacts_lane). Worlds whose fat AABBs
    # differ from world 0's — the exact condition under which their pairing
    # could differ — get diag.pair_overflow raised.
    W = batch.bodies.type.shape[0]
    s0 = jax.tree_util.tree_map(lambda x: x[0], batch)
    sbt0 = jnp.where(s0.shapes.alive, tgather(s0.bodies.type, s0.shapes.body), 0)
    jointed0 = broadphase.jointed_body_keys(s0.joints, config)
    if config.broadphase == "grid":
        pairs0 = broadphase.find_pairs_grid(s0.shapes, s0.bodies.type, jointed0, config)
    else:
        pairs0 = broadphase.find_pairs(s0.shapes, s0.bodies.type, jointed0, config)
    diverged = (batch.shapes.fat_aabb != batch.shapes.fat_aabb[0:1]).any(axis=(1, 2))

    contacts = broadphase.match_contacts_lane(
        batch.contacts, pairs0, s0.shapes, s0.bodies.type, s0.shapes.body
    )
    if config.narrowphase == "lanes":
        contacts = update_manifolds_lane(batch, contacts, config)
    else:
        contacts = jax.vmap(
            lambda s, c: update_manifolds(s, c, gjk_iters=config.gjk_iters, impl=config.narrowphase)
        )(batch, contacts)

    dyn0 = (batch.bodies.type[0] == 2) & batch.bodies.alive[0]
    struct = build_lane_structure(contacts, dyn0, config)
    # keep every world's persistent colors synced to the shared structure
    contacts = dataclasses.replace(
        contacts, color=jnp.broadcast_to(struct.ccolor[None], contacts.color.shape)
    )

    new_bodies, contacts, mismatch = lane_solve(
        batch.bodies, contacts, struct, batch.gravity[0], jnp.float32(dt), config
    )

    touching = contacts.alive & (contacts.point_count > 0)
    c_overflow = struct.shared_overflow + mismatch
    j_overflow = jnp.zeros_like(c_overflow)
    pairs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (W,) + x.shape), pairs0
    )
    pairs = pairs._replace(overflow=pairs.overflow | diverged)
    shape_body_type = jnp.broadcast_to(sbt0[None], (W,) + sbt0.shape)
    return jax.vmap(
        lambda s, nb, c, p, sbt, tch, co, jo: _post_solve(
            s, nb, c, s.joints, p, sbt, tch, co, jo, config
        )
    )(batch, new_bodies, contacts, pairs, shape_body_type, touching, c_overflow, j_overflow)


_STEP_CACHE: dict = {}


def make_step(config: SimConfig):
    """Returns step(state, dt) jitted and specialized for `config`.

    Memoized per config: SimConfig is hashable/immutable, and a fresh
    jax.jit wrapper per call would re-trace the full step program each time
    (minutes on a 1-core host for the larger solver programs — the round-4
    test suite paid this repeatedly in test_aux.py)."""
    f = _STEP_CACHE.get(config)
    if f is None:
        f = _STEP_CACHE.setdefault(config, jax.jit(partial(step, config=config)))
    return f


def run(state: State, config: SimConfig, steps: int, dt=1.0 / 60.0):
    """Convenience: scan `steps` steps (compiled once)."""

    def body(s, _):
        return step(s, dt, config), None

    out, _ = jax.lax.scan(body, state, None, length=steps)
    return out
