"""Gather-free coloring prototype: replace tgather(used/owner, slot) with
[B,N] axis-0 reductions over the incidence matrix. Must be bit-identical to
ops.coloring.color_graph. Validate on CPU vs current, then time on TPU."""

import os
import sys

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from solver2d_tpu.ops.coloring import color_graph, _hash_priority

INT32_MAX = jnp.iinfo(jnp.int32).max


def color_graph_reduce(body_a, body_b, active, dynamic_mask, num_bodies: int, max_colors: int, inner_rounds: int = 4):
    """Reduction-only variant: no row-gathers inside the MIS rounds."""
    from solver2d_tpu.ops.gather import tgather

    N = body_a.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    pri = _hash_priority(idx)

    dyn_a = tgather(dynamic_mask, body_a)
    dyn_b = tgather(dynamic_mask, body_b)
    slot_a = jnp.where(dyn_a, body_a, num_bodies)
    slot_b = jnp.where(dyn_b, body_b, num_bodies)

    rows = jnp.arange(num_bodies, dtype=jnp.int32)[:, None]
    inc_a = slot_a[None, :] == rows          # [B, N]
    inc_b = slot_b[None, :] == rows
    inc = inc_a | inc_b
    inc = jax.lax.optimization_barrier(inc)
    inc_a = jax.lax.optimization_barrier(inc_a)
    inc_b = jax.lax.optimization_barrier(inc_b)

    def one_color(uncolored, _):
        used0 = jnp.zeros((num_bodies,), bool)
        sel0 = jnp.zeros((N,), bool)

        def inner(carry, _):
            used, selected = carry
            used_a = (inc_a & used[:, None]).any(axis=0)   # [N]
            used_b = (inc_b & used[:, None]).any(axis=0)
            elig = uncolored & active & ~selected & ~used_a & ~used_b
            cand_pri = jnp.where(elig, pri, INT32_MAX)
            owner = jnp.where(inc, cand_pri[None, :], INT32_MAX).min(axis=1)  # [B]
            own_a = jnp.where(inc_a, owner[:, None], INT32_MAX).min(axis=0)   # [N]
            own_b = jnp.where(inc_b, owner[:, None], INT32_MAX).min(axis=0)
            win = elig & (~dyn_a | (own_a == pri)) & (~dyn_b | (own_b == pri))
            selected = selected | win
            used = used | (inc & win[None, :]).any(axis=1)
            return (used, selected), None

        carry = (used0, sel0)
        for _r in range(inner_rounds):
            carry, _ = inner(carry, None)
        (_, selected) = carry
        return uncolored & ~selected, selected

    uncolored = jnp.ones((N,), bool)
    sels = []
    for _c in range(max_colors - 1):
        uncolored, sel = one_color(uncolored, None)
        sels.append(sel)
    selected_rounds = jnp.stack(sels)
    rounds = jnp.arange(max_colors - 1, dtype=jnp.int32)
    sel_color = jnp.where(selected_rounds, rounds[:, None], max_colors - 1).min(axis=0)
    color = jnp.where(active, sel_color, max_colors - 1)
    overflow = (uncolored & active).sum()
    return color, overflow


def random_graph(key, N, B, density=0.2):
    ka, kb, kc, kd = jax.random.split(key, 4)
    body_a = jax.random.randint(ka, (N,), 0, B, jnp.int32)
    body_b = (body_a + 1 + jax.random.randint(kb, (N,), 0, B - 1, jnp.int32)) % B
    active = jax.random.uniform(kc, (N,)) < density
    dyn = jax.random.uniform(kd, (B,)) < 0.8
    return body_a, body_b, active, dyn


def main():
    B, N, NCOL = 216, 896, 16
    if "--cpu" in sys.argv:
        # equality check
        for seed in range(5):
            ba, bb, act, dyn = random_graph(jax.random.PRNGKey(seed), N, B)
            c0, o0 = jax.jit(lambda *a: color_graph(*a, B, NCOL))(ba, bb, act, dyn)
            c1, o1 = jax.jit(lambda *a: color_graph_reduce(*a, B, NCOL))(ba, bb, act, dyn)
            assert (np.asarray(c0) == np.asarray(c1)).all(), f"seed {seed}: colors differ"
            assert int(o0) == int(o1), f"seed {seed}: overflow differs"
        print("EQUAL: reduce variant == gather variant (5 random graphs)")
        return

    # timing on the default backend (TPU): vmapped over worlds, chained scan
    import time
    W = int(os.environ.get("S2_PROF_WORLDS", "64"))
    ITERS = 10
    ba, bb, act, dyn = random_graph(jax.random.PRNGKey(0), N, B)
    bav = jnp.broadcast_to(ba, (W, N)).copy()
    bbv = jnp.broadcast_to(bb, (W, N)).copy()
    actv = jnp.broadcast_to(act, (W, N)).copy()
    dynv = jnp.broadcast_to(dyn, (W, B)).copy()

    for name, fn in [("gather", color_graph), ("reduce", color_graph_reduce)]:
        vfn = jax.vmap(lambda a, b, c, d: fn(a, b, c, d, B, NCOL))

        @jax.jit
        def run(ba, bb, act, dyn):
            def body(carry, _):
                ba, bb = carry
                col, ovf = vfn(ba, bb, act, dyn)
                return (ba + (col.sum(-1) * 0).astype(jnp.int32)[:, None], bb), ovf
            out, _ = jax.lax.scan(body, (ba, bb), None, length=ITERS)
            return out

        out = run(bav, bbv, actv, dynv)
        _ = np.asarray(out[0])
        out = run(bav, bbv, actv, dynv)
        _ = np.asarray(out[0])
        t0 = time.perf_counter()
        out = run(bav, bbv, actv, dynv)
        _ = np.asarray(out[0])
        dt = time.perf_counter() - t0
        print(f"{name}: {dt*1000/ITERS:.2f} ms/color-call ({W} worlds)", flush=True)


if __name__ == "__main__":
    main()
