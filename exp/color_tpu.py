"""DCE-proof TPU timing: gather-based vs reduction-based coloring MIS rounds.
Feeds distinct inputs per scan iteration and returns per-iteration outputs so
nothing folds away. Run: PYTHONPATH=/root/repo:$PYTHONPATH python exp/color_tpu.py"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from exp.color_reform import color_graph_reduce, random_graph
from solver2d_tpu.ops.coloring import color_graph

B, N, NCOL, W, ITERS = 216, 896, 16, 64, 10

keys = jax.random.split(jax.random.PRNGKey(0), ITERS * W)
g = jax.vmap(lambda k: random_graph(k, N, B))(keys)
ba = g[0].reshape(ITERS, W, N)
bb = g[1].reshape(ITERS, W, N)
act = g[2].reshape(ITERS, W, N)
dyn = g[3].reshape(ITERS, W, B)

for name, fn in [("gather", color_graph), ("reduce", color_graph_reduce)]:
    vfn = jax.vmap(lambda a, b, c, d: fn(a, b, c, d, B, NCOL))

    @jax.jit
    def run(ba, bb, act, dyn):
        def body(_, x):
            col, ovf = vfn(*x)
            return None, (col.sum(), ovf.sum())
        _, ys = jax.lax.scan(body, None, (ba, bb, act, dyn))
        return ys

    out = run(ba, bb, act, dyn)
    _ = np.asarray(out[0])
    out = run(ba, bb, act, dyn)
    _ = np.asarray(out[0])
    t0 = time.perf_counter()
    out = run(ba, bb, act, dyn)
    _ = np.asarray(out[0])
    dt = time.perf_counter() - t0
    print(f"{name}: {dt*1000/ITERS:.2f} ms/color-call ({W} worlds)", flush=True)
