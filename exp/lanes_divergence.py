"""Step a small pyramid with narrowphase='xla' vs 'lanes' in lockstep and
print per-step divergence (position delta, penetration, contact counts).

Run on TPU (default) or CPU (S2_CHECK_PLATFORM=cpu). Used to diagnose the
chip-only lanes-path physics breakage (max_pen=1.5 at 64x211 pyramid)."""
import os
import time

import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

if os.environ.get("S2_CHECK_PLATFORM", "tpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from functools import partial

from solver2d_tpu.config import SolverType
from solver2d_tpu.models.contact_scenes import pyramid_world
from solver2d_tpu.step import step

_t0 = time.time()
BASE = int(os.environ.get("S2_DIV_BASE", "6"))
STEPS = int(os.environ.get("S2_DIV_STEPS", "40"))

w, ids = pyramid_world(SolverType.TGS_SOFT, base_count=BASE)
state, cfg = w.freeze(max_colors=8, gjk_iters=10)
print(f"[{time.time()-_t0:6.1f}s] bodies={len(ids)+1} compiling...", flush=True)

f_xla = jax.jit(partial(step, config=cfg.replace(narrowphase="xla")))
f_lan = jax.jit(partial(step, config=cfg.replace(narrowphase="lanes")))

sx, sl = state, state
for i in range(STEPS):
    sx = f_xla(sx, 1 / 60)
    sl = f_lan(sl, 1 / 60)
    px = np.asarray(sx.bodies.position)
    pll = np.asarray(sl.bodies.position)
    dpos = np.abs(px - pll).max()
    cx = int(np.asarray(sx.diag.contact_count))
    cl = int(np.asarray(sl.diag.contact_count))
    penx = float(np.asarray(sx.diag.max_penetration))
    penl = float(np.asarray(sl.diag.max_penetration))
    ncx = np.asarray(sx.contacts.point_count)
    ncl = np.asarray(sl.contacts.point_count)
    ndiff = int((ncx != ncl).sum())
    print(
        f"[{time.time()-_t0:6.1f}s] step {i:3d} dpos={dpos:.3e} "
        f"contacts x/l={cx}/{cl} pen x/l={penx:.4f}/{penl:.4f} nc_diff={ndiff}",
        flush=True,
    )
    if dpos > 0.5:
        print("diverged hard; stopping early", flush=True)
        break
