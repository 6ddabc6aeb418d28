"""Empirically locate the fused Pallas solver's VMEM gate on the real chip.

Round 2 set the gate at B*C <= 2^18 after halving the persistent incidence
matrices, but the first actual compile of a gate-edge config (bench scene,
216x896 = 193K) OOMs scoped VMEM: 23.57M > 16M. The compiler's scoped
allocation includes Mosaic's matmul transpose buffers and loop temporaries,
not just our two [C,B] scratch matrices — so the gate must be set by
measured compiles, not arithmetic.

AOT-compiles (never runs) the bench pyramid at a ladder of contact
capacities and reports pass/OOM + the compiler's scoped size when it fails.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python exp/pallas_vmem_probe.py [C ...]
"""

import re
import sys
from functools import partial

import jax
import jax.numpy as jnp

from solver2d_tpu.config import SolverType
from solver2d_tpu.models.contact_scenes import pyramid_world
from solver2d_tpu.step import step

CS = [int(a) for a in sys.argv[1:]] or [512, 640, 768, 896]


def try_compile(C):
    w, ids = pyramid_world(SolverType.TGS_SOFT, base_count=20)
    state, cfg = w.freeze(
        max_contacts=C, max_colors=10, gjk_iters=10,
        narrowphase="lanes", use_pallas_solver=True,
    )
    B = cfg.max_bodies
    f = jax.jit(jax.vmap(partial(step, config=cfg), in_axes=(0, None)))
    import solver2d_tpu.parallel as par

    batch = par.replicate_state(state, 8)
    try:
        f.lower(batch, jnp.float32(1 / 60)).compile()
        print(f"C={C}: B*C={B*C} ({B}x{C}) COMPILES", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        m = re.search(r"size ([0-9.]+[MK]) and limit ([0-9.]+[MK])", msg)
        detail = f"scoped {m.group(1)} > {m.group(2)}" if m else msg[:160]
        print(f"C={C}: B*C={B*C} ({B}x{C}) OOM — {detail}", flush=True)
        return False


for C in CS:
    try_compile(C)
