"""On-chip validation of the fused Pallas solver's JOINT pass.

The CPU suite runs the kernel in interpret mode, which hides Mosaic lowering
gaps (atan2) and MXU operand rounding (DEFAULT precision = bf16). This script
answers, on the real chip:
  1. does the jointed kernel COMPILE (poly atan2 lowers, VMEM fits)?
  2. does it track the XLA path (HIGHEST one-hot dots are exact)?
  3. what does it cost vs the XLA path on a joint-heavy scene?

Run: PYTHONPATH=/root/repo:$PYTHONPATH python exp/chip_joint_pallas.py
Env: S2_JP_WORLDS (32), S2_JP_STEPS (30), S2_JP_SOLVER (TGS_SOFT)
"""

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from solver2d_tpu.config import SolverType
from solver2d_tpu.models import build
from solver2d_tpu.parallel import replicate_state
from solver2d_tpu.step import step

WORLDS = int(os.environ.get("S2_JP_WORLDS", "32"))
STEPS = int(os.environ.get("S2_JP_STEPS", "30"))
SOLVER = SolverType[os.environ.get("S2_JP_SOLVER", "TGS_SOFT")]

print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)


def run(name, **over):
    w = build("Joints", "Bridge", SOLVER)
    state, cfg = w.freeze(max_colors=8, **over)
    vstep = jax.vmap(partial(step, config=cfg), in_axes=(0, None))

    @jax.jit
    def run_block(b):
        def body(s, _):
            return vstep(s, jnp.float32(1 / 60)), None
        return jax.lax.scan(body, b, None, length=STEPS)[0]

    batch = replicate_state(state, WORLDS)
    t0 = time.perf_counter()
    batch = run_block(batch)
    _ = np.asarray(batch.diag.step_id)
    print(f"{name}: compile+first block {time.perf_counter()-t0:.1f}s", flush=True)
    batch = run_block(batch)
    _ = np.asarray(batch.diag.step_id)
    t0 = time.perf_counter()
    batch = run_block(batch)
    pos = np.asarray(batch.bodies.position)
    dt = time.perf_counter() - t0
    from solver2d_tpu.utils.metrics import joint_error
    jerr = float(np.asarray(joint_error(jax.tree.map(lambda x: x[0], batch))))
    ovf = int(np.asarray(batch.diag.color_overflow).max())
    print(f"{name}: {WORLDS*STEPS/dt:8.1f} wsps ({dt*1000/STEPS:.2f} ms/step) "
          f"joint_err={jerr:.4f} ovf={ovf}", flush=True)
    return pos, np.asarray(batch.joints.impulse)


pos_x, jimp_x = run("xla  ")
pos_p, jimp_p = run("pallas", use_pallas_solver=True)

dpos = np.max(np.abs(pos_p - pos_x))
djmp = np.max(np.abs(jimp_p - jimp_x))
print(f"max |pos_pallas - pos_xla|   = {dpos:.3e}", flush=True)
print(f"max |jimp_pallas - jimp_xla| = {djmp:.3e}", flush=True)
print("VERDICT:", "MATCH" if (dpos < 5e-3 and np.isfinite(dpos)) else "DIVERGED", flush=True)
