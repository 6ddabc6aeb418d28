"""Mosaic lowering probes for the fused solver's round-3 extensions.

1. arctan2: the joint limit solve needs relative_angle = atan2(s, c)
   (solvers/joints.py:_motor_limits). Does Mosaic lower jnp.arctan2 on TPU?
2. dot precision: exp/bf16_incidence_probe.py measured that even f32xf32
   one-hot gather-dots are NOT exact on chip with default precision (the MXU
   rounds operands to bf16, maxrel ~4e-3). Is precision=HIGHEST exact, and
   what does it cost?

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python exp/mosaic_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, B = 896, 216


def atan2_kernel(q_ref, out_ref):
    s = q_ref[:, 0] * q_ref[:, 3] - q_ref[:, 1] * q_ref[:, 2]
    c = q_ref[:, 1] * q_ref[:, 3] + q_ref[:, 0] * q_ref[:, 2]
    out_ref[:, 0] = jnp.arctan2(s, c)


def gather_kernel(prec):
    def k(ia_ref, bs_ref, out_ref, oa_ref):
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (C, B), 1)
        ia = ia_ref[:, 0]
        oa_ref[:, :] = (ia[:, None] == iota_b).astype(jnp.float32)
        acc = bs_ref[:, :]
        # 8 chained gather-dots make timing visible and error compound
        for _ in range(8):
            rows = jnp.dot(oa_ref[:, :], acc, preferred_element_type=jnp.float32,
                           precision=prec)
            acc = acc + 1e-8 * acc  # prevent CSE collapsing the chain
            del rows
        out_ref[:, :] = jnp.dot(oa_ref[:, :], bs_ref[:, :],
                                preferred_element_type=jnp.float32, precision=prec)

    return k


def main():
    rng = np.random.default_rng(0)

    # --- 1. atan2 ---
    q = rng.standard_normal((128, 4)).astype(np.float32)
    try:
        f = pl.pallas_call(
            atan2_kernel, out_shape=jax.ShapeDtypeStruct((128, 1), jnp.float32)
        )
        out = np.asarray(jax.jit(f)(q))
        ref = np.arctan2(q[:, 0] * q[:, 3] - q[:, 1] * q[:, 2],
                         q[:, 1] * q[:, 3] + q[:, 0] * q[:, 2])
        err = np.max(np.abs(out[:, 0] - ref))
        print(f"arctan2: LOWERS, maxabs err vs numpy = {err:.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"arctan2: FAILED — {type(e).__name__}: {str(e)[:300]}", flush=True)

    # --- 2. precision ---
    ia = rng.integers(0, B, size=(C, 1)).astype(np.int32)
    bs = (rng.standard_normal((B, 8)) * np.exp(rng.standard_normal((B, 8)) * 4)).astype(np.float32)
    expect = bs[ia[:, 0]]
    for name, prec in [("DEFAULT", None), ("HIGH", jax.lax.Precision.HIGH),
                       ("HIGHEST", jax.lax.Precision.HIGHEST)]:
        try:
            f = pl.pallas_call(
                gather_kernel(prec),
                out_shape=jax.ShapeDtypeStruct((C, 8), jnp.float32),
                scratch_shapes=[pltpu.VMEM((C, B), jnp.float32)],
            )
            jf = jax.jit(f)
            out = np.asarray(jf(ia, bs))

            # timing: scan over DISTINCT stacked inputs with per-iteration
            # outputs (the axon tunnel memoizes repeated identical calls)
            bs_stack = jnp.asarray(
                rng.standard_normal((20, B, 8)).astype(np.float32))

            @jax.jit
            def timed(ia, bs_stack):
                return jax.lax.scan(
                    lambda _, b: (0, f(ia, b)), 0, bs_stack)[1]

            _ = np.asarray(timed(ia, bs_stack))[-1]
            t0 = time.perf_counter()
            _ = np.asarray(timed(ia, bs_stack))[-1]
            dt = (time.perf_counter() - t0) / 20
            exact = np.array_equal(out, expect)
            rel = np.max(np.abs(out - expect) / (np.abs(expect) + 1e-30))
            print(f"gather-dot precision={name}: bitwise-exact={exact} "
                  f"maxrel={rel:.3e} t={dt*1e3:.3f} ms/call", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"gather-dot precision={name}: FAILED — {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
