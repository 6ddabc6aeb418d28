"""Probe: can the fused Pallas solver store its one-hot incidence matrices in
bf16 (halving the VMEM gate) without losing exactness?

Two questions, answered on the real chip:
1. Does Mosaic accept jnp.dot(bf16[C,B], f32[B,8], preferred_element_type=f32)
   (mixed-precision MXU matmul)? If not, does an in-kernel astype(f32) at use
   time still lower (peak VMEM = 2x bf16 + 1x f32 temp = same as today, no
   win), or does bf16xbf16 with an f32-split trick work?
2. Is the result EXACT for one-hot selection? 0/1 are exact in bf16; the f32
   operand must pass through unrounded (XLA decomposes f32 into bf16 limbs on
   the MXU; with a 0/1 bf16 left operand the sum of limb products
   reconstructs the f32 exactly).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python exp/bf16_incidence_probe.py
"""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, B = 896, 216


def kernel_mixed(ia_ref, bs_ref, out_ref, oa_ref):
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (C, B), 1)
    ia = ia_ref[:, 0]
    oa_ref[:, :] = (ia[:, None] == iota_b).astype(jnp.bfloat16)
    out_ref[:, :] = jnp.dot(oa_ref[:, :], bs_ref[:, :], preferred_element_type=jnp.float32)


def kernel_f32(ia_ref, bs_ref, out_ref, oa_ref):
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (C, B), 1)
    ia = ia_ref[:, 0]
    oa_ref[:, :] = (ia[:, None] == iota_b).astype(jnp.float32)
    out_ref[:, :] = jnp.dot(oa_ref[:, :], bs_ref[:, :], preferred_element_type=jnp.float32)


def kernel_transposed_mixed(ia_ref, rows_ref, out_ref, oa_ref):
    # scatter direction: oa^T @ rows, contracting dim 0
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (C, B), 1)
    ia = ia_ref[:, 0]
    oa_ref[:, :] = (ia[:, None] == iota_b).astype(jnp.bfloat16)
    out_ref[:, :] = jax.lax.dot_general(
        oa_ref[:, :], rows_ref[:, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def run(name, kernel, oa_dtype, ia, x, out_shape):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            scratch_shapes=[pltpu.VMEM((C, B), oa_dtype)],
        )
        out = jax.jit(f)(ia, x)
        out = np.asarray(out)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:300]}")
        return None


def main():
    rng = np.random.default_rng(0)
    ia = rng.integers(0, B, size=(C, 1)).astype(np.int32)
    bs = (rng.standard_normal((B, 8)) * np.exp(rng.standard_normal((B, 8)) * 4)).astype(np.float32)
    rows = (rng.standard_normal((C, 8)) * np.exp(rng.standard_normal((C, 8)) * 4)).astype(np.float32)

    expect_gather = bs[ia[:, 0]]
    out = run("mixed bf16xf32 gather-dot", kernel_mixed, jnp.bfloat16, ia, bs, (C, 8))
    if out is not None:
        exact = np.array_equal(out, expect_gather)
        print(f"mixed bf16xf32 gather-dot: ran, bitwise-exact={exact}, "
              f"maxrel={np.max(np.abs(out - expect_gather) / (np.abs(expect_gather) + 1e-30)):.3e}")

    out = run("f32xf32 gather-dot (control)", kernel_f32, jnp.float32, ia, bs, (C, 8))
    if out is not None:
        exact = np.array_equal(out, expect_gather)
        print(f"f32xf32 gather-dot (control): ran, bitwise-exact={exact}")

    # scatter-add direction: sum of rows per body
    expect_scat = np.zeros((B, 8), np.float32)
    np.add.at(expect_scat, ia[:, 0], rows)
    out = run("mixed bf16xf32 transposed-dot", kernel_transposed_mixed, jnp.bfloat16, ia, rows, (B, 8))
    if out is not None:
        # float add order may differ from np.add.at; compare with tolerance
        rel = np.max(np.abs(out - expect_scat) / (np.abs(expect_scat) + 1e-20))
        print(f"mixed bf16xf32 transposed-dot: ran, maxrel={rel:.3e} "
              f"(bitwise={np.array_equal(out, expect_scat)})")


if __name__ == "__main__":
    main()
