"""Vectorized 2D rigid-body math on jnp arrays.

Vectors are arrays with trailing dimension 2. Rotations are (sin, cos) pairs
with trailing dimension 2 — NOT angles — matching the reference's s2Rot
representation (reference: include/solver2d/types.h:36-40) so that the
first-order integrate + renormalize update (math.h:209-236) and the
angular-velocity recovery (math.h:238-264) are reproduced exactly.

All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def vec2(x, y):
    return jnp.stack(jnp.broadcast_arrays(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)), axis=-1)


def dot(a, b):
    return (a * b).sum(-1)


def cross(a, b):
    """2D cross product -> scalar. (reference: math.h:53-56)"""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def cross_vs(v, s):
    """v x s -> right-perp scaled. (reference: math.h:60-63)"""
    s = jnp.asarray(s)
    return jnp.stack([s * v[..., 1], -s * v[..., 0]], axis=-1)


def cross_sv(s, v):
    """s x v. (reference: math.h:67-70)"""
    s = jnp.asarray(s)
    return jnp.stack([-s * v[..., 1], s * v[..., 0]], axis=-1)


def right_perp(v):
    return jnp.stack([v[..., 1], -v[..., 0]], axis=-1)


def left_perp(v):
    return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


def length(v):
    return jnp.sqrt(dot(v, v))


def normalize(v, eps=1e-12):
    l = length(v)
    inv = jnp.where(l > eps, 1.0 / jnp.maximum(l, eps), 0.0)
    return v * inv[..., None]


def get_length_and_normalize(v, eps=1e-12):
    l = length(v)
    inv = jnp.where(l > eps, 1.0 / jnp.maximum(l, eps), 0.0)
    return l, v * inv[..., None]


# --- Rotations: r[..., 0] = sin, r[..., 1] = cos ---

def rot_identity(shape=()):
    s = jnp.zeros(shape, jnp.float32)
    c = jnp.ones(shape, jnp.float32)
    return jnp.stack([s, c], axis=-1)


def make_rot(angle):
    angle = jnp.asarray(angle, jnp.float32)
    return jnp.stack([jnp.sin(angle), jnp.cos(angle)], axis=-1)


def normalize_rot(q):
    mag = jnp.sqrt(q[..., 0] ** 2 + q[..., 1] ** 2)
    inv = jnp.where(mag > 0.0, 1.0 / jnp.maximum(mag, 1e-30), 0.0)
    return q * inv[..., None]


def integrate_rot(q, omega_h):
    """First-order update + renormalize (reference: math.h:209-236)."""
    omega_h = jnp.asarray(omega_h)
    s = q[..., 0] + omega_h * q[..., 1]
    c = q[..., 1] - omega_h * q[..., 0]
    return normalize_rot(jnp.stack([s, c], axis=-1))


def compute_angular_velocity(q1, q2, inv_h):
    """omega from two rotations (reference: math.h:238-264)."""
    return inv_h * (q2[..., 0] * q1[..., 1] - q2[..., 1] * q1[..., 0])


def atan2(y, x):
    """Branchless elementwise atan2 built from mul/add/select only.

    Mosaic has no atan2 lowering (NotImplementedError on TPU kernels, probed
    in exp/mosaic_probe.py), and `relative_angle` now runs INSIDE the fused
    Pallas solver's joint pass — so every atan2 in solver math routes through
    this implementation, keeping the XLA and Pallas paths bit-identical.

    Octant reduction to |z| <= tan(pi/8) followed by the Cephes atanf minimax
    polynomial (~1 ulp on the reduced range; overall error vs libm atan2f
    measured < 3e-7 rad). atan2(0, 0) = 0 like libm with +0 inputs.

    Deliberate deviations from IEEE atan2 (inputs here are unit rotations, so
    these only matter exactly at the ±pi branch cut): atan2(-0.0, x<0)
    returns +pi (the y<0 select does not see negative zero; jnp.signbit would
    fix it but has no Mosaic lowering guarantee, and this fn must stay
    kernel-safe), and atan2(inf, inf) is NaN via inf/inf.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.where(hi > 0.0, hi, 1.0)  # in [0, 1]; 0 when x=y=0
    # second reduction: a > tan(pi/8) -> atan(a) = pi/4 + atan((a-1)/(a+1))
    big = a > 0.4142135623730950
    z = jnp.where(big, (a - 1.0) / (a + 1.0), a)
    z2 = z * z
    p = (((8.05374449538e-2 * z2 - 1.38776856032e-1) * z2 + 1.99777106478e-1)
         * z2 - 3.33329491874e-1) * z2 * z + z
    t = jnp.where(big, 0.25 * jnp.pi + p, p)
    t = jnp.where(ay > ax, 0.5 * jnp.pi - t, t)
    t = jnp.where(x < 0.0, jnp.pi - t, t)
    return jnp.where(y < 0.0, -t, t)


def rot_angle(q):
    return atan2(q[..., 0], q[..., 1])


def mul_rot(b, a):
    """b*a, angle addition (reference: math.h:291-301)."""
    s = b[..., 0] * a[..., 1] + b[..., 1] * a[..., 0]
    c = b[..., 1] * a[..., 1] - b[..., 0] * a[..., 0]
    return jnp.stack([s, c], axis=-1)


def inv_mul_rot(b, a):
    """inv(b)*a, angle subtraction (reference: math.h:307-317)."""
    s = b[..., 1] * a[..., 0] - b[..., 0] * a[..., 1]
    c = b[..., 1] * a[..., 1] + b[..., 0] * a[..., 0]
    return jnp.stack([s, c], axis=-1)


def relative_angle(b, a):
    """atan2 of rot_b relative to rot_a (reference: math.h:320-327)."""
    s = b[..., 0] * a[..., 1] - b[..., 1] * a[..., 0]
    c = b[..., 1] * a[..., 1] + b[..., 0] * a[..., 0]
    return atan2(s, c)


def rotate(q, v):
    """(reference: math.h:330-341)"""
    x = q[..., 1] * v[..., 0] - q[..., 0] * v[..., 1]
    y = q[..., 0] * v[..., 0] + q[..., 1] * v[..., 1]
    return jnp.stack([x, y], axis=-1)


def inv_rotate(q, v):
    x = q[..., 1] * v[..., 0] + q[..., 0] * v[..., 1]
    y = -q[..., 0] * v[..., 0] + q[..., 1] * v[..., 1]
    return jnp.stack([x, y], axis=-1)


# --- Transforms: tuple (p, q) with p [...,2], q [...,2] ---

def transform_point(p, q, v):
    return p + rotate(q, v)


def inv_transform_point(p, q, v):
    return inv_rotate(q, v - p)


def inv_mul_transforms(pA, qA, pB, qB):
    """C = inv(A) * B (reference: math.h:378-384). Returns (p, q)."""
    return inv_rotate(qA, pB - pA), inv_mul_rot(qA, qB)


# --- 2x2 systems. Matrices as [..., 2, 2] with m[..., i, j] = row i col j ---

def mat22(a11, a12, a21, a22):
    r0 = jnp.stack(jnp.broadcast_arrays(a11, a12), axis=-1)
    r1 = jnp.stack(jnp.broadcast_arrays(a21, a22), axis=-1)
    return jnp.stack([r0, r1], axis=-2)


def mul_mv(m, v):
    return jnp.stack(
        [
            m[..., 0, 0] * v[..., 0] + m[..., 0, 1] * v[..., 1],
            m[..., 1, 0] * v[..., 0] + m[..., 1, 1] * v[..., 1],
        ],
        axis=-1,
    )


def inverse22(m):
    """Inverse with det==0 -> zero matrix (reference: math.h:392-406)."""
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    det = a * d - b * c
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    return mat22(inv_det * d, -inv_det * b, -inv_det * c, inv_det * a)


def solve22(m, b):
    """Solve m x = b with det==0 -> zero (reference: math.h:410-420)."""
    a11, a12 = m[..., 0, 0], m[..., 0, 1]
    a21, a22 = m[..., 1, 0], m[..., 1, 1]
    det = a11 * a22 - a12 * a21
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    x = inv_det * (a22 * b[..., 0] - a12 * b[..., 1])
    y = inv_det * (a11 * b[..., 1] - a21 * b[..., 0])
    return jnp.stack([x, y], axis=-1)
