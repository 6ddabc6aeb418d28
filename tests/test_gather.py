"""tgather must be a drop-in for jnp integer indexing under any vmap nesting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solver2d_tpu.ops.gather import tgather

pytestmark = pytest.mark.fast


def _ref(table, idx):
    return table[idx]


@pytest.mark.parametrize("idx_shape", [(), (5,), (3, 4)])
def test_unbatched_matches_indexing(idx_shape):
    k = jax.random.PRNGKey(0)
    t = jax.random.normal(k, (7, 3))
    i = jax.random.randint(jax.random.fold_in(k, 1), idx_shape, 0, 7)
    np.testing.assert_array_equal(tgather(t, i), _ref(t, i))
    np.testing.assert_array_equal(jax.jit(tgather)(t, i), _ref(t, i))


def test_negative_and_oob():
    t = jnp.arange(12.0).reshape(6, 2)
    i = jnp.array([-1, -6, 0, 5, 99, -99])
    # jnp semantics: negative wraps, out-of-range clamps
    expect = t[jnp.array([5, 0, 0, 5, 5, 0])]
    np.testing.assert_array_equal(tgather(t, i), expect)
    # and batched
    T = jnp.stack([t, t + 100])
    I = jnp.stack([i, i])
    out = jax.jit(jax.vmap(tgather))(T, I)
    np.testing.assert_array_equal(out[0], expect)
    np.testing.assert_array_equal(out[1], expect + 100)


@pytest.mark.parametrize("in_axes", [(0, 0), (None, 0), (0, None)])
def test_vmap_configs(in_axes):
    k = jax.random.PRNGKey(2)
    W, B, F = 3, 6, 4
    t = jax.random.normal(k, ((W, B, F) if in_axes[0] == 0 else (B, F)))
    i = jax.random.randint(jax.random.fold_in(k, 1), ((W, 5) if in_axes[1] == 0 else (5,)), 0, B)
    got = jax.jit(jax.vmap(tgather, in_axes=in_axes))(t, i)
    want = jax.vmap(_ref, in_axes=in_axes)(t, i)
    np.testing.assert_array_equal(got, want)


def test_nested_vmap():
    k = jax.random.PRNGKey(3)
    t = jax.random.normal(k, (2, 3, 5, 4))          # [W1, W2, B, F]
    i = jax.random.randint(jax.random.fold_in(k, 1), (2, 3, 7), 0, 5)
    got = jax.jit(jax.vmap(jax.vmap(tgather)))(t, i)
    want = jax.vmap(jax.vmap(_ref))(t, i)
    np.testing.assert_array_equal(got, want)


def test_rank3_table():
    k = jax.random.PRNGKey(4)
    t = jax.random.normal(k, (2, 6, 8, 2))          # batched [6, 8, 2] tables
    i = jax.random.randint(jax.random.fold_in(k, 1), (2, 4), 0, 6)
    got = jax.jit(jax.vmap(tgather))(t, i)
    want = jax.vmap(_ref)(t, i)
    np.testing.assert_array_equal(got, want)


def test_inside_scan():
    t = jnp.arange(20.0).reshape(2, 10)
    i = jnp.stack([jnp.arange(5), jnp.arange(5) + 2])

    def body(c, _):
        return c, jax.vmap(tgather)(t, i)

    _, ys = jax.lax.scan(body, 0, None, length=3)
    np.testing.assert_array_equal(ys[0], jax.vmap(_ref)(t, i))


# ------------------------------------------------------------- flat scatters

from solver2d_tpu.ops.gather import tscatter_add, tscatter_max


def _ref_add(t, i, v):
    return t.at[i].add(v)


def _ref_max(t, i, v):
    return t.at[i].max(v)


def test_tscatter_add_matches_at_add():
    k = jax.random.PRNGKey(5)
    t = jax.random.normal(k, (9, 4))
    i = jax.random.randint(jax.random.fold_in(k, 1), (14,), 0, 9)
    v = jax.random.normal(jax.random.fold_in(k, 2), (14, 4))
    np.testing.assert_allclose(
        np.asarray(jax.jit(tscatter_add)(t, i, v)), np.asarray(_ref_add(t, i, v)), rtol=1e-6
    )


def test_tscatter_add_vmap():
    k = jax.random.PRNGKey(6)
    t = jax.random.normal(k, (3, 9, 4))
    i = jax.random.randint(jax.random.fold_in(k, 1), (3, 14), 0, 9)
    v = jax.random.normal(jax.random.fold_in(k, 2), (3, 14, 4))
    got = jax.jit(jax.vmap(tscatter_add))(t, i, v)
    want = jax.vmap(_ref_add)(t, i, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_tscatter_max_vmap_unbatched_target():
    k = jax.random.PRNGKey(7)
    t = jnp.full((9,), -1, jnp.int32)
    i = jax.random.randint(k, (3, 14), 0, 9)
    v = jax.random.randint(jax.random.fold_in(k, 1), (3, 14), 0, 100, jnp.int32)
    got = jax.jit(jax.vmap(lambda ii, vv: tscatter_max(t, ii, vv)))(i, v)
    want = jax.vmap(lambda ii, vv: _ref_max(t, ii, vv))(i, v)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tscatter_nested_vmap():
    k = jax.random.PRNGKey(8)
    t = jax.random.normal(k, (2, 3, 9))
    i = jax.random.randint(jax.random.fold_in(k, 1), (2, 3, 14), 0, 9)
    v = jax.random.normal(jax.random.fold_in(k, 2), (2, 3, 14))
    got = jax.jit(jax.vmap(jax.vmap(tscatter_add)))(t, i, v)
    want = jax.vmap(jax.vmap(_ref_add))(t, i, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
