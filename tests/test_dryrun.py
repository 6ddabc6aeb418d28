"""Driver dryrun program: correctness + compile-cache pre-warm.

Runs the EXACT program `__graft_entry__.dryrun_multichip(8)` compiles (same
scene, same SimConfig, same 8-way CPU mesh, same batch shape), so every test
run leaves the executable in the persistent cache (/tmp/jaxcache, set by
conftest) and the driver's dryrun hits it warm.
"""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from __graft_entry__ import dryrun_state_cfg, lane_dryrun_state_cfg  # noqa: E402
from solver2d_tpu.parallel import (  # noqa: E402
    make_mesh,
    replicate_state,
    shard_state,
    sharded_step,
)

pytestmark = pytest.mark.fast


def test_dryrun_program_runs_and_shards():
    n = 8
    devices = jax.devices()[:n]
    assert len(devices) == n
    mesh = make_mesh(devices)

    state, cfg = dryrun_state_cfg()
    batch = replicate_state(state, 2 * n)
    batch = shard_state(batch, mesh)
    stepf = sharded_step(cfg, mesh)
    out = stepf(batch, 1.0 / 60.0)
    jax.block_until_ready(out)

    assert out.bodies.position.shape[0] == 2 * n
    for leaf in jax.tree.leaves(out):
        s = getattr(leaf, "sharding", None)
        assert s is not None and not s.is_fully_replicated

    # identical worlds stay identical under sharded stepping
    pos = np.asarray(out.bodies.position)
    assert np.isfinite(pos).all()
    np.testing.assert_array_equal(pos[0], pos[-1])


@pytest.mark.skip(
    reason="shard_map(step_batch) compiles pathologically slowly on the CPU "
    "backend (>60 min for a tiny scene vs ~2 min for the same program "
    "without shard_map — killed a suite run); the lane sharded path is "
    "exposed by parallel.sharded_step for real TPU meshes but is not "
    "CPU-dryrunnable. See __graft_entry__._dryrun_impl note."
)
def test_lane_dryrun_program_runs_and_shards():
    """The lane-batched leg of dryrun_multichip: step_batch under shard_map
    over the worlds mesh (same program the driver compiles, pre-warmed)."""
    n = 8
    mesh = make_mesh(jax.devices()[:n])
    state, cfg = lane_dryrun_state_cfg()
    batch = shard_state(replicate_state(state, 2 * n), mesh)
    stepf = sharded_step(cfg, mesh)
    out = stepf(batch, 1.0 / 60.0)
    jax.block_until_ready(out)
    for leaf in jax.tree.leaves(out):
        s = getattr(leaf, "sharding", None)
        assert s is not None and not s.is_fully_replicated
    pos = np.asarray(out.bodies.position)
    assert np.isfinite(pos).all()
    np.testing.assert_array_equal(pos[0], pos[-1])
