"""Batch/shard layer tests on the 8-device virtual CPU mesh (the SURVEY §4
strategy: DP sharding testable without a TPU pod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqg_mujoco_tpu.models import envs
from ilqg_mujoco_tpu.parallel import batch as pbatch
from ilqg_mujoco_tpu.parallel.distributed import global_mean


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_batched_solve_sharded_matches_single():
    env = envs.pendulum()
    mesh = pbatch.make_mesh()
    B = 8
    sb, sols = pbatch.init_batched(env, B, mesh, qpos_noise=0.0)
    solve = pbatch.make_batched_solve(env, mesh)
    sols2, traces = solve(sb, sols)
    traces = np.asarray(traces)
    assert traces.shape == (B, env.ilqr.iterations)
    # identical initial states => same traces across the batch (tiny
    # reassociation differences across device shards are acceptable; the FD
    # epsilon amplifies them)
    np.testing.assert_allclose(
        traces, np.broadcast_to(traces[0:1], traces.shape), rtol=1e-5)
    # and they match the unsharded single-instance solve
    from ilqg_mujoco_tpu import ilqr, mpc
    s0, sol0 = mpc.init(env)
    # init_batched skips warm-in; redo with the same state
    sb1 = jax.tree_util.tree_map(lambda a: a[0], sb)
    sol1 = jax.tree_util.tree_map(lambda a: a[0], sols)
    _, trace1 = jax.jit(lambda s, so: ilqr.solve(
        env.model, env.cost_fn, s, so, env.ilqr))(sb1, sol1)
    np.testing.assert_allclose(traces[0], np.asarray(trace1), rtol=1e-5)


def test_batched_mpc_step_diverse_batch():
    env = envs.pendulum()
    mesh = pbatch.make_mesh()
    B = 16   # 2 instances per device
    sb, sols = pbatch.init_batched(env, B, mesh, qpos_noise=0.02)
    stepf = pbatch.make_batched_mpc_step(env, mesh)
    for _ in range(3):
        sb, sols, costs = stepf(sb, sols)
    assert np.all(np.isfinite(np.asarray(sb.qpos)))
    assert costs.shape == (B,)


def test_global_mean_collective():
    mesh = pbatch.make_mesh()
    x = jnp.arange(8.0)
    out = global_mean(x, mesh)
    np.testing.assert_allclose(np.asarray(out), 3.5)
