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
    assert out.shape == ()
    np.testing.assert_allclose(np.asarray(out), 3.5)


def test_host_slab_mpc_matches_single_batch():
    """CPU-sized mirror of the BENCH_NOTES 4096-instance recipe (8 slabs x
    512): when a batch exceeds HBM, it is processed as host-side slabs
    through the SAME jitted batched mpc_step.  Slabbed results must equal the
    single-batch run slab-for-slab (identical executable, identical inputs)."""
    env = envs.pendulum()
    B, nslab = 16, 2
    sb, sols = pbatch.init_batched(env, B, qpos_noise=0.02)
    stepf = pbatch.make_batched_mpc_step(env)

    # single batch, 2 frames
    s_all, sol_all = sb, sols
    for _ in range(2):
        s_all, sol_all, costs_all = stepf(s_all, sol_all)

    # two host-side slabs through the same jitted step
    tm = jax.tree_util.tree_map
    outs = []
    for k in range(nslab):
        sl = slice(k * B // nslab, (k + 1) * B // nslab)
        s_k = tm(lambda a: a[sl], sb)
        sol_k = tm(lambda a: a[sl], sols)
        for _ in range(2):
            s_k, sol_k, costs_k = stepf(s_k, sol_k)
        outs.append((s_k, costs_k))

    qpos_slab = np.concatenate([np.asarray(o[0].qpos) for o in outs])
    costs_slab = np.concatenate([np.asarray(o[1]) for o in outs])
    # slab size differs from full-batch size => different executables =>
    # FD-noise-level differences only
    np.testing.assert_allclose(qpos_slab, np.asarray(s_all.qpos),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(costs_slab, np.asarray(costs_all),
                               rtol=1e-6, atol=1e-9)
