"""Batch/shard layer (L5', SURVEY.md §7.1.5): scale the MPC engine over a
TPU mesh.

The reference's only parallelism is an OpenMP thread pool inside one FD call
(SURVEY.md §2a).  Here the scaling axis is *data parallelism over independent
problem instances*: a batch of MPC problems is a vmapped State, sharded over
the ``data`` axis of a :class:`jax.sharding.Mesh`.  Because instances are
independent, the only collectives are metric reductions (cost traces), which
ride ICI; there is no parameter traffic.  TP/PP/SP/EP are documented N/A for
this workload (per-instance matrices are at most 54x54 — SURVEY.md §2a): the
mesh is 1-D and batch sharding IS the production layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import ilqr, mpc
from ..models.envs import Env
from ..physics import forward as fwd
from ..physics.model import State, make_state


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_states(env: Env, batch: int, key=None, qpos_noise=0.0,
                 dtype=None) -> State:
    """A batch of initial states (optionally perturbed for diversity)."""
    s0 = make_state(env.model) if dtype is None else make_state(
        env.model, dtype)
    sb = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), s0)
    if qpos_noise > 0.0:
        key = key if key is not None else jax.random.PRNGKey(0)
        noise = qpos_noise * jax.random.normal(
            key, (batch, env.model.nq), s0.qpos.dtype)
        sb = sb.replace(qpos=sb.qpos + noise)
    return sb


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), tree)


def make_batched_solve(env: Env, mesh: Optional[Mesh] = None):
    """jitted (states, sols) -> (sols', cost_traces): one iLQR solve per
    instance, batch axis sharded over `data` when a mesh is given."""
    m, cfg = env.model, env.ilqr

    def solve_one(s, sol):
        return ilqr.solve(m, env.cost_fn, s, sol, cfg)

    f = jax.vmap(solve_one)
    if mesh is None:
        return jax.jit(f)
    shard = NamedSharding(mesh, P("data"))
    return jax.jit(f, in_shardings=(shard, shard), out_shardings=shard)


def make_batched_mpc_step(env: Env, mesh: Optional[Mesh] = None):
    """jitted one-MPC-frame over a sharded batch: re-solve + apply first
    control + physics step for every instance in lockstep."""
    def step_one(s, sol):
        s2, sol2, (u0, trace, c) = mpc.mpc_step(env, s, sol)
        return s2, sol2, c

    f = jax.vmap(step_one)
    if mesh is None:
        return jax.jit(f)
    shard = NamedSharding(mesh, P("data"))
    return jax.jit(f, in_shardings=(shard, shard),
                   out_shardings=(shard, shard, shard))


def init_batched(env: Env, batch: int, mesh: Optional[Mesh] = None,
                 qpos_noise: float = 0.01, dtype=None):
    """Batched (states, solver states), sharded if a mesh is given.

    Solver init is itself vmapped (each instance rolls out its own initial
    trajectory)."""
    sb = batch_states(env, batch, qpos_noise=qpos_noise, dtype=dtype)
    sols = jax.vmap(lambda s: ilqr.init_solver(env.model, s, env.ilqr))(sb)
    if mesh is not None:
        sb = shard_batch(sb, mesh)
        sols = shard_batch(sols, mesh)
    return sb, sols
